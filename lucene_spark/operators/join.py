"""Parent/child joins (lucene/join module analog).

Lucene's ToParentBlockJoinQuery scores child docs (passages) and rolls
them up to their parent doc (page) with a ScoreMode aggregate
(``lucene/join/src/java/org/apache/lucene/search/join/ToParentBlockJoinQuery.java``,
``ScoreMode.java``: None/Avg/Max/Total/Min). Lucene requires parents and
children to be index-adjacent blocks; the Spark-first shape needs no
adjacency — the child→parent mapping is an explicit column and the rollup
is one groupBy:

  child candidates (pruned=False: every match, exact scores)
    → join mapping on gid        (shuffle keyed by gid — child-side only,
                                  sized by the MATCH set, not the corpus)
    → groupBy(parent).agg(mode)  (map-side partial agg; parent cardinality
                                  ≤ match cardinality)

Score composition mirrors BlockJoinScorer: child float32 scores aggregate
in double, one float32 cast at the end (sum of ≤2^29 same-magnitude f32
values in double is exact and order-independent, so Spark/DuckDB agree).

JoinUtil.createJoinQuery (query-time value join) maps to
``query_time_join``: a semi-join from the matching "from" docs' join
values onto the "to" side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCORE_MODES = ("max", "total", "avg", "min")


def to_parent_join(
    searcher,
    child_query,
    parent_map: DataFrame,
    *,
    score_mode: str = "max",
    k: int = 10,
    gid_col: str = "gid",
    parent_col: str = "parent_id",
) -> DataFrame:
    """Top-k parents by aggregated child BM25 score.

    ``parent_map``: (gid, parent_id) child→parent mapping (the block-index
    adjacency analog, made explicit). Returns (parent_id, score, n_children)
    ordered score desc, parent asc.
    """
    from ..plans.query import parse_query

    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    node = parse_query(child_query) if isinstance(child_query, str) else child_query
    cand = searcher.candidates(node, k=1 << 62, prune=False)
    mapping = parent_map.select(
        F.col(gid_col).cast("long").alias("gid"),
        F.col(parent_col).cast("long").alias("parent_id"),
    )
    joined = cand.join(mapping, "gid")
    if score_mode == "max":
        agg = F.max("score")  # max of f32 values: exact in any precision
    elif score_mode == "min":
        agg = F.min("score")
    elif score_mode == "total":
        agg = F.sum(F.col("score").cast("double")).cast("float")
    else:  # avg: double sum / count, one float cast (BlockJoinScorer)
        agg = (
            F.sum(F.col("score").cast("double")) / F.count(F.lit(1))
        ).cast("float")
    return (
        joined.groupBy("parent_id")
        .agg(agg.alias("score"), F.count(F.lit(1)).alias("n_children"))
        .orderBy(F.desc("score"), F.asc("parent_id"))
        .limit(k)
    )


def query_time_join(
    searcher,
    from_query,
    from_values: DataFrame,
    to_side: DataFrame,
    *,
    from_gid_col: str = "gid",
    value_col: str = "join_key",
) -> DataFrame:
    """JoinUtil.createJoinQuery analog: rows of ``to_side`` whose
    ``value_col`` appears among the join values of docs matching
    ``from_query``. Distinct join values are usually small → broadcast
    semi-join; the match set never collects to the driver."""
    from ..plans.query import parse_query

    node = parse_query(from_query) if isinstance(from_query, str) else from_query
    matches = searcher.candidates(node, k=1 << 62, prune=False).select("gid")
    vals = (
        from_values.select(
            F.col(from_gid_col).cast("long").alias("gid"), F.col(value_col)
        )
        .join(matches, "gid")
        .select(value_col)
        .distinct()
    )
    return to_side.join(F.broadcast(vals), value_col, "left_semi")
