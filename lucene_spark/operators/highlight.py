"""Snippet highlighter (lucene/highlighter module analog).

The reference's UnifiedHighlighter re-analyzes stored text and emits
passages around match offsets. Spark-first shape: wholly JVM-side array
expressions — tokenize (split), locate the first query-term hit
(array_position = offset lookup), slice a ±window token passage. No UDFs,
no shuffle; scales as a pure map over matched rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_NO_MATCH = 999_999_999


def highlight(
    docs_df: DataFrame,
    terms: "list[str]",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 3,
) -> DataFrame:
    """First-match passage per doc: (id, match_pos, snippet).

    match_pos is the 1-based whitespace-token position of the earliest
    occurrence of any query term; docs with no match are dropped.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    with_toks = docs_df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    # materialize each term's position once (round 1 computed array_position
    # twice per term — once in the when(), once as the value)
    pos_cols: list[Column] = [
        F.array_position(F.col("toks"), t).alias(f"p{i}") for i, t in enumerate(terms)
    ]
    with_pos = with_toks.select("doc_id", "toks", *pos_cols)
    hit_cols = [
        F.when(F.col(f"p{i}") > 0, F.col(f"p{i}")).otherwise(F.lit(_NO_MATCH))
        for i in range(len(terms))
    ]
    pos = hit_cols[0] if len(hit_cols) == 1 else F.least(*hit_cols)
    start = F.greatest(pos - window, F.lit(1))
    snippet = F.array_join(F.slice(F.col("toks"), start, 2 * window + 1), " ")
    return (
        with_pos.select(
            "doc_id",
            pos.cast("long").alias("match_pos"),
            snippet.alias("snippet"),
        )
        .filter(F.col("match_pos") < _NO_MATCH)
    )
