"""Snippet highlighter (lucene/highlighter module analog).

The reference's UnifiedHighlighter re-analyzes stored text and emits
passages around match offsets (OffsetSource.ANALYSIS, the default when
offsets aren't indexed). Spark-first shape: wholly JVM-side array
expressions — tokenize (split), locate the first query-term hit
(array_position = offset lookup), slice a ±window token passage. No UDFs,
no shuffle; scales as a pure map over matched rows.

``highlight_from_postings`` is the OffsetSource.POSTINGS path: when the
index stores offsets (IndexOptions ..._AND_OFFSETS), the first-occurrence
char offsets come straight from the postings — no re-analysis of stored
text at query time (UnifiedHighlighter.getOffsetSource).
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


def highlight_from_postings(
    searcher,
    docs_df: DataFrame,
    term: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    char_window: int = 30,
) -> DataFrame:
    """Passage per matching doc via INDEXED offsets (OffsetSource.POSTINGS).

    Returns (doc_id, start_off, end_off, snippet): the term's first
    occurrence offsets from the postings and a ±char_window character
    passage cut from the stored text — the stored field is only
    substring'd, never re-tokenized. Broadcast-joins the (small) matched
    occurrence set against the stored-fields table, so the scan side
    stays shuffle-free.
    """
    occ = searcher.term_offsets(term)
    first = occ.groupBy("gid").agg(
        F.min("position").alias("position"),
        F.min("start_off").alias("start_off"),
        F.min_by("end_off", "position").alias("end_off"),
    )
    snip_start = F.greatest(F.col("start_off") + 1 - char_window, F.lit(1))
    snip_len = (F.col("end_off") - F.col("start_off")) + F.lit(2 * char_window)
    return (
        docs_df.select(
            F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_t")
        )
        .join(F.broadcast(first), F.col("doc_id") == F.col("gid"))
        .select(
            "doc_id",
            "start_off",
            "end_off",
            F.substring(F.col("_t"), snip_start, snip_len).alias("snippet"),
        )
    )
