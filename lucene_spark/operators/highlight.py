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
    pos_cols: list[Column] = [
        F.when(F.array_position(toks, t) > 0, F.array_position(toks, t)).otherwise(
            F.lit(_NO_MATCH)
        )
        for t in terms
    ]
    pos = pos_cols[0] if len(pos_cols) == 1 else F.least(*pos_cols)
    start = F.greatest(pos - window, F.lit(1))
    snippet = F.array_join(F.slice(toks, start, 2 * window + 1), " ")
    return (
        docs_df.select(
            F.col(id_col).alias("doc_id"),
            pos.cast("long").alias("match_pos"),
            snippet.alias("snippet"),
        )
        .filter(F.col("match_pos") < _NO_MATCH)
    )
