"""Term vectors + MoreLikeThis.

Term vectors: Lucene stores an optional per-doc forward index of
(term, freq, positions) (``core/codecs/lucene90/Lucene90TermVectorsFormat``).
Here the source table is authoritative, so a term vector is the analysis
chain re-run over the requested docs — same analyzer as indexing, hence
identical tfs — as a vectorized kernel over only those rows (Parquet
predicate pushdown on the key column).

MoreLikeThis (``lucene/queries/src/java/org/apache/lucene/queries/mlt/
MoreLikeThis.java``): pick the seed doc's most interesting terms by
tf x idf, build an OR query of them, search, drop the seed doc.
Interestingness = double(tf) * double(float32 idf), ties by term asc —
deterministic and mirrored exactly by the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..functions.analysis import analyze_batch
from ..functions.bm25 import idf as _idf
from ..plans.query import BoolQ, TermQ

TV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("freq", T.LongType()),
    ]
)


def term_vectors(
    docs_df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, freq) per analyzed token — the forward-index view."""

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            batch = analyze_batch(pdf[text_col])
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            terms = batch.tok_terms
            key = pd.DataFrame(
                {"doc_id": ids[batch.tok_doc_idx], "term": terms}
            )
            out = key.groupby(["doc_id", "term"], sort=True).size().reset_index(name="freq")
            yield out.astype({"doc_id": np.int64, "freq": np.int64})

    return docs_df.select(id_col, text_col).mapInPandas(kernel, schema=TV_SCHEMA)


def more_like_this(
    searcher,
    docs_df: DataFrame,
    seed_doc_id: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_query_terms: int = 5,
    k: int = 10,
) -> pd.DataFrame:
    """Top-k docs similar to the seed doc (seed excluded from results)."""
    tv = (
        term_vectors(docs_df.filter(F.col(id_col) == seed_doc_id), id_col, text_col)
        .toPandas()
    )
    if tv.empty:
        return pd.DataFrame({"gid": [], "score": []})
    stats = searcher.term_stats(set(tv["term"]))
    n = searcher.stats["doc_count"]
    rows = []
    for term, freq in zip(tv["term"], tv["freq"]):
        if term not in stats:
            continue
        interest = float(freq) * float(_idf(stats[term][0], n))
        rows.append((term, interest))
    rows.sort(key=lambda r: (-r[1], r[0]))
    chosen = [t for t, _ in rows[:max_query_terms]]
    if not chosen:
        return pd.DataFrame({"gid": [], "score": []})
    node = BoolQ(should=tuple(TermQ(t) for t in chosen))
    # fetch k+1 then drop the seed: it can appear at most once
    hits = searcher.search(node, k=k + 1, with_keys=False)
    hits = hits[hits["gid"] != seed_doc_id].head(k)
    return hits.reset_index(drop=True)
