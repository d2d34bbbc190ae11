"""IR quality harness (benchmark/quality/QualityBenchmark.java analog).

The reference's quality module scores ranked results against TREC-style
relevance judgments (precision@k, recall, MRR). Here judgments are a
DataFrame of (qid, doc_id) pairs; rankings come from the engine; metrics
are exact rationals computed as integer counts divided once in double, so
they reproduce bit-identically on any engine.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def judge_topk(
    searcher,
    queries: "dict[str, object]",
    judgments: "dict[str, set[int]]",
    k: int = 10,
) -> pd.DataFrame:
    """Per-query quality metrics: (qid, n_rel, hits_at_k, precision_at_k,
    recall_at_k, mrr) — ranked list from the engine, judged against the
    given relevant-doc sets."""
    rows = []
    for qid, node in queries.items():
        rel = judgments.get(qid, set())
        hits = searcher.search(node, k=k, with_keys=False)
        ranked = [int(g) for g in hits["gid"]]
        n_hit = sum(1 for g in ranked if g in rel)
        rr = 0.0
        for rank, g in enumerate(ranked, start=1):
            if g in rel:
                rr = 1.0 / rank
                break
        rows.append(
            {
                "qid": qid,
                "n_rel": len(rel),
                "hits_at_k": n_hit,
                "precision_at_k": float(n_hit) / float(k),
                "recall_at_k": (float(n_hit) / float(len(rel))) if rel else 0.0,
                "mrr": rr,
            }
        )
    return pd.DataFrame(rows).sort_values("qid").reset_index(drop=True)
