"""Sharded HNSW ANN: exact-at-flood-ef contract, approximate-path sanity,
determinism, graph reuse, structural bounds, plan shape.

Reference: core/util/hnsw/HnswGraphBuilder.java / HnswGraphSearcher.java;
one graph per segment (Lucene95HnswVectorsFormat), searched independently
and merged.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.operators.hnsw import (
    ann_hnsw_topk, build_hnsw_graph, node_level,
)
from lucene_spark.operators.textops import ann_cosine_topk, embeddings

SF_DIR = "/root/testdata/sf0.01"
M = 16


def _rows(df):
    return [(int(r["vec_id"]), float(r["cos"])) for r in df.collect()]


def test_flood_ef_matches_brute(spark):
    """ef_search >= shard size -> beam covers the reachable component;
    the gate config is exact vs brute force, scores bit-identical."""
    got = _rows(ann_hnsw_topk(spark, SF_DIR, query_vec_id=0, k=10))
    want = _rows(ann_cosine_topk(spark, SF_DIR, query_vec_id=0, k=10))
    assert got == want


def test_flood_ef_other_queries(spark):
    g = build_hnsw_graph(
        spark, embeddings(spark, SF_DIR).select("vec_id", "embedding"), m=M
    )
    g.cache().count()
    try:
        for q in (7, 123, 499):
            got = _rows(ann_hnsw_topk(spark, SF_DIR, query_vec_id=q, k=5, graph=g))
            want = _rows(ann_cosine_topk(spark, SF_DIR, query_vec_id=q, k=5))
            assert got == want, f"query {q}"
    finally:
        g.unpersist()


def test_approx_path_sane(spark):
    """Small beam = the approximate scale path: k rows, no query id,
    scores are TRUE cosines (fold-exact) for whatever ids it returns,
    and recall against exact top-k is non-trivial."""
    exact = _rows(ann_cosine_topk(spark, SF_DIR, query_vec_id=0, k=10))
    brute = dict(
        _rows(ann_cosine_topk(spark, SF_DIR, query_vec_id=0, k=600))
    )
    approx = _rows(
        ann_hnsw_topk(spark, SF_DIR, query_vec_id=0, k=10, ef_search=12)
    )
    assert len(approx) == 10
    ids = [v for v, _ in approx]
    assert 0 not in ids
    for v, c in approx:
        assert c == brute[v], f"score for {v} not the true cosine"
    recall = len(set(ids) & {v for v, _ in exact}) / 10
    assert recall >= 0.5
    # scores descend, ties break on vec_id
    assert approx == sorted(approx, key=lambda t: (-t[1], t[0]))


def test_deterministic(spark):
    a = _rows(ann_hnsw_topk(spark, SF_DIR, query_vec_id=42, k=10, ef_search=16))
    b = _rows(ann_hnsw_topk(spark, SF_DIR, query_vec_id=42, k=10, ef_search=16))
    assert a == b


def test_graph_reuse_matches_rebuild(spark):
    e = embeddings(spark, SF_DIR).select("vec_id", "embedding")
    g = build_hnsw_graph(spark, e, m=M)
    reused = _rows(ann_hnsw_topk(spark, SF_DIR, query_vec_id=9, k=10, graph=g))
    rebuilt = _rows(ann_hnsw_topk(spark, SF_DIR, query_vec_id=9, k=10))
    assert reused == rebuilt


def test_graph_structure(spark):
    e = embeddings(spark, SF_DIR).select("vec_id", "embedding")
    g = build_hnsw_graph(spark, e, m=M, n_shards=4).toPandas()
    n = e.count()
    # every vector appears at level 0
    assert set(g[g["level"] == 0]["vec_id"]) == set(range(n))
    # fan-out bounds: 2M at base, M above (HnswGraphBuilder M*2 base rule)
    base = g[g["level"] == 0]["neighbors"].map(len)
    upper = g[g["level"] > 0]["neighbors"].map(len)
    assert (base <= 2 * M).all()
    assert (upper <= M).all() or upper.empty
    # levels follow the deterministic hash draw
    for _, row in g[g["level"] > 0].head(20).iterrows():
        assert node_level(int(row["vec_id"]), M) >= int(row["level"])
    # neighbors stay inside the shard (per-segment graphs never cross)
    shard_of = dict(zip(g["vec_id"], g["shard"]))
    for _, row in g.head(200).iterrows():
        for nb in row["neighbors"]:
            assert shard_of[int(nb)] == row["shard"]


def test_plan_shape(spark):
    """Search co-groups graph+vectors per shard; merge is one TakeOrdered;
    the only driver-side data is the query row."""
    df = ann_hnsw_topk(spark, SF_DIR, query_vec_id=0, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "TakeOrderedAndProject" in plan


def test_missing_query_raises(spark):
    with pytest.raises(ValueError, match="not found"):
        ann_hnsw_topk(spark, SF_DIR, query_vec_id=10**9, k=10)
