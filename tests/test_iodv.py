"""IndexOrDocValuesQuery analog (DocValuesRangeQ): both access paths give
identical, oracle-correct results; the auto cost rule picks the reference's
side; pruning never changes results; deletes and standalone forms work.

Reference: core/search/IndexOrDocValuesQuery.java (threshold = cost >>> 3
vs leadCost), PointRangeQuery cost from column metadata, the per-leaf
doc-values verify.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.operators.indexer import build_index, delete_docs
from lucene_spark.operators.search import Searcher
from lucene_spark.plans.query import (
    BoolQ, ConstScoreQ, DocValuesRangeQ, MatchAllQ, TermQ,
)

SF_DIR = "/root/testdata/sf0.01"
SORT_EXPR = "n_chars * 100000 + doc_id"
T_HOT, T_RARE = "merge", "dup"
NARROW = (10_000_000, 20_000_000)
BROAD = (5_000_000, 50_000_000)


@pytest.fixture(scope="module")
def sorted_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("iodv") / "idx")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    build_index(
        spark, docs, idx, key_col="doc_id", text_col="text",
        n_segments=4, sort_by=SORT_EXPR,
    )
    return idx


def _doc_sortvals(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    return {
        r["doc_id"]: r["sv"]
        for r in docs.select(
            "doc_id", F.expr(SORT_EXPR).alias("sv")
        ).collect()
    }


def _topk(s, term, rng, strategy, k=10, prune=True):
    node = BoolQ(
        must=(TermQ(term),),
        filter=(DocValuesRangeQ(rng[0], rng[1], strategy=strategy),),
    )
    pdf = s.search(node, k=k, prune=prune)
    return [(int(g), float(np.float32(sc)))
            for g, sc in zip(pdf["key"].astype("int64"), pdf["score"])]


@pytest.mark.parametrize("term,rng", [(T_HOT, NARROW), (T_RARE, BROAD)])
def test_strategies_identical(spark, sorted_idx, term, rng):
    s = Searcher(spark, sorted_idx)
    auto = _topk(s, term, rng, "auto")
    idxp = _topk(s, term, rng, "index")
    dvp = _topk(s, term, rng, "dv")
    exhaustive = _topk(s, term, rng, "dv", prune=False)
    assert auto == idxp == dvp == exhaustive
    assert len(auto) > 0


def test_auto_picks_reference_rule(spark, sorted_idx):
    s = Searcher(spark, sorted_idx)
    # hot lead + narrow range: cost >>> 3 <= leadCost -> lead with the index
    _topk(s, T_HOT, NARROW, "auto")
    assert s.last_dv_strategy == "index"
    # rare lead + broad range: the range would be barely consumed -> verify
    _topk(s, T_RARE, BROAD, "auto")
    assert s.last_dv_strategy == "dv"
    # the broadcast cap forces dv regardless of the rule
    s_cap = Searcher(spark, sorted_idx, dv_index_lead_cap=1)
    _topk(s_cap, T_HOT, NARROW, "auto")
    assert s_cap.last_dv_strategy == "dv"


def test_filter_matches_brute(spark, sorted_idx):
    """Both paths == unfiltered top-all intersected with the true range."""
    s = Searcher(spark, sorted_idx)
    sv = _doc_sortvals(spark)
    base = s.search(TermQ(T_HOT), k=10_000, prune=False)
    want = [
        (int(g), float(np.float32(sc)))
        for g, sc in zip(base["key"].astype("int64"), base["score"])
        if NARROW[0] <= sv[int(g)] <= NARROW[1]
    ][:10]
    assert _topk(s, T_HOT, NARROW, "index") == want
    assert _topk(s, T_HOT, NARROW, "dv") == want


def test_standalone_and_matchall_forms(spark, sorted_idx):
    s = Searcher(spark, sorted_idx)
    sv = _doc_sortvals(spark)
    want_docs = {d for d, v in sv.items() if NARROW[0] <= v <= NARROW[1]}
    gid_to_doc = {
        int(r["gid"]): int(r["key"])
        for r in s.doc_rows().select("gid", "key").collect()
    }

    def docs_of(df):
        return {gid_to_doc[int(r["gid"])] for r in df.collect()}

    # standalone: the dvQuery run on its own (newSlowRangeQuery)
    df = s.candidates(DocValuesRangeQ(*NARROW))
    assert docs_of(df) == want_docs
    assert s.last_dv_strategy == "scan"
    # ConstScore wrapper sets the constant
    df2 = s.candidates(ConstScoreQ(DocValuesRangeQ(*NARROW), boost=2.5))
    assert {float(r["score"]) for r in df2.collect()} == {2.5}
    # MatchAll + filter == the scan at score 1.0
    df3 = s.candidates(
        BoolQ(must=(MatchAllQ(),), filter=(DocValuesRangeQ(*NARROW),))
    )
    assert docs_of(df3) == want_docs
    assert {float(r["score"]) for r in df3.collect()} == {1.0}
    # filter-only boolean matches the set at score 0 (BooleanWeight)
    df4 = s.candidates(BoolQ(filter=(DocValuesRangeQ(*NARROW),)))
    assert docs_of(df4) == want_docs
    assert {float(r["score"]) for r in df4.collect()} == {0.0}


def test_scoring_positions_rejected(spark, sorted_idx):
    s = Searcher(spark, sorted_idx)
    with pytest.raises(ValueError, match="non-scoring|filter"):
        s.candidates(BoolQ(must=(TermQ(T_HOT), DocValuesRangeQ(*NARROW))))
    with pytest.raises(ValueError):
        s.candidates(BoolQ(should=(TermQ(T_HOT), DocValuesRangeQ(*NARROW))))
    with pytest.raises(ValueError):
        DocValuesRangeQ(5, 1)
    with pytest.raises(ValueError):
        DocValuesRangeQ(1, 5, strategy="bogus")


def test_deletes_respected(spark, tmp_path):
    idx = str(tmp_path / "idx_del")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    build_index(
        spark, docs, idx, key_col="doc_id", text_col="text",
        n_segments=4, sort_by=SORT_EXPR,
    )
    s0 = Searcher(spark, idx)
    before = _topk(s0, T_HOT, NARROW, "dv")
    victim_doc = before[0][0]
    gid = int(
        s0.doc_rows().filter(F.col("key") == str(victim_doc)).collect()[0]["gid"]
    )
    delete_docs(spark, idx, gids=[gid])
    s1 = Searcher(spark, idx)
    for strat in ("index", "dv"):
        after = _topk(s1, T_HOT, NARROW, strat)
        assert victim_doc not in [d for d, _ in after]
        # survivors' scores unchanged (stats ignore deletes pre-merge)
        before_scores = dict(before)
        for d, sc in after:
            if d in before_scores:
                assert sc == before_scores[d]
    # standalone scan path also masks deletes
    live = {int(r["gid"]) for r in s1.candidates(DocValuesRangeQ(*NARROW)).collect()}
    assert gid not in live


def test_dv_plan_shape(spark, sorted_idx):
    """dv strategy co-groups (FlatMapCoGroupsInPandas), index strategy
    stays a plain grouped kernel; both push the sort_val range into the
    doc-table scan."""
    s = Searcher(spark, sorted_idx)
    node_dv = BoolQ(
        must=(TermQ(T_RARE),),
        filter=(DocValuesRangeQ(*BROAD, strategy="dv"),),
    )
    plan = s.candidates(node_dv)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert any(
        "PushedFilters" in l and "sort_val" in l for l in plan.splitlines()
    )
    node_idx = BoolQ(
        must=(TermQ(T_HOT),),
        filter=(DocValuesRangeQ(*NARROW, strategy="index"),),
    )
    plan2 = s.candidates(node_idx)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" not in plan2
