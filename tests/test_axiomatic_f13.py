"""Axiomatic F1/F3 families (AxiomaticF1EXP/F1LOG/F3EXP/F3LOG.java):
brute-force parity, pruning exactness, gamma clamp, explain values."""

import math

import numpy as np
import pytest

import __spark_entry__ as entry
from lucene_spark.functions.similarity import (
    AxiomaticF1EXPSim, AxiomaticF1LOGSim, AxiomaticF3EXPSim,
    AxiomaticF3LOGSim,
)
from lucene_spark.functions.smallfloat import LENGTH_TABLE
from lucene_spark.operators.search import Searcher

SF = "/root/testdata/sf0.001"


def _brute(searcher, sim, term, k=10):
    """Independent replay from raw postings + stats."""
    post = searcher.postings(term).collect()
    st = searcher.term_stats({term})[term]
    n = searcher.stats["doc_count"]
    sttf = searcher.stats["sum_total_term_freq"]
    idf = (math.pow((n + 1.0) / st[0], sim.k)
           if "EXP" in type(sim).__name__
           else math.log((n + 1.0) / st[0]))
    avgdl = sttf / float(n)
    out = []
    for r in post:
        dl = float(LENGTH_TABLE[r["norm_b"]])
        tf = 1.0 + math.log(1.0 + math.log(r["freq"] + 1.0))
        if isinstance(sim, AxiomaticF3EXPSim):
            ql = float(sim.query_len)
            gamma = (((dl - ql) * sim.s) * ql) / avgdl
            sc = max(0.0, tf * idf - gamma)
        else:
            ln_c = (avgdl + sim.s) / (avgdl + dl * sim.s)
            sc = max(0.0, tf * ln_c * idf)
        out.append((int(r["gid"]), np.float32(sc)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("sim", [
    AxiomaticF1EXPSim(), AxiomaticF1LOGSim(),
    AxiomaticF3EXPSim(query_len=1), AxiomaticF3LOGSim(query_len=1),
])
def test_brute_parity_and_pruning(spark, sim):
    s = Searcher(spark, entry._index_for(spark, SF), similarity=sim)
    got = s.search("merge", k=10, with_keys=False)
    ex = s.search("merge", k=10, prune=False, with_keys=False)
    assert got.equals(ex)
    assert [(int(g), np.float32(x)) for g, x in
            zip(got.gid, got.score)] == _brute(s, sim, "merge")


def test_f3_gamma_can_zero_scores(spark):
    """A large s with queryLen makes gamma dominate long docs — the
    Axiomatic combination clamps at 0, never negative."""
    sim = AxiomaticF3LOGSim(s=1.0, query_len=5)
    s = Searcher(spark, entry._index_for(spark, SF), similarity=sim)
    all_hits = s.search("merge", k=10**6, prune=False, with_keys=False)
    assert (all_hits.score >= 0).all()
    assert (all_hits.score == 0).any()  # gamma bites on long docs


def test_validation():
    with pytest.raises(ValueError):
        AxiomaticF1EXPSim(s=2.0)
    with pytest.raises(ValueError):
        AxiomaticF3EXPSim(query_len=-1)


def test_explain_components(spark):
    sim = AxiomaticF3EXPSim(query_len=1)
    s = Searcher(spark, entry._index_for(spark, SF), similarity=sim)
    ex = s.explain("merge").set_index("component")["value"]
    top = s.search("merge", k=1, with_keys=False)
    assert np.float32(ex["score"]) == np.float32(top.score.iloc[0])
    assert ex["tfln, mixed term frequency and document length, "
              "equals to 1"] == 1.0
    assert "gamma, computed as (dl - queryLen) * s * queryLen / avgdl" \
        in ex.index
