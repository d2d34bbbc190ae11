"""CommonTermsQuery rewrite and scoring semantics
(lucene/queries/src/java/org/apache/lucene/queries/CommonTermsQuery.java)."""

import numpy as np
import pytest

import __spark_entry__ as entry
from lucene_spark.operators.common_terms import (
    _min_should_match, common_terms_query,
)
from lucene_spark.operators.search import Searcher
from lucene_spark.plans.query import BoolQ, BoostQ, TermQ

SF = "/root/testdata/sf0.001"  # 31-term vocab: 'dup' df≈25, rest df≥370


def _group(q):
    """Unwrap the optional BoostQuery — the reference wraps groups
    unconditionally (java:192,201) but BoostQuery.rewrite drops boost==1
    wrappers, and common_terms_query returns the REWRITTEN tree."""
    return q.child if isinstance(q, BoostQ) else q


@pytest.fixture(scope="module")
def searcher(spark):
    return Searcher(spark, entry._index_for(spark, SF))


def test_classification_split(searcher):
    """docFreq > ceil(f32(mtf)*f32(maxDoc)) -> HIGH group; absent terms
    -> LOW (java:152-156)."""
    node = common_terms_query(
        searcher, ["dup", "batch", "zzzmissing"], max_term_frequency=0.1
    )
    assert isinstance(node, BoolQ)
    (low_q,) = node.must
    (high_q,) = node.should
    assert set(t.term for t in _group(low_q).should) == {
        "dup", "zzzmissing"
    }
    assert set(t.term for t in _group(high_q).should) == {"batch"}


def test_absolute_threshold(searcher):
    """maxTermFrequency >= 1 is an absolute docFreq cutoff (java:154)."""
    node = common_terms_query(
        searcher, ["dup", "batch"], max_term_frequency=30.0
    )
    (low_q,) = node.must
    assert [t.term for t in _group(low_q).should] == ["dup"]


def test_degenerate_cases(searcher):
    assert common_terms_query(searcher, []) == BoolQ()
    assert common_terms_query(searcher, ["dup"]) == TermQ("dup")
    with pytest.raises(ValueError):
        common_terms_query(searcher, ["a", "b"], low_freq_occur="MUST_NOT")


def test_all_high_upgrades_to_conjunction(searcher):
    """Empty low group: high SHOULD upgrades to MUST 'to prevent slow
    queries' (java:176-184) — the rewrite IS the conjunction."""
    node = common_terms_query(
        searcher, ["batch", "scan"], max_term_frequency=0.1
    )
    grp = _group(node)
    assert isinstance(grp, BoolQ)
    assert grp.must and not grp.should
    got = searcher.search(node, k=10, with_keys=False)
    want = searcher.search(
        BoolQ(must=(TermQ("batch"), TermQ("scan"))), k=10, with_keys=False
    )
    assert got.equals(want)


def test_min_should_match_rounding():
    """minNrShouldMatch (java:138-144): >=1 / ==0 truncate, fractions
    Math.round against numOptional."""
    assert _min_should_match(0.0, 5) == 0
    assert _min_should_match(2.0, 5) == 2
    assert _min_should_match(2.9, 5) == 2  # (int) cast truncates
    assert _min_should_match(0.5, 5) == 3  # round(2.5) = 3 (floor(x+.5))
    assert _min_should_match(0.3, 5) == 2  # round(1.5) = 2


def test_msm_binds_low_group(searcher):
    """Fractional lowFreqMinimumNumberShouldMatch lands as msm on the
    low SHOULD group."""
    node = common_terms_query(
        searcher, ["dup", "zzzmissing", "batch"], max_term_frequency=0.1,
        low_freq_min_should_match=1.0,
    )
    (low_q,) = node.must
    assert _group(low_q).msm == 1


def test_nested_scores_match_flat_composition(searcher):
    """Score = f32(f32(Σ low BM25) + f32(Σ high BM25)) over docs
    matching the required low group — composed from flat searches."""
    node = common_terms_query(
        searcher, ["dup", "batch", "scan"], max_term_frequency=0.1
    )
    got = searcher.search(node, k=10, with_keys=False)
    ex = searcher.search(node, k=10, prune=False, with_keys=False)
    assert got.equals(ex)  # impact pruning exact under nesting
    low = searcher.search(TermQ("dup"), k=10**6, prune=False,
                          with_keys=False)
    hi = searcher.search(BoolQ(should=(TermQ("batch"), TermQ("scan"))),
                         k=10**6, prune=False, with_keys=False)
    hm = dict(zip(hi.gid, hi.score))
    comp = [
        (int(g), np.float32(np.float64(s) + np.float64(hm.get(g, 0.0))))
        for g, s in zip(low.gid, low.score)
    ]
    comp.sort(key=lambda x: (-x[1], x[0]))
    assert [(int(g), np.float32(s)) for g, s in
            zip(got.gid, got.score)] == comp[:10]


def test_low_freq_must_occur(searcher):
    """lowFreqOccur=MUST conjuncts the low group."""
    # cut = ceil(f32(0.8)*f32(500)) = 400: dup(25)/fast(397) LOW,
    # scan(405) HIGH
    node = common_terms_query(
        searcher, ["dup", "fast", "scan"], max_term_frequency=0.8,
        low_freq_occur="MUST",
    )
    (low_q,) = node.must
    assert set(t.term for t in _group(low_q).must) == {"dup", "fast"}
    got = searcher.search(node, k=5, with_keys=False)
    # match set: docs with BOTH dup and fast
    both = searcher.search(BoolQ(must=(TermQ("dup"), TermQ("fast"))),
                           k=10**6, with_keys=False)
    assert set(got.gid) <= set(both.gid)
