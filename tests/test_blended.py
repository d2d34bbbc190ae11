"""BlendedTermQuery public builder + DisjunctionMaxRewrite
(core/search/BlendedTermQuery.java:60-301)."""

import numpy as np
import pytest

import __spark_entry__ as entry
from lucene_spark.operators.search import Searcher
from lucene_spark.plans.query import BlendedQ, blended_term_query

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(spark):
    return Searcher(spark, entry._index_for(spark, SF))


def test_builder_validation():
    with pytest.raises(ValueError):
        blended_term_query(["a", "b"], [1.0])
    with pytest.raises(ValueError):
        blended_term_query(["a"], rewrite="nope")
    with pytest.raises(ValueError):
        BlendedQ(("a",), (1.0,), dismax=True, tie=1.5)


def test_dismax_combination_vs_boolean(searcher):
    """Per doc: dismax = max + tie*(sum-max); composed from the boolean
    rewrite's member scores."""
    terms, boosts, tie = ("merge", "window"), (1.0, 0.5), 0.3
    boolq = blended_term_query(terms, boosts)  # sum
    dmq = blended_term_query(terms, boosts, rewrite="dismax", tie=tie)
    got = searcher.search(dmq, k=10, with_keys=False)
    ex = searcher.search(dmq, k=10, prune=False, with_keys=False)
    assert got.equals(ex)  # sum bound stays valid for dismax
    # member scores under the SAME two-term df blend: evaluate each
    # member by zeroing the other's boost (f32(0*idf) scores 0)
    za = searcher.search(BlendedQ(terms, (boosts[0], 0.0)), k=10**6,
                         prune=False, with_keys=False)
    zb = searcher.search(BlendedQ(terms, (0.0, boosts[1])), k=10**6,
                         prune=False, with_keys=False)
    a = dict(zip(za.gid, za.score))
    b = dict(zip(zb.gid, zb.score))
    comp = []
    for g in set(a) | set(b):
        vals = [np.float64(a.get(g, 0.0)), np.float64(b.get(g, 0.0))]
        smax, ssum = max(vals), sum(vals)
        comp.append((int(g), np.float32(smax + (ssum - smax) * tie)))
    comp.sort(key=lambda x: (-x[1], x[0]))
    assert [(int(g), np.float32(s)) for g, s in
            zip(got.gid, got.score)] == comp[:10]


def test_dismax_tie_one_equals_boolean(searcher):
    """tie=1 collapses dismax to the boolean sum."""
    terms, boosts = ("merge", "window"), (1.0, 0.5)
    a = searcher.search(
        blended_term_query(terms, boosts, rewrite="dismax", tie=1.0),
        k=50, prune=False, with_keys=False)
    b = searcher.search(blended_term_query(terms, boosts),
                        k=50, prune=False, with_keys=False)
    assert list(a.gid) == list(b.gid)
    assert [np.float32(x) for x in a.score] == \
        [np.float32(x) for x in b.score]
