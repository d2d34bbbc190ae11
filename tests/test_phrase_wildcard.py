"""PhraseWildcardQuery rewrite semantics
(sandbox/.../PhraseWildcardQuery.java:95-210)."""

import pytest

import __spark_entry__ as entry
from lucene_spark.operators.phrase_wildcard import phrase_wildcard_query
from lucene_spark.operators.search import Searcher
from lucene_spark.plans.query import (
    BoolQ, MultiPhraseQ, PhraseQ, PrefixQ, WildcardQ,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(spark):
    return Searcher(spark, entry._index_for(spark, SF))


def test_expansion_to_multiphrase(searcher):
    node = phrase_wildcard_query(searcher, ["order", PrefixQ("d")])
    assert isinstance(node, MultiPhraseQ)
    assert node.termss[0] == ("order",)
    assert set(node.termss[1]) == {"data", "dup"}
    assert node.termss[1] == tuple(sorted(node.termss[1]))  # term order


def test_all_literal_collapses_to_phrase(searcher):
    node = phrase_wildcard_query(searcher, ["order", "data"])
    assert node == PhraseQ(("order", "data"), (0, 1))


def test_no_expansion_matches_nothing(searcher):
    node = phrase_wildcard_query(searcher, ["order", PrefixQ("zzz")])
    assert node == BoolQ()
    assert searcher.search(node, k=5, with_keys=False).empty


def test_shared_expansion_budget(searcher):
    """The budget is shared left-to-right: slot 2 gets only what slot 1
    left (java:179-210)."""
    n_s = len(phrase_wildcard_query(
        searcher, [PrefixQ("s")], max_multi_term_expansions=128
    ).termss[0])
    assert n_s >= 2
    # budget exactly covers slot 1 -> slot 2 expands to nothing
    node = phrase_wildcard_query(
        searcher, [PrefixQ("s"), PrefixQ("d")],
        max_multi_term_expansions=n_s,
    )
    assert node == BoolQ()
    # one spare expansion -> slot 2 gets the FIRST d* term only
    node2 = phrase_wildcard_query(
        searcher, [PrefixQ("s"), PrefixQ("d")],
        max_multi_term_expansions=n_s + 1,
    )
    assert isinstance(node2, MultiPhraseQ)
    assert len(node2.termss[0]) == n_s
    assert node2.termss[1] == ("data",)  # term-ascending first


def test_matches_explicit_multiphrase(searcher):
    """The rewrite's execution equals an explicitly constructed
    MultiPhraseQ over the same expansions."""
    node = phrase_wildcard_query(searcher, ["order", WildcardQ("d*")])
    explicit = MultiPhraseQ((("order",), tuple(node.termss[1])), (0, 1))
    a = searcher.search(node, k=20, prune=False, with_keys=False)
    b = searcher.search(explicit, k=20, prune=False, with_keys=False)
    assert a.equals(b)
    got = searcher.search(node, k=20, with_keys=False)
    assert got.equals(a)  # pruned == exhaustive
