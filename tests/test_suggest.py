"""AnalyzingSuggester analog: analyzed-form completion semantics
(suggest/.../analyzing/AnalyzingSuggester.java)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.operators.suggest import (
    analyzing_lookup, build_analyzing_suggester, fuzzy_lookup,
)


@pytest.fixture(scope="module")
def sugg_path(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sugg") / "table")
    entries = spark.createDataFrame(
        [
            ("the ghost busters", 10),
            ("ghost rider", 8),
            ("ghost rider", 3),          # duplicate surface, lower weight
            ("a ghost story", 7),
            ("ghostly tales", 9),
            ("ghost", 1),                # light exact-surface candidate
            ("the the an", 1),           # analyzes to nothing -> dropped
            ("merge sort", 5),
        ],
        schema="surface string, weight long",
    )
    build_analyzing_suggester(entries, out)
    return out


def test_stop_filtered_completion(spark, sugg_path):
    """'the gho' analyzes to 'gho'; completions match on the ANALYZED
    form, so 'the ghost busters' (analyzed 'ghost busters') matches a
    key whose raw prefix differs — the AnalyzingSuggester value over a
    plain prefix table."""
    got = analyzing_lookup(spark, sugg_path, "the gho", n=10).collect()
    surfaces = [r["surface"] for r in got]
    assert surfaces == [
        "the ghost busters", "ghostly tales", "ghost rider",
        "a ghost story", "ghost",
    ]
    # duplicate surface deduped to its max weight
    w = {r["surface"]: r["weight"] for r in got}
    assert w["ghost rider"] == 8


def test_exact_first(spark, sugg_path):
    """The entry whose SURFACE equals the raw key ranks first even when
    heavier completions exist (AnalyzingSuggester.sameSurfaceForm);
    without exact_first pure weight order wins."""
    got = analyzing_lookup(spark, sugg_path, "ghost", n=3).collect()
    assert [r["surface"] for r in got] == [
        "ghost", "the ghost busters", "ghostly tales",
    ]
    got2 = analyzing_lookup(
        spark, sugg_path, "ghost", n=3, exact_first=False
    ).collect()
    assert [r["surface"] for r in got2] == [
        "the ghost busters", "ghostly tales", "ghost rider",
    ]


def test_all_stopword_key_is_empty(spark, sugg_path):
    """A key that analyzes away entirely has no automaton to intersect."""
    assert analyzing_lookup(spark, sugg_path, "the an a", n=5).count() == 0


def test_all_stopword_surface_dropped(spark, sugg_path):
    """Surfaces whose analysis yields no tokens never enter the table."""
    tbl = spark.read.parquet(sugg_path)
    assert tbl.filter(F.col("surface") == "the the an").count() == 0


def test_fuzzy_one_edit(spark, sugg_path):
    """'the ghist' analyzes to 'ghist', one substitution from the
    'ghost' analyzed prefix — the typo still completes every ghost*
    entry (FuzzySuggester's one-edit default)."""
    got = fuzzy_lookup(spark, sugg_path, "the ghist", n=10).collect()
    surfaces = [r["surface"] for r in got]
    assert "the ghost busters" in surfaces and "ghost rider" in surfaces
    # weight order preserved among matches
    weights = [r["weight"] for r in got]
    assert weights == sorted(weights, reverse=True)


def test_fuzzy_non_fuzzy_prefix_pins_first_char(spark, sugg_path):
    """An edit in the pinned first character never matches
    (DEFAULT_NON_FUZZY_PREFIX = 1)."""
    got = fuzzy_lookup(spark, sugg_path, "bhost", n=10).collect()
    assert got == []


def test_fuzzy_below_min_length_is_exact(spark, sugg_path):
    """Analyzed keys shorter than minFuzzyLength fuzz nothing — exact
    prefix completion only (DEFAULT_MIN_FUZZY_LENGTH = 3)."""
    got = fuzzy_lookup(spark, sugg_path, "gh", n=10).collect()
    assert {r["surface"] for r in got} == {
        "the ghost busters", "ghost rider", "a ghost story",
        "ghostly tales", "ghost",
    }
    # 'gx' is within 1 edit of the 'gh' prefix but below the threshold
    assert fuzzy_lookup(spark, sugg_path, "gx", n=10).count() == 0


def test_fuzzy_transpositions_unsupported(spark, sugg_path):
    with pytest.raises(NotImplementedError):
        fuzzy_lookup(spark, sugg_path, "ghost", transpositions=True)


def test_max_surface_per_key_cap(spark, tmp_path):
    """maxSurfaceFormsPerAnalyzedForm prunes the per-key surface list by
    weight desc, surface asc — surfaces differing only in stopwords
    share one analyzed key ('a'/'the' drop -> akey 'k')."""
    same = spark.createDataFrame(
        [("k a", 5), ("the k a", 4), ("a k a", 3), ("k a the", 2)],
        "surface string, weight long",
    )
    out = str(tmp_path / "capped")
    build_analyzing_suggester(same, out, max_surface_per_key=2)
    kept = spark.read.parquet(out).filter(F.col("akey") == "k").collect()
    assert sorted(r["surface"] for r in kept) == ["k a", "the k a"]
    # lookup sees only the kept survivors
    got = analyzing_lookup(spark, out, "k", n=10).collect()
    assert [r["surface"] for r in got] == ["k a", "the k a"]
