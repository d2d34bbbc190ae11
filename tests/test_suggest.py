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


def test_fuzzy_transposition_swap_costs_one(spark, sugg_path):
    """'hgost' = 'ghost' with the first pair swapped. Under the
    reference default transpositions=true a swap is ONE edit — but the
    pinned non-fuzzy first char differs, so pin-respecting swap must be
    inside: 'gohst' (o<->h swapped) matches every ghost* entry with
    transpositions=True and NONE with classic Levenshtein (swap = 2
    edits > max_edits=1)."""
    got = fuzzy_lookup(
        spark, sugg_path, "gohst", n=10, transpositions=True
    ).collect()
    surfaces = {r["surface"] for r in got}
    assert "the ghost busters" in surfaces and "ghost rider" in surfaces
    classic = fuzzy_lookup(
        spark, sugg_path, "gohst", n=10, transpositions=False
    ).collect()
    assert classic == []


def test_fuzzy_transpositions_matches_scalar_oracle(spark, sugg_path):
    """Arrow-batched prefix-OSA kernel == the scalar OSA over every
    allowed prefix length, for every table row."""
    from lucene_spark.functions.editdist import osa

    q, d = "gohst", 1
    rows = spark.read.parquet(sugg_path).select("akey", "surface").collect()
    expect = set()
    for r in rows:
        ak = r["akey"]
        best = min(
            osa(q, ak[:L])
            for L in range(max(0, len(q) - d),
                           min(len(ak), len(q) + d) + 1)
        )
        if best <= d and ak[:1] == q[:1]:
            expect.add(r["surface"])
    got = {
        r["surface"]
        for r in fuzzy_lookup(
            spark, sugg_path, q, n=100, transpositions=True
        ).collect()
    }
    assert got == expect


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


# ----------------------------------------------------- FreeTextSuggester

from collections import Counter

from lucene_spark.operators.suggest import (
    FREE_TEXT_ALPHA, build_free_text, free_text_context, free_text_lookup,
    free_text_tokens,
)


def _replay(docs, key, n, grams=3):
    """Reference replay of FreeTextSuggester.lookup:433-720 over plain
    Python gram counts: per consulted order (highest first) take up to
    n candidates by (cnt desc, gram asc) whose last word no higher
    order claimed, score backoff * cnt / contextCount with the same
    double ops as the Spark plan, decay backoff by ALPHA per consulted
    order, final sort score desc / gram asc."""
    cnt = Counter()
    for d in docs:
        ts = [t for t in d.lower().split(" ") if t]
        for m in range(1, grams + 1):
            for i in range(len(ts) - m + 1):
                cnt[" ".join(ts[i:i + m])] += 1
    tot = sum(c for g, c in cnt.items() if " " not in g)
    last = free_text_tokens(key, grams)
    backoff, seen, results = 1.0, set(), []
    for order in range(grams - 1, -1, -1):
        token = last[order]
        if token is None or (token == "" and key):
            continue
        ctx = free_text_context(token)
        ctx_cnt = cnt.get(ctx, 0) if ctx is not None else tot
        if ctx_cnt > 0:
            cands = sorted(
                ((g, c) for g, c in cnt.items()
                 if g.count(" ") == order and g.startswith(token)),
                key=lambda gc: (-gc[1], gc[0]),
            )
            added = 0
            for g, c in cands:
                if added >= n:
                    break
                lw = g.rsplit(" ", 1)[-1]
                if lw in seen:
                    continue
                seen.add(lw)
                results.append((g, backoff * c / ctx_cnt))
                added += 1
        backoff *= FREE_TEXT_ALPHA
    results.sort(key=lambda kv: (-kv[1], kv[0]))
    return results[:n]


FT_DOCS = [
    "foo bar baz",
    "foo bar boo",
    "foo bar bar foo",
    "bar foo bar",
    "boo baz",
]


@pytest.fixture(scope="module")
def ft_path(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("freetext") / "grams")
    docs = spark.createDataFrame([(d,) for d in FT_DOCS], "text string")
    build_free_text(spark, docs, out)
    return out


def _got(spark, path, key, n):
    return [(r["gram"], r["score"])
            for r in free_text_lookup(spark, path, key, n=n).collect()]


def test_free_text_trigram_scores(spark, ft_path):
    """Highest-order completions score cnt/ctx with backoff 1.0:
    context 'foo bar' occurs 4x (incl. 'bar foo bar'); 'foo bar b*'
    trigrams are baz/boo/bar 1x each (gram-asc tie order)."""
    got = _got(spark, ft_path, "foo bar b", 3)
    assert got == [
        ("foo bar bar", 1 / 4), ("foo bar baz", 1 / 4),
        ("foo bar boo", 1 / 4),
    ]


def test_free_text_backoff_and_seen(spark, ft_path):
    """Lower orders decay by ALPHA and skip last words a higher order
    claimed — exact replay equality includes the double bit patterns."""
    got = _got(spark, ft_path, "foo bar b", 8)
    assert got == _replay(FT_DOCS, "foo bar b", 8)
    # bigram 'bar b*' candidates re-rank under backoff, minus seen words
    grams = [g for g, _ in got]
    assert len(set(g.rsplit(" ", 1)[-1] for g in grams)) == len(grams)


def test_free_text_trailing_space_upgrades(spark, ft_path):
    """'foo ' predicts bigrams starting with foo, never unigrams
    (FreeTextSuggester.java:500-516 lastTokenEnded upgrade)."""
    got = _got(spark, ft_path, "foo ", 5)
    assert got == _replay(FT_DOCS, "foo ", 5)
    assert all(g.startswith("foo ") for g, _ in got)
    # 'foo bar' dominates: count 4 over context count 5
    assert got[0] == ("foo bar", 4 / 5)


def test_free_text_unigram_tottokens(spark, ft_path):
    """A single partial token consults the unigram model with
    totTokens as the denominator."""
    got = _got(spark, ft_path, "b", 5)
    assert got == _replay(FT_DOCS, "b", 5)
    tot = sum(len(d.split()) for d in FT_DOCS)  # 15
    assert ("bar", 6 / tot) in got  # 'bar' occurs 6x


def test_free_text_unseen_context_backs_off(spark, ft_path):
    """A context the trigram model never saw contributes nothing but
    still decays the backoff for the lower orders (java:566)."""
    got = _got(spark, ft_path, "zzz qqq b", 5)
    assert got == _replay(FT_DOCS, "zzz qqq b", 5)
    assert got  # unigram order still answers, at ALPHA^2
    assert all(s <= FREE_TEXT_ALPHA ** 2 * 1.0 for _, s in got)


def test_free_text_empty_key_raises(spark, ft_path):
    with pytest.raises(ValueError):
        free_text_lookup(spark, ft_path, "   ")


def test_free_text_randomized_replay(spark, tmp_path):
    """Seeded random corpora: the lazy Spark plan replays the reference
    algorithm exactly, doubles included."""
    import random

    rng = random.Random(42)
    vocab = ["a", "ab", "b", "ba", "c", "ca"]
    for trial in range(2):
        docs = [
            " ".join(rng.choice(vocab)
                     for _ in range(rng.randint(1, 12)))
            for _ in range(30)
        ]
        out = str(tmp_path / f"ft{trial}")
        build_free_text(
            spark, spark.createDataFrame([(d,) for d in docs],
                                         "text string"), out)
        for key in ("a b", "ba c", "a ", "b"):
            assert _got(spark, out, key, 4) == _replay(docs, key, 4), \
                (trial, key)


# ------------------------------------------------ AnalyzingInfixSuggester

from lucene_spark.operators.suggest import build_infix_suggester, infix_lookup


@pytest.fixture(scope="module")
def infix_path(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("infix") / "sugg")
    entries = spark.createDataFrame(
        [
            ("lend me your ear", 8),
            ("a penny saved is a penny earned", 10),
            ("the quick brown fox", 7),
            ("earn while you learn", 9),
            ("earn while you learn", 3),   # dup surface, lower weight
        ],
        schema="surface string, weight long",
    )
    build_infix_suggester(entries, out)
    return out


def test_infix_prefix_matches_anywhere(spark, infix_path):
    """'ear' matches mid-suggestion token prefixes (the infix point),
    ranked weight desc (AnalyzingInfixSuggester.java:626-729)."""
    got = infix_lookup(spark, infix_path, "ear", n=10).collect()
    assert [r["surface"] for r in got] == [
        "a penny saved is a penny earned",  # earned, w=10
        "earn while you learn",             # earn,   w=9 (max of dup)
        "lend me your ear",                 # ear,    w=8
    ]
    assert got[0]["highlighted"] == "a penny saved is a penny <b>ear</b>ned"
    assert got[1]["highlighted"] == "<b>ear</b>n while you learn"
    assert got[2]["highlighted"] == "lend me your <b>ear</b>"


def test_infix_all_terms_required(spark, infix_path):
    """Non-last tokens are exact whole-token MUSTs: 'you' does NOT
    match the token 'your', so only one suggestion survives."""
    got = infix_lookup(spark, infix_path, "you ear", n=10).collect()
    assert [r["surface"] for r in got] == ["earn while you learn"]
    assert got[0]["highlighted"] == "<b>ear</b>n while <b>you</b> learn"


def test_infix_trailing_space_exact(spark, infix_path):
    """Key ending in whitespace makes the last token exact
    (java:683-689): 'ear ' only matches the whole token 'ear'."""
    got = infix_lookup(spark, infix_path, "ear ", n=10).collect()
    assert [r["surface"] for r in got] == ["lend me your ear"]
    assert got[0]["highlighted"] == "lend me your <b>ear</b>"


def test_infix_any_terms_mode(spark, infix_path):
    """allTermsRequired=False unions the per-token match sets."""
    got = infix_lookup(spark, infix_path, "fox penny", n=10,
                       all_terms_required=False).collect()
    assert {r["surface"] for r in got} == {
        "the quick brown fox", "a penny saved is a penny earned",
    }


def test_infix_no_highlight(spark, infix_path):
    got = infix_lookup(spark, infix_path, "ear", n=10,
                       do_highlight=False).collect()
    assert all(r["highlighted"] == r["surface"] for r in got)
