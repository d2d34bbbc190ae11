"""NGram / EdgeNGram token filters (analysis/common/.../ngram/).

Gram vectors ported from TestNGramTokenFilter / TestEdgeNGramTokenFilter;
stream tests pin position holes and the overlap-discounted length norm.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.functions.analysis import analyze_batch
from lucene_spark.functions.ngram import EdgeNGramFilter, NGramFilter
from lucene_spark.operators import indexer
from lucene_spark.operators.search import Searcher
from lucene_spark.plans.query import PrefixQ, TermQ


def test_gram_vectors():  # TestNGramTokenFilter
    assert NGramFilter(1, 1).grams("abcde") == list("abcde")
    assert NGramFilter(2, 2).grams("abcde") == ["ab", "bc", "cd", "de"]
    assert NGramFilter(1, 3).grams("abcde") == [
        "a", "ab", "abc", "b", "bc", "bcd", "c", "cd", "cde", "d", "de", "e",
    ]
    assert NGramFilter(6, 6).grams("abcde") == []
    assert NGramFilter(6, 6, preserve_original=True).grams("abcde") == ["abcde"]
    # longer than max with preserve: grams then the original, last
    assert NGramFilter(2, 2, preserve_original=True).grams("abc") == [
        "ab", "bc", "abc",
    ]


def test_edge_gram_vectors():  # TestEdgeNGramTokenFilter
    assert EdgeNGramFilter(1, 1).grams("abcde") == ["a"]
    assert EdgeNGramFilter(1, 3).grams("abcde") == ["a", "ab", "abc"]
    assert EdgeNGramFilter(6, 6).grams("abcde") == []
    assert EdgeNGramFilter(6, 6, True).grams("abcde") == ["abcde"]
    assert EdgeNGramFilter(2, 3, True).grams("abcde") == ["ab", "abc", "abcde"]
    assert EdgeNGramFilter(2, 5).grams("abcde") == ["ab", "abc", "abcd", "abcde"]


def test_ctor_validation():
    with pytest.raises(ValueError, match="greater than zero"):
        NGramFilter(0, 1)
    with pytest.raises(ValueError, match="not be greater"):
        NGramFilter(3, 2)


def _stream(batch):
    return sorted(
        zip(batch.tok_doc_idx.tolist(), batch.tok_positions.tolist(),
            batch.tok_terms.tolist())
    )


def test_small_token_leaves_hole():  # testSmallTokenInStream
    b = analyze_batch(["abc de fgh"])
    out = NGramFilter(3, 3).apply(b)
    assert _stream(out) == [(0, 0, "abc"), (0, 2, "fgh")]  # hole at pos 1
    assert out.doc_lens.tolist() == [2]  # 'de' emitted nothing
    out2 = NGramFilter(3, 3, preserve_original=True).apply(b)
    assert _stream(out2) == [(0, 0, "abc"), (0, 1, "de"), (0, 2, "fgh")]
    assert out2.doc_lens.tolist() == [3]


def test_stacked_at_token_position():
    b = analyze_batch(["abcd xy"])
    out = EdgeNGramFilter(2, 3).apply(b)
    assert _stream(out) == [
        (0, 0, "ab"), (0, 0, "abc"), (0, 1, "xy"),
    ]
    assert out.doc_lens.tolist() == [2]


# ---------------------------------------------------------------------------
# e2e: edge-gram index == prefix query match set
# ---------------------------------------------------------------------------

N_DOCS = 160


@pytest.fixture(scope="module")
def corpus_pdf():
    rng = np.random.RandomState(5)
    words = ["table", "tablet", "tabulate", "scan", "scatter", "merge",
             "mercury", "index", "row"]
    texts = [
        " ".join(rng.choice(words, size=rng.randint(4, 25)))
        for _ in range(N_DOCS)
    ]
    return pd.DataFrame({
        "gid": np.arange(N_DOCS, dtype=np.int64),
        "url": [f"u{i}" for i in range(N_DOCS)],
        "text": texts,
    })


@pytest.fixture(scope="module")
def edge_index(spark, corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_edge"))
    indexer.build_index(
        spark, spark.createDataFrame(corpus_pdf), d,
        key_col="url", text_col="text", gid_col="gid", n_segments=3,
        stream_filter=EdgeNGramFilter(2, 4, preserve_original=True),
    )
    return d


def test_edge_index_matches_prefix_query(spark, corpus_pdf, edge_index, tmp_path_factory):
    d2 = str(tmp_path_factory.mktemp("idx_plain_edge"))
    indexer.build_index(
        spark, spark.createDataFrame(corpus_pdf), d2,
        key_col="url", text_col="text", gid_col="gid", n_segments=3,
    )
    plain = Searcher(spark, d2)
    grams = Searcher(spark, edge_index)
    for prefix in ("tab", "sc", "mer"):
        want = set(
            plain.candidates(PrefixQ(prefix), k=N_DOCS, prune=False)
            .toPandas()["gid"].astype(int)
        )
        got = set(
            grams.candidates(TermQ(prefix), k=N_DOCS, prune=False)
            .toPandas()["gid"].astype(int)
        )
        assert got == want and want, prefix


def test_stream_filter_append_guard(spark, corpus_pdf, edge_index):
    df = spark.createDataFrame(corpus_pdf)
    with pytest.raises(ValueError, match="stream_filter"):
        indexer.build_index(
            spark, df, edge_index, key_col="url", text_col="text",
            gid_col="gid", n_segments=2, append=True,
        )


# ---------------------------------------------------------------------------
# LengthFilter (miscellaneous/LengthFilter.java)
# ---------------------------------------------------------------------------

def test_length_filter_basic():
    from lucene_spark.functions.tokenfilters import LengthFilter

    b = analyze_batch(["ab abc abcd abcde x"])
    out = LengthFilter(3, 4).apply(b)
    assert _stream(out) == [(0, 1, "abc"), (0, 2, "abcd")]  # holes kept
    assert out.doc_lens.tolist() == [2]
    # all-kept short-circuits to the same batch
    assert LengthFilter(1, 10).apply(b) is b


def test_length_filter_validation():
    from lucene_spark.functions.tokenfilters import LengthFilter

    with pytest.raises(ValueError, match="greater than or equal to zero"):
        LengthFilter(-1, 3)
    with pytest.raises(ValueError, match="not be greater"):
        LengthFilter(5, 3)
    assert LengthFilter(1, 2).fingerprint() != LengthFilter(1, 3).fingerprint()


# ---------------------------------------------------------------------------
# StemRepeatFilter (KeywordRepeat + stemmer + RemoveDuplicates)
# ---------------------------------------------------------------------------

def test_stem_repeat_stream():
    from lucene_spark.functions.stem import porter_stem
    from lucene_spark.functions.tokenfilters import StemRepeatFilter

    b = analyze_batch(["running tables fast"])
    out = StemRepeatFilter(porter_stem).apply(b)
    assert _stream(out) == [
        (0, 0, "run"), (0, 0, "running"),
        (0, 1, "tabl"), (0, 1, "tables"),
        (0, 2, "fast"),
    ]
    assert out.doc_lens.tolist() == [3]  # stems are discounted overlaps
    # all-stable vocab short-circuits
    b2 = analyze_batch(["fast sort"])
    assert StemRepeatFilter(porter_stem).apply(b2) is b2


def test_stem_repeat_index_e2e(spark, tmp_path_factory):
    """Surface queries stay exact; stem queries match the stemmed family;
    surface-form scores are UNCHANGED by the repeats (overlap norms)."""
    from lucene_spark.functions.stem import porter_stem
    from lucene_spark.functions.tokenfilters import StemRepeatFilter

    pdf = pd.DataFrame({
        "gid": np.arange(4, dtype=np.int64),
        "url": [f"u{i}" for i in range(4)],
        "text": ["running fast", "runs fast", "run fast", "walk slow"],
    })
    d = str(tmp_path_factory.mktemp("idx_stemrep"))
    indexer.build_index(
        spark, spark.createDataFrame(pdf), d, key_col="url",
        text_col="text", gid_col="gid", n_segments=2,
        stream_filter=StemRepeatFilter(porter_stem),
    )
    d2 = str(tmp_path_factory.mktemp("idx_plain_stemrep"))
    indexer.build_index(
        spark, spark.createDataFrame(pdf), d2, key_col="url",
        text_col="text", gid_col="gid", n_segments=2,
    )
    s, sp = Searcher(spark, d), Searcher(spark, d2)
    # stem query matches the whole family
    got = set(s.search("run", k=10, with_keys=False)["gid"].astype(int))
    assert got == {0, 1, 2}
    # surface query: same docs as the plain index
    a = s.search("running", k=10, with_keys=False)
    b = sp.search("running", k=10, with_keys=False)
    assert list(a["gid"]) == list(b["gid"])
