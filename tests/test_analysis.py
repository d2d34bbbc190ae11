"""Analysis-chain goldens (FIXTURES.md §4): tokenize -> lowercase -> stop.

Mirrors the reference's StandardAnalyzer behavior including stop-filter
position holes (FilteringTokenFilter.java:49-60) and max-token-length
chopping (StandardTokenizer.java:38-98).
"""

import numpy as np

from lucene_spark.functions.analysis import MAX_TOKEN_LENGTH, analyze_batch


def _tokens(text):
    b = analyze_batch([text])
    return list(zip(b.tok_terms.tolist(), b.tok_positions.tolist()))


def test_simple_prose():
    assert _tokens("Hello World hello") == [("hello", 0), ("world", 1), ("hello", 2)]


def test_stopword_position_holes():
    # "the quick the brown" -> quick@1, brown@3
    assert _tokens("the quick the brown") == [("quick", 1), ("brown", 3)]


def test_punctuation_urls_numbers():
    assert _tokens("foo-bar, baz! 3.14 x2") == [
        ("foo", 0),
        ("bar", 1),
        ("baz", 2),
        ("3", 3),
        ("14", 4),
        ("x2", 5),
    ]


def test_all_stopwords_doc():
    b = analyze_batch(["the and of to"])
    assert b.doc_lens[0] == 0
    assert len(b.tok_terms) == 0


def test_empty_and_null():
    import pandas as pd

    b = analyze_batch(pd.Series(["", None, "word"]))
    assert list(b.doc_lens) == [0, 0, 1]
    assert b.tok_doc_idx[0] == 2


def test_cjk_single_char_tokens():
    assert _tokens("中文abc") == [("中", 0), ("文", 1), ("abc", 2)]


def test_long_token_chopped():
    long = "a" * 600
    toks = _tokens(long)
    assert [len(t) for t, _ in toks] == [MAX_TOKEN_LENGTH, MAX_TOKEN_LENGTH, 90]
    assert [p for _, p in toks] == [0, 1, 2]


def test_doc_lens_and_batch_alignment():
    texts = ["the cat sat", "dog dog dog dog", "", "a an and"]
    b = analyze_batch(texts)
    assert list(b.doc_lens) == [2, 4, 0, 0]
    np.testing.assert_array_equal(np.bincount(b.tok_doc_idx, minlength=4), b.doc_lens)


def test_unicode_lowercase():
    assert _tokens("Füße GROSS") == [("füße", 0), ("gross", 1)]
