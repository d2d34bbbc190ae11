"""Indexed character offsets (IndexOptions ..._AND_OFFSETS analog):
analysis-time offset extraction, the postings offset streams through
build/merge/purge, and the OffsetSource.POSTINGS highlighter."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.functions.analysis import analyze_batch
from lucene_spark.operators import indexer
from lucene_spark.operators.highlight import highlight_from_postings
from lucene_spark.operators.search import Searcher
from lucene_spark.sources.webtext import generate_pages_pdf

N_DOCS = 240


def test_analyze_offsets_match_source_text():
    texts = [
        "the quick brown fox",
        "hello  world a",          # double space + stop word
        "",
        "Héllo WORLD, foo-bar 漢字テスト",   # unicode, punctuation, CJK singles
        "x" * 600 + " tail",       # >255-char chop
    ]
    b = analyze_batch(texts, with_offsets=True)
    assert len(b.tok_starts) == len(b.tok_terms)
    for d, t, s, e in zip(b.tok_doc_idx, b.tok_terms, b.tok_starts, b.tok_ends):
        # every token's span in the ORIGINAL text lowercases to the token
        assert texts[d][s:e].lower() == t
    # the token/position stream is IDENTICAL to the offset-free path
    b0 = analyze_batch(texts)
    key = lambda bb: sorted(
        zip(bb.tok_doc_idx.tolist(), bb.tok_positions.tolist(), bb.tok_terms.tolist())
    )
    assert key(b0) == key(b)
    assert (b0.doc_lens == b.doc_lens).all()
    # CJK singles: one offset per character
    d3 = [(t, s, e) for d, t, s, e in
          zip(b.tok_doc_idx, b.tok_terms, b.tok_starts, b.tok_ends) if d == 3]
    assert ("漢", 21, 22) in d3 and ("字", 22, 23) in d3
    # 255-chop: chunks tile the original run
    d4 = sorted((s, e) for d, t, s, e in
                zip(b.tok_doc_idx, b.tok_terms, b.tok_starts, b.tok_ends) if d == 4)
    assert d4 == [(0, 255), (255, 510), (510, 600), (601, 605)]


@pytest.fixture(scope="module")
def corpus_pdf():
    pdf = generate_pages_pdf(0, N_DOCS, seed=11)
    pdf = pdf.sort_values("url", kind="mergesort").reset_index(drop=True)
    pdf["gid"] = np.arange(len(pdf), dtype=np.int64)
    return pdf


@pytest.fixture(scope="module")
def offsets_index(spark, corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_off"))
    df = spark.createDataFrame(corpus_pdf[["gid", "url", "text"]])
    indexer.build_index(
        spark, df, d, key_col="url", text_col="text", gid_col="gid",
        n_segments=4, with_offsets=True,
    )
    return d


def _expected_offsets(corpus_pdf, term):
    rows = []
    for gid, text in zip(corpus_pdf["gid"], corpus_pdf["text"]):
        at = 0
        for pos, tok in enumerate(t for t in text.split(" ") if t):
            if tok == term:
                rows.append((int(gid), pos, at, at + len(tok)))
            at += len(tok) + 1
    return rows


def _got_offsets(spark, d, term):
    pdf = (
        Searcher(spark, d).term_offsets(term).toPandas()
        .sort_values(["gid", "position"]).reset_index(drop=True)
    )
    return [tuple(int(x) for x in r) for r in pdf.itertuples(index=False)]


def test_term_offsets_exact(spark, corpus_pdf, offsets_index):
    for term in ("t0002", "t0015"):
        want = _expected_offsets(corpus_pdf, term)
        assert want, term
        assert _got_offsets(spark, offsets_index, term) == want


def test_offsets_survive_purging_merge(spark, corpus_pdf, offsets_index, tmp_path_factory):
    import shutil

    d = str(tmp_path_factory.mktemp("idx_off_merge"))
    shutil.copytree(offsets_index, d, dirs_exist_ok=True)
    indexer.delete_docs(spark, d, gids=range(0, N_DOCS, 3))
    from lucene_spark.operators.merge import merge_index

    merge_index(spark, d, purge=True)
    term = "t0002"
    want = [r for r in _expected_offsets(corpus_pdf, term) if r[0] % 3 != 0]
    assert _got_offsets(spark, d, term) == want
    # scoring still works over the merged offset-bearing postings
    got = Searcher(spark, d).search(term, k=5, with_keys=False)
    assert len(got) == 5


def test_highlight_from_postings(spark, corpus_pdf, offsets_index):
    term = "t0015"
    docs = spark.createDataFrame(
        corpus_pdf[["gid", "text"]].rename(columns={"gid": "doc_id"})
    )
    out = highlight_from_postings(
        Searcher(spark, offsets_index), docs, term, char_window=10
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    want = {}
    for gid, pos, s, e in _expected_offsets(corpus_pdf, term):
        want.setdefault(gid, (s, e))
    assert set(out["doc_id"]) == set(want)
    texts = dict(zip(corpus_pdf["gid"], corpus_pdf["text"]))
    for r in out.itertuples(index=False):
        s, e = want[r.doc_id]
        assert (r.start_off, r.end_off) == (s, e)
        lo = max(s - 10, 0)
        assert r.snippet == texts[r.doc_id][lo : lo + (e - s) + 20]
        assert term in r.snippet


def test_offsets_guardrails(spark, corpus_pdf, offsets_index, tmp_path_factory):
    # no offsets -> clear error
    d = str(tmp_path_factory.mktemp("idx_plain"))
    df = spark.createDataFrame(corpus_pdf[["gid", "url", "text"]])
    indexer.build_index(
        spark, df, d, key_col="url", text_col="text", gid_col="gid", n_segments=2
    )
    with pytest.raises(ValueError, match="no offsets"):
        Searcher(spark, d).term_offsets("t0002")
    # append must keep the same IndexOptions
    with pytest.raises(ValueError, match="with_offsets"):
        indexer.build_index(
            spark, df, offsets_index, key_col="url", text_col="text",
            gid_col="gid", n_segments=2, append=True,
        )
    with pytest.raises(ValueError, match="with_positions"):
        indexer.invert_segment(
            0, np.array([0]), np.array(["k"]), pd.Series(["a b"]),
            with_positions=False, with_offsets=True,
        )
