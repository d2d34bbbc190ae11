"""Integer payloads (PayloadAttribute / DelimitedPayloadTokenFilter +
PayloadScoreQuery analogs): the delimited analysis chain, the payload
stream through build/merge/purge, and the payload scoring functions.

Reference semantics:
  - ``analysis/common/.../payloads/DelimitedPayloadTokenFilter.java:30-77``
    (delimiter looked up from the END of the token),
  - ``queries/.../payloads/PayloadScoreQuery.java:47-100,210-225``
    (docScore = PayloadFunction over occurrence payloads, x spanScore when
    includeSpanScore).
"""

import numpy as np
import pytest

from lucene_spark.functions.analysis import analyze_batch
from lucene_spark.functions.bm25 import BM25Scorer
from lucene_spark.functions.smallfloat import int_to_byte4_np
from lucene_spark.operators import indexer
from lucene_spark.operators.search import Searcher
from lucene_spark.sources.webtext import generate_pages_pdf

N_DOCS = 240


def test_analyze_payload_delim_edges():
    b = analyze_batch(
        ["Foo|3 bar baz|12 |7 the|1 x|9999999999 a|0", "", "plain text"],
        payload_delim=True,
    )
    got = list(zip(b.tok_doc_idx.tolist(), b.tok_terms.tolist(),
                   b.tok_positions.tolist(), b.tok_payloads.tolist()))
    assert got == [
        (0, "foo", 0, 3),            # lowercased AFTER payload strip
        (0, "bar", 1, 0),            # no delimiter -> payload 0
        (0, "baz", 2, 12),
        (0, "", 3, 7),               # empty remainder kept (filter semantics)
        (0, "the", 4, 1),            # NO stop filter in the payload chain
        (0, "x|9999999999", 5, 0),   # >9-digit tail is not a payload
        (0, "a", 6, 0),
        (2, "plain", 0, 0),
        (2, "text", 1, 0),
    ]
    assert b.doc_lens.tolist() == [7, 0, 2]
    # last delimiter wins (backwards scan): "a|b|5" -> term "a|b", payload 5
    b2 = analyze_batch(["a|b|5"], payload_delim=True)
    assert b2.tok_terms.tolist() == ["a|b"] and b2.tok_payloads.tolist() == [5]


@pytest.fixture(scope="module")
def corpus_pdf():
    """Webtext corpus with a deterministic payload per occurrence:
    payload = (position + len(token)) % 97 + 1, attached as ``tok|N``."""
    pdf = generate_pages_pdf(0, N_DOCS, seed=23)
    pdf = pdf.sort_values("url", kind="mergesort").reset_index(drop=True)
    pdf["gid"] = np.arange(len(pdf), dtype=np.int64)

    def attach(text):
        toks = [t for t in text.split(" ") if t]
        return " ".join(
            f"{t}|{(i + len(t)) % 97 + 1}" for i, t in enumerate(toks)
        )

    pdf["ptext"] = pdf["text"].map(attach)
    return pdf


@pytest.fixture(scope="module")
def payload_index(spark, corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_pay"))
    df = spark.createDataFrame(corpus_pdf[["gid", "url", "ptext"]])
    indexer.build_index(
        spark, df, d, key_col="url", text_col="ptext", gid_col="gid",
        n_segments=4, with_payloads=True,
    )
    return d


def _expected_payloads(corpus_pdf, term):
    rows = []
    for gid, text in zip(corpus_pdf["gid"], corpus_pdf["text"]):
        for pos, tok in enumerate(t for t in text.split(" ") if t):
            if tok == term:
                rows.append((int(gid), pos, (pos + len(tok)) % 97 + 1))
    return rows


def _got_payloads(spark, d, term):
    pdf = (
        Searcher(spark, d).term_payloads(term).toPandas()
        .sort_values(["gid", "position"]).reset_index(drop=True)
    )
    return [tuple(int(x) for x in r) for r in pdf.itertuples(index=False)]


def test_term_payloads_exact(spark, corpus_pdf, payload_index):
    for term in ("t0002", "t0015"):
        want = _expected_payloads(corpus_pdf, term)
        assert want, term
        assert _got_payloads(spark, payload_index, term) == want


def test_payloads_survive_purging_merge(spark, corpus_pdf, payload_index,
                                        tmp_path_factory):
    import shutil

    d = str(tmp_path_factory.mktemp("idx_pay_merge"))
    shutil.copytree(payload_index, d, dirs_exist_ok=True)
    indexer.delete_docs(spark, d, gids=range(0, N_DOCS, 3))
    from lucene_spark.operators.merge import merge_index

    merge_index(spark, d, purge=True)
    term = "t0002"
    want = [r for r in _expected_payloads(corpus_pdf, term) if r[0] % 3 != 0]
    assert _got_payloads(spark, d, term) == want


def _brute_payload_topk(corpus_pdf, term, func, include_span_score, k=10):
    """Float32-faithful driver-side oracle over the payload chain (no stop
    filter: doc_len counts every non-empty token)."""
    doc_lens, by_doc = {}, {}
    for gid, text in zip(corpus_pdf["gid"], corpus_pdf["text"]):
        toks = [t for t in text.split(" ") if t]
        doc_lens[int(gid)] = len(toks)
        pays = [
            np.float32((i + len(t)) % 97 + 1)
            for i, t in enumerate(toks) if t == term
        ]
        if pays:
            by_doc[int(gid)] = pays
    n_docs = sum(1 for v in doc_lens.values() if v > 0)
    scorer = BM25Scorer.build(
        doc_freq=len(by_doc), doc_count=n_docs,
        sum_total_term_freq=sum(doc_lens.values()),
    )
    rows = []
    for gid, pays in by_doc.items():
        acc = np.float32(0.0) if func == "sum" else None
        for p in pays:  # sequential float32 accumulation, PayloadFunction
            if func == "sum":
                acc = np.float32(acc + p)
            elif func == "max":
                acc = p if acc is None else np.float32(max(acc, p))
            elif func == "min":
                acc = p if acc is None else np.float32(min(acc, p))
        if func == "avg":
            s = np.float32(0.0)
            for p in pays:
                s = np.float32(s + p)
            acc = np.float32(s / np.float32(len(pays)))
        score = acc
        if include_span_score:
            norm_b = int_to_byte4_np(np.array([doc_lens[gid]], dtype=np.int64))
            span = scorer.score(np.array([len(pays)]), norm_b)[0]
            score = np.float32(np.float32(span) * acc)
        rows.append((gid, float(score)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


@pytest.mark.parametrize("func", ["sum", "max", "min", "avg"])
def test_payload_score_functions(spark, corpus_pdf, payload_index, func):
    got = (
        Searcher(spark, payload_index)
        .payload_score_topk("t0002", func=func, include_span_score=True)
        .toPandas()
    )
    want = _brute_payload_topk(corpus_pdf, "t0002", func, True)
    assert [(int(g), float(s)) for g, s in
            zip(got["gid"], got["score"])] == want


def test_payload_score_without_span(spark, corpus_pdf, payload_index):
    got = (
        Searcher(spark, payload_index)
        .payload_score_topk("t0015", func="max", include_span_score=False)
        .toPandas()
    )
    want = _brute_payload_topk(corpus_pdf, "t0015", "max", False)
    assert [(int(g), float(s)) for g, s in
            zip(got["gid"], got["score"])] == want


def test_payload_flag_mismatch_rejected(spark, corpus_pdf, payload_index):
    df = spark.createDataFrame(corpus_pdf[["gid", "url", "ptext"]].head(8))
    with pytest.raises(ValueError, match="with_payloads must match"):
        indexer.build_index(
            spark, df, payload_index, key_col="url", text_col="ptext",
            gid_col="gid", n_segments=1, append=True,
        )


def test_payload_reader_requires_flag(spark, corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_nopay"))
    df = spark.createDataFrame(corpus_pdf[["gid", "url", "text"]].head(8))
    indexer.build_index(
        spark, df, d, key_col="url", text_col="text", gid_col="gid",
        n_segments=1,
    )
    with pytest.raises(ValueError, match="stores no payloads"):
        Searcher(spark, d).term_payloads("t0002")
