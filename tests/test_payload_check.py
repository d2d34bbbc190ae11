"""SpanPayloadCheckQuery analog
(queries/payloads/SpanPayloadCheckQuery.java): spans survive only where
each position's payload matches the given value under a MatchOperation.

Brute-force replay: a pure-Python greedy NearSpansOrdered chain with the
payload check recomputes every doc's float32 freq from the raw text, and
the engine's distributed result must match rank- and score-exactly.
"""

import numpy as np
import pytest

from lucene_spark.functions.bm25 import idf as bm25_idf, idf_sum
from lucene_spark.functions.smallfloat import int_to_byte4_np
from lucene_spark.operators import indexer
from lucene_spark.operators.search import Searcher
from lucene_spark.plans.query import BoostQ, SpanPayloadCheckQ
from lucene_spark.sources.webtext import generate_pages_pdf

N_DOCS = 240

_OPS = {
    "eq": lambda a, b: a == b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
}


@pytest.fixture(scope="module")
def corpus_pdf():
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
    d = str(tmp_path_factory.mktemp("idx_paycheck"))
    df = spark.createDataFrame(corpus_pdf[["gid", "url", "ptext"]])
    indexer.build_index(
        spark, df, d, key_col="url", text_col="ptext", gid_col="gid",
        n_segments=4, with_payloads=True,
    )
    return d


def _doc_occurrences(corpus_pdf, term):
    """gid -> [(pos, payload)] recomputed from the raw (pre-delimiter)
    text, plus doc lens and collection stats (payload chain: no stops)."""
    occ, doc_lens = {}, {}
    for gid, text in zip(corpus_pdf["gid"], corpus_pdf["text"]):
        toks = [t for t in text.split(" ") if t]
        doc_lens[int(gid)] = len(toks)
        rows = [
            (pos, (pos + len(t)) % 97 + 1)
            for pos, t in enumerate(toks) if t == term
        ]
        if rows:
            occ[int(gid)] = rows
    return occ, doc_lens


def _brute_topk(corpus_pdf, terms, payloads, slop, op, k=10):
    """Greedy ordered chain + payload check, float32 freq accumulation in
    match order (SpanScorer.java:106), BM25 with summed full-df idfs."""
    cmp = _OPS[op]
    occs, doc_lens = [], None
    for t in terms:
        o, doc_lens = _doc_occurrences(corpus_pdf, t)
        occs.append(o)
    n_docs = sum(1 for v in doc_lens.values() if v > 0)
    sum_ttf = sum(doc_lens.values())
    # SpanWeight.buildSimWeight: idf summed over member term states with
    # FULL docFreqs (the payload filter never changes stats)
    w = idf_sum([bm25_idf(len(o), n_docs) for o in occs])
    rows = []
    for gid in occs[0]:
        if any(gid not in o for o in occs):
            continue
        freq = np.float32(0.0)
        for p0, pay0 in occs[0][gid]:
            ok = cmp(pay0, payloads[0])
            q = p0
            for i in range(1, len(terms)):
                nxt = [(p, pl) for p, pl in occs[i][gid] if p >= q + 1]
                if not nxt:
                    q = None
                    break
                q, pl = nxt[0]
                ok = ok and cmp(pl, payloads[i])
            if q is None:
                break
            width = q - p0 - (len(terms) - 1)
            if ok and width <= slop:
                freq = np.float32(
                    freq + np.float32(1.0 / (1.0 + float(width)))
                )
        if freq > 0:
            norm_b = int_to_byte4_np(np.array([doc_lens[gid]], np.int64))
            cache = scorer_cache(sum_ttf, n_docs)
            s = np.float32(w) - np.float32(w) / (
                np.float32(1.0) + freq * cache[int(norm_b[0])]
            )
            rows.append((gid, float(np.float32(s))))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def scorer_cache(sum_ttf, n_docs):
    from lucene_spark.functions.bm25 import avgdl, norm_cache

    return norm_cache(avgdl(sum_ttf, n_docs))


def _got(spark, d, node, k=10):
    pdf = Searcher(spark, d).search(node, k=k, with_keys=False)
    return [(int(g), float(np.float32(s))) for g, s in zip(pdf.gid, pdf.score)]


def test_single_term_payload_eq(spark, corpus_pdf, payload_index):
    term = "t0002"
    occ, _ = _doc_occurrences(corpus_pdf, term)
    pays = [p for rows in occ.values() for _, p in rows]
    pay = max(set(pays), key=pays.count)  # a value with several hits
    node = SpanPayloadCheckQ((term,), (pay,))
    want = _brute_topk(corpus_pdf, (term,), (pay,), 0, "eq")
    assert want
    assert _got(spark, payload_index, node) == want


def test_single_term_payload_ops(spark, corpus_pdf, payload_index):
    term = "t0005"
    for op, pay in (("gte", 49), ("lt", 30), ("lte", 12), ("gt", 80)):
        node = SpanPayloadCheckQ((term,), (pay,), op=op)
        want = _brute_topk(corpus_pdf, (term,), (pay,), 0, op)
        assert _got(spark, payload_index, node) == want


def test_pair_adjacent_payload_check(spark, corpus_pdf, payload_index):
    # no stop filter in the payload chain, so "be" is indexed — the
    # fixture has hundreds of adjacent (t0000, be) pairs
    terms = ("t0000", "be")
    node = SpanPayloadCheckQ(terms, (40, 40), slop=0, op="gte")
    want = _brute_topk(corpus_pdf, terms, (40, 40), 0, "gte")
    assert want, "fixture should produce adjacent pairs"
    assert _got(spark, payload_index, node) == want


def test_pair_sloppy_payload_check(spark, corpus_pdf, payload_index):
    terms = ("t0000", "of")
    for slop in (1, 3):
        node = SpanPayloadCheckQ(terms, (30, 30), slop=slop, op="gte")
        want = _brute_topk(corpus_pdf, terms, (30, 30), slop, "gte")
        assert want
        assert _got(spark, payload_index, node) == want


def test_boost_over_payload_check(spark, corpus_pdf, payload_index):
    term = "t0002"
    node = SpanPayloadCheckQ((term,), (49,), op="gte")
    base = _got(spark, payload_index, node, k=5)
    b2 = _got(spark, payload_index, BoostQ(node, 2.0), k=5)
    assert [g for g, _ in base] == [g for g, _ in b2]
    assert all(s2 > s1 for (_, s1), (_, s2) in zip(base, b2))


def test_requires_payload_index(spark, corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_nopay"))
    df = spark.createDataFrame(corpus_pdf[["gid", "url", "ptext"]])
    indexer.build_index(
        spark, df, d, key_col="url", text_col="ptext", gid_col="gid",
        n_segments=2, with_payloads=False,
    )
    with pytest.raises(ValueError, match="payloads-enabled"):
        Searcher(spark, d).search(SpanPayloadCheckQ(("t0002",), (5,)), k=5)


def test_bad_node_args():
    with pytest.raises(ValueError):
        SpanPayloadCheckQ(("a", "b"), (1,))
    with pytest.raises(ValueError):
        SpanPayloadCheckQ(("a",), (1,), op="ne")
