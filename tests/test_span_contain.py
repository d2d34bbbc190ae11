"""SpanPositionRangeQuery / SpanContainingQuery / SpanWithinQuery.

Oracle: a direct Python replay of the reference matchers —
SpanPositionRangeQuery.acceptPosition and ContainSpans'
twoPhaseCurrentDocMatches/nextStartPosition cursor loops
(queries/spans/SpanContainingQuery.java, SpanWithinQuery.java) — over the
raw token streams, scored with the engine's own BM25 pieces.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.functions.analysis import ENGLISH_STOP_WORDS
from lucene_spark.operators import indexer
from lucene_spark.operators.search import Searcher
from lucene_spark.plans.query import (
    SpanContainingQ,
    SpanFirstQ,
    SpanNearQ,
    SpanOrQ,
    SpanPositionRangeQ,
    SpanWithinQ,
)

N_DOCS = 120


@pytest.fixture(scope="module")
def corpus_pdf():
    rng = np.random.RandomState(11)
    words = ["alpha", "beta", "gamma", "delta", "open", "close", "mid"]
    texts = [
        " ".join(rng.choice(words, size=rng.randint(6, 60)))
        for _ in range(N_DOCS)
    ]
    return pd.DataFrame({
        "gid": np.arange(N_DOCS, dtype=np.int64),
        "url": [f"u{i}" for i in range(N_DOCS)],
        "text": texts,
    })


@pytest.fixture(scope="module")
def index_dir(spark, corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_contain"))
    indexer.build_index(
        spark, spark.createDataFrame(corpus_pdf), d,
        key_col="url", text_col="text", gid_col="gid", n_segments=3,
    )
    return d


# ------------------------------------------------------------- brute spans

def _positions(text):
    out = {}
    for p, t in enumerate(text.split()):
        if t and t not in ENGLISH_STOP_WORDS:
            out.setdefault(t, []).append(p)
    return out


def _sub_spans(sub, pos_of):
    """Emitted (start, end, width) spans of a span source, start order."""
    if isinstance(sub, str):
        return [(p, p + 1, 0) for p in pos_of.get(sub, [])]
    if isinstance(sub, SpanOrQ):
        ps = sorted(p for t in sub.terms for p in pos_of.get(t, []))
        return [(p, p + 1, 0) for p in ps]
    assert isinstance(sub, SpanNearQ) and sub.in_order
    plists = [pos_of.get(t, []) for t in sub.terms]
    if any(not pl for pl in plists):
        return []
    spans = []
    for p0 in plists[0]:
        q = p0
        ok = True
        for pl in plists[1:]:
            nxt = [p for p in pl if p >= q + 1]
            if not nxt:
                ok = False
                break
            q = nxt[0]
        if ok:
            width = q - p0 - (len(plists) - 1)
            if width <= sub.slop:
                spans.append((p0, q + 1, width))
    return spans


def _contain_matches(big_spans, little_spans, within):
    """ContainSpans cursor replay: returns accepted (start, width) list."""
    acc = []
    if within:
        bi = 0
        for (ls, le, lw) in little_spans:
            while bi < len(big_spans) and big_spans[bi][1] < le:
                bi += 1
            if bi >= len(big_spans):
                break
            if big_spans[bi][0] <= ls:
                acc.append((ls, lw))
    else:
        li = 0
        for (bs, be, bw) in big_spans:
            while li < len(little_spans) and little_spans[li][0] < bs:
                li += 1
            if li >= len(little_spans):
                break
            if be >= little_spans[li][1]:
                acc.append((bs, bw))
    return acc


def _brute_scores(corpus_pdf, node):
    """Per-doc float32 freq via the matcher replay; scored with the
    engine's own BM25 pieces (idf summed over the DISTINCT union of both
    sides' terms, SmallFloat-quantized length norm)."""
    from lucene_spark.functions.bm25 import avgdl, idf, norm_cache
    from lucene_spark.functions.smallfloat import int_to_byte4

    n_docs = len(corpus_pdf)
    dls, dfs, tok_lists = [], {}, []
    for text in corpus_pdf["text"]:
        pos_of = _positions(text)
        tok_lists.append(pos_of)
        dls.append(sum(len(v) for v in pos_of.values()))
        for t in pos_of:
            dfs[t] = dfs.get(t, 0) + 1
    cache = norm_cache(avgdl(sum(dls), n_docs))
    uniq = list(dict.fromkeys(node.terms))
    w = np.float32(sum(
        float(idf(dfs[t], n_docs)) for t in uniq if t in dfs
    ))
    out = {}
    for gid, pos_of, dl in zip(corpus_pdf["gid"], tok_lists, dls):
        if isinstance(node, SpanPositionRangeQ):
            spans = [(p, 0) for p in pos_of.get(node.term, [])
                     if node.start <= p <= node.end - 1]
        else:
            bigs = _sub_spans(node.big, pos_of)
            littles = _sub_spans(node.little, pos_of)
            spans = _contain_matches(
                bigs, littles, isinstance(node, SpanWithinQ)
            )
        if not spans:
            continue
        freq = np.float32(0.0)
        for _, width in spans:
            freq = np.float32(
                freq + np.float32(1.0 / np.float64(1.0 + width))
            )
        norm_inv = cache[int_to_byte4(dl)]
        score = w - w / (np.float32(1.0) + np.float32(freq) * norm_inv)
        out[int(gid)] = float(np.float32(score))
    return out


def _got(spark, d, node, k=200):
    pdf = Searcher(spark, d).search(node, k=k, with_keys=False)
    return {int(g): float(s) for g, s in zip(pdf["gid"], pdf["score"])}


CASES = [
    SpanPositionRangeQ("alpha", 2, 9),
    SpanPositionRangeQ("beta", 0, 4),
    SpanContainingQ(SpanNearQ(("open", "close"), slop=6), "mid"),
    SpanWithinQ(SpanNearQ(("open", "close"), slop=6), "mid"),
    SpanContainingQ(SpanNearQ(("alpha", "beta"), slop=4),
                    SpanOrQ(("gamma", "delta"))),
    SpanWithinQ(SpanNearQ(("alpha", "gamma"), slop=8),
                SpanOrQ(("beta", "delta"))),
    SpanContainingQ(SpanNearQ(("open", "mid", "close"), slop=10), "beta"),
]


@pytest.mark.parametrize("node", CASES, ids=range(len(CASES)))
def test_vs_matcher_replay(spark, corpus_pdf, index_dir, node):
    want = _brute_scores(corpus_pdf, node)
    got = _got(spark, index_dir, node)
    assert set(got) == set(want)
    for g in want:
        assert got[g] == pytest.approx(want[g], abs=0.0), g


def test_span_first_is_position_range_zero(spark, corpus_pdf, index_dir):
    a = _got(spark, index_dir, SpanPositionRangeQ("alpha", 0, 5))
    b = _got(spark, index_dir, SpanFirstQ("alpha", 5))
    assert a == b and a


# ---------------------------------------------------------------------------
# SpanMultiTermQueryWrapper
# ---------------------------------------------------------------------------

def test_span_multi_rewrites_to_span_or(spark, corpus_pdf, index_dir):
    from lucene_spark.plans.query import PrefixQ, SpanMultiQ

    s = Searcher(spark, index_dir)
    # vocab terms starting 'de': delta; 'o': open; multi: 'al','be','ga'...
    node = SpanMultiQ(PrefixQ("g"))
    a = s.search(node, k=20, with_keys=False)
    b = s.search(SpanOrQ(("gamma",)), k=20, with_keys=False)
    # single expansion collapses to the term query == SpanOr of one
    assert a.values.tolist() == b.values.tolist()
    # multi-term expansion == explicit SpanOr over the matched vocabulary
    node2 = SpanMultiQ(PrefixQ("de"))
    got = s.search(node2, k=50, with_keys=False)
    want = s.search(SpanOrQ(("delta",)), k=50, with_keys=False)
    assert got.values.tolist() == want.values.tolist()


def test_span_multi_inside_contain(spark, corpus_pdf, index_dir):
    from lucene_spark.plans.query import PrefixQ, SpanMultiQ

    s = Searcher(spark, index_dir)
    node = SpanContainingQ(
        SpanNearQ(("open", "close"), slop=6), SpanMultiQ(PrefixQ("m"))
    )
    want_node = SpanContainingQ(SpanNearQ(("open", "close"), slop=6), "mid")
    a = s.search(node, k=50, with_keys=False)
    b = s.search(want_node, k=50, with_keys=False)
    assert a.values.tolist() == b.values.tolist() and len(a)


def test_span_multi_top_terms(spark, index_dir):
    from lucene_spark.plans.query import PrefixQ, SpanMultiQ

    s = Searcher(spark, index_dir)
    # alpha, (no 'ab'..), vs top_terms=1 keeps the term-order head
    full = s.rewrite(SpanMultiQ(PrefixQ("")))
    top1 = s.rewrite(SpanMultiQ(PrefixQ(""), top_terms=1))
    from lucene_spark.plans.query import SpanOrQ as _SO, TermQ as _TQ
    assert isinstance(full, _SO) and len(full.terms) >= 5
    assert isinstance(top1, _TQ) and top1.term == min(full.terms)


def test_span_multi_empty_expansion(spark, index_dir):
    from lucene_spark.plans.query import PrefixQ, SpanMultiQ

    s = Searcher(spark, index_dir)
    assert len(s.search(SpanMultiQ(PrefixQ("zzz")), k=5, with_keys=False)) == 0


# ---------------------------------------------------------------------------
# SpanNearSpansQ — general ordered near over span clauses (+ gaps)
# ---------------------------------------------------------------------------

from lucene_spark.plans.query import SpanNearSpansQ


def _clause_spans(c, pos_of):
    if isinstance(c, SpanNearSpansQ):
        return _near_spans_replay(c, pos_of)
    return _sub_spans(c, pos_of)


def _near_spans_replay(node, pos_of):
    """NearSpansOrdered over clauses, stateful-cursor replay in Python.
    Returns (start, end, width) triples so nested clauses compose."""
    spans = []
    firsts = _clause_spans(node.clauses[0], pos_of)
    for (s0, e0, _w) in firsts:
        q, width, ok = e0, 0, True
        for c in node.clauses[1:]:
            if isinstance(c, tuple) and c[0] == "gap":
                q += c[1]
                continue
            nxt = [sp for sp in _clause_spans(c, pos_of) if sp[0] >= q]
            if not nxt:
                ok = False
                break
            width += nxt[0][0] - q
            q = nxt[0][1]
        if ok and width <= node.slop:
            spans.append((s0, q, width))
    return spans


def _brute_near_spans(corpus_pdf, node):
    from lucene_spark.functions.bm25 import avgdl, idf, norm_cache
    from lucene_spark.functions.smallfloat import int_to_byte4

    n_docs = len(corpus_pdf)
    dls, dfs, tok_lists = [], {}, []
    for text in corpus_pdf["text"]:
        pos_of = _positions(text)
        tok_lists.append(pos_of)
        dls.append(sum(len(v) for v in pos_of.values()))
        for t in pos_of:
            dfs[t] = dfs.get(t, 0) + 1
    cache = norm_cache(avgdl(sum(dls), n_docs))
    uniq = list(dict.fromkeys(node.terms))
    w = np.float32(sum(float(idf(dfs[t], n_docs)) for t in uniq if t in dfs))
    out = {}
    for gid, pos_of, dl in zip(corpus_pdf["gid"], tok_lists, dls):
        spans = _near_spans_replay(node, pos_of)
        if not spans:
            continue
        freq = np.float32(0.0)
        for _, _e, width in spans:
            freq = np.float32(freq + np.float32(1.0 / np.float64(1.0 + width)))
        score = w - w / (np.float32(1.0) + np.float32(freq)
                         * cache[int_to_byte4(dl)])
        out[int(gid)] = float(np.float32(score))
    return out


NEAR_SPANS_CASES = [
    SpanNearSpansQ((SpanOrQ(("alpha", "beta")), "gamma"), slop=4),
    SpanNearSpansQ(("open", SpanOrQ(("mid", "beta")), "close"), slop=8),
    SpanNearSpansQ((SpanNearQ(("alpha", "beta"), slop=3), "delta"), slop=6),
    SpanNearSpansQ(("open", ("gap", 2), "close"), slop=5),
    SpanNearSpansQ(
        (SpanNearSpansQ(("alpha", "gamma"), slop=5), SpanOrQ(("mid", "delta"))),
        slop=9,
    ),
]


@pytest.mark.parametrize("node", NEAR_SPANS_CASES,
                         ids=range(len(NEAR_SPANS_CASES)))
def test_near_spans_vs_replay(spark, corpus_pdf, index_dir, node):
    want = _brute_near_spans(corpus_pdf, node)
    got = _got(spark, index_dir, node)
    assert set(got) == set(want)
    for g in want:
        assert got[g] == pytest.approx(want[g], abs=0.0), g


def test_near_spans_term_clauses_equal_span_near(spark, index_dir):
    """Pure-term clauses: the general matcher's gap-sum width equals the
    classic chain's q_last - p0 - (n-1), so scores are float32-identical
    to SpanNearQ (idf dedup aside: terms here are distinct)."""
    a = _got(spark, index_dir,
             SpanNearSpansQ(("open", "mid", "close"), slop=7))
    b = _got(spark, index_dir, SpanNearQ(("open", "mid", "close"), slop=7))
    assert a == b and a


def test_near_spans_leading_gap_rejected(spark, index_dir):
    s = Searcher(spark, index_dir)
    with pytest.raises(Exception, match="gap"):
        s.search(SpanNearSpansQ((("gap", 1), "open"), slop=3), k=5,
                 with_keys=False)


# ---------------------------------------------------------------------------
# SpanNotSpansQ — general SpanNot over span clauses
# ---------------------------------------------------------------------------

from lucene_spark.plans.query import SpanNotQ, SpanNotSpansQ


def _not_spans_replay(node, pos_of):
    """FilterSpans.accept replay: include spans survive unless the first
    exclude span with end > s - pre starts before e + post."""
    inc = _clause_spans(node.include, pos_of)
    exc = _clause_spans(node.exclude, pos_of)
    out = []
    for (s, e, w) in inc:
        ei = 0
        while ei < len(exc) and exc[ei][1] <= s - node.pre:
            ei += 1
        if ei < len(exc) and exc[ei][0] < e + node.post:
            continue
        out.append((s, e, w))
    return out


def _brute_not_spans(corpus_pdf, node):
    from lucene_spark.functions.bm25 import avgdl, idf, norm_cache
    from lucene_spark.functions.smallfloat import int_to_byte4

    n_docs = len(corpus_pdf)
    dls, dfs, tok_lists = [], {}, []
    for text in corpus_pdf["text"]:
        pos_of = _positions(text)
        tok_lists.append(pos_of)
        dls.append(sum(len(v) for v in pos_of.values()))
        for t in pos_of:
            dfs[t] = dfs.get(t, 0) + 1
    cache = norm_cache(avgdl(sum(dls), n_docs))
    uniq = list(dict.fromkeys(node.include_terms))
    w = np.float32(sum(float(idf(dfs[t], n_docs)) for t in uniq if t in dfs))
    out = {}
    for gid, pos_of, dl in zip(corpus_pdf["gid"], tok_lists, dls):
        spans = _not_spans_replay(node, pos_of)
        if not spans:
            continue
        freq = np.float32(0.0)
        for _s, _e, width in spans:
            freq = np.float32(freq + np.float32(1.0 / np.float64(1.0 + width)))
        score = w - w / (np.float32(1.0) + np.float32(freq)
                         * cache[int_to_byte4(dl)])
        out[int(gid)] = float(np.float32(score))
    return out


NOT_SPANS_CASES = [
    SpanNotSpansQ(SpanNearQ(("open", "close"), slop=8), "mid"),
    SpanNotSpansQ(SpanOrQ(("alpha", "beta")), SpanNearQ(("gamma", "delta"),
                                                        slop=4), pre=1, post=1),
    SpanNotSpansQ("alpha", SpanOrQ(("beta", "gamma")), pre=2, post=2),
    SpanNotSpansQ(SpanNearSpansQ((SpanOrQ(("open", "alpha")), "close"),
                                 slop=6), "mid", post=1),
]


@pytest.mark.parametrize("node", NOT_SPANS_CASES,
                         ids=range(len(NOT_SPANS_CASES)))
def test_not_spans_vs_replay(spark, corpus_pdf, index_dir, node):
    want = _brute_not_spans(corpus_pdf, node)
    got = _got(spark, index_dir, node)
    assert set(got) == set(want)
    for g in want:
        assert got[g] == pytest.approx(want[g], abs=0.0), g


def test_not_spans_term_sides_equal_span_not(spark, index_dir):
    a = _got(spark, index_dir, SpanNotSpansQ("alpha", "beta", pre=1, post=2))
    b = _got(spark, index_dir, SpanNotQ("alpha", "beta", pre=1, post=2))
    assert a == b and a


def test_not_spans_absent_exclude_passthrough(spark, index_dir):
    a = _got(spark, index_dir, SpanNotSpansQ("alpha", "zzzmissing"))
    b = _got(spark, index_dir, SpanOrQ(("alpha",)))
    assert a == b and a


# ---------------------------------------------------------------------------
# SpanNearSpansQ unordered (NearSpansUnordered over clauses)
# ---------------------------------------------------------------------------

import heapq


def _unordered_replay(node, pos_of):
    """The actual priority-queue algorithm (NearSpansUnordered.java):
    pops by (start, end); maxEnd/totalSpanLength maintained; accepted
    states fold 1/(1+width()) with width() = maxEnd - minStart."""
    clause_spans = [_clause_spans(c, pos_of) for c in node.clauses]
    if any(not cs for cs in clause_spans):
        return []
    heap = []
    max_end = -1
    tot_len = 0
    for i, cs in enumerate(clause_spans):
        s, e, _w = cs[0]
        heapq.heappush(heap, (s, e, i, 0))
        max_end = max(max_end, e)
        tot_len += e - s
    acc = []
    while True:
        s, e, i, ptr = heap[0]
        if (max_end - s - tot_len) <= node.slop:
            acc.append(max_end - s)          # width()
        heapq.heappop(heap)
        if ptr + 1 == len(clause_spans[i]):
            return acc
        s2, e2, _w2 = clause_spans[i][ptr + 1]
        tot_len += (e2 - s2) - (e - s)
        max_end = max(max_end, e2)
        heapq.heappush(heap, (s2, e2, i, ptr + 1))


def _brute_unordered(corpus_pdf, node):
    from lucene_spark.functions.bm25 import avgdl, idf, norm_cache
    from lucene_spark.functions.smallfloat import int_to_byte4

    n_docs = len(corpus_pdf)
    dls, dfs, tok_lists = [], {}, []
    for text in corpus_pdf["text"]:
        pos_of = _positions(text)
        tok_lists.append(pos_of)
        dls.append(sum(len(v) for v in pos_of.values()))
        for t in pos_of:
            dfs[t] = dfs.get(t, 0) + 1
    cache = norm_cache(avgdl(sum(dls), n_docs))
    uniq = list(dict.fromkeys(node.terms))
    w = np.float32(sum(float(idf(dfs[t], n_docs)) for t in uniq if t in dfs))
    out = {}
    for gid, pos_of, dl in zip(corpus_pdf["gid"], tok_lists, dls):
        widths = _unordered_replay(node, pos_of)
        if not widths:
            continue
        freq = np.float32(0.0)
        for sw in widths:
            freq = np.float32(freq + np.float32(1.0 / np.float64(1.0 + sw)))
        if freq == np.float32(0.0):
            continue
        score = w - w / (np.float32(1.0) + np.float32(freq)
                         * cache[int_to_byte4(dl)])
        out[int(gid)] = float(np.float32(score))
    return out


UNORDERED_CASES = [
    SpanNearSpansQ((SpanOrQ(("alpha", "beta")), "gamma"), slop=4,
                   in_order=False),
    SpanNearSpansQ(("close", SpanOrQ(("mid", "delta")), "open"), slop=8,
                   in_order=False),
    SpanNearSpansQ((SpanNearQ(("alpha", "beta"), slop=3), "delta"), slop=6,
                   in_order=False),
    SpanNearSpansQ(("gamma", "open"), slop=2, in_order=False),
]


@pytest.mark.parametrize("node", UNORDERED_CASES,
                         ids=range(len(UNORDERED_CASES)))
def test_unordered_spans_vs_replay(spark, corpus_pdf, index_dir, node):
    want = _brute_unordered(corpus_pdf, node)
    got = _got(spark, index_dir, node)
    assert set(got) == set(want)
    for g in want:
        assert got[g] == pytest.approx(want[g], abs=0.0), g


def test_unordered_spans_term_clauses_equal_span_near(spark, index_dir):
    a = _got(spark, index_dir,
             SpanNearSpansQ(("open", "mid", "close"), slop=7, in_order=False))
    b = _got(spark, index_dir,
             SpanNearQ(("open", "mid", "close"), slop=7, in_order=False))
    assert a == b and a


def test_unordered_gap_rejected():
    with pytest.raises(ValueError, match="ordered near"):
        SpanNearSpansQ(("a", ("gap", 1), "b"), slop=3, in_order=False)
