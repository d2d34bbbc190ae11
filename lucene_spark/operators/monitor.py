"""Monitor — reverse search / percolator (``lucene/monitor``).

Register a set of queries ONCE, then match STREAMS of documents against
the whole registered set, reporting which queries match each document.

Reference semantics (files under
``lucene/monitor/src/java/org/apache/lucene/monitor/``):

* ``Monitor.java`` — ``register(MonitorQuery...)`` then
  ``match(Document[], MatcherFactory)``; each matching (doc, query) pair
  is reported through ``MatchingQueries``.
* ``TermFilteredPresearcher.java`` — queries are indexed under an
  extracted TERM SET; an incoming document is turned into a disjunction
  over its own terms (plus the ``ANYTOKEN`` field for queries whose terms
  cannot be extracted) and run against that query index. Every query the
  disjunction hits is a CANDIDATE.
* ``QueryAnalyzer.java`` / ``QueryTree.java`` — term extraction walks the
  query tree: a CONJUNCTION only needs its single best-weighted child's
  terms indexed (any doc matching the query must contain them), a
  DISJUNCTION needs the union of all children; ``ANYTOKEN`` marks
  sub-trees whose terms cannot be enumerated (multi-term, match-all).
  The default ``TermWeightor`` prefers longer tokens
  (``TermWeightor.lengthNorm``), rarer in natural text.
* ``CandidateMatcher.java`` / ``QueryMatch.java`` — every candidate query
  is then executed against an in-memory index of the document batch
  (``DocumentBatch`` wraps a MemoryIndex); only real matches survive.

Spark-first shape (100 TB of documents, ~10^5-10^6 registered queries):

* The registered set parses ONCE into presearcher term rows and a
  compact verification payload, then ships to every executor as a Spark
  BROADCAST — exactly Lucene holding the query index in RAM on each
  matcher node. No per-batch re-parse, no driver round-trips.
* ``match`` is ONE ``mapInPandas`` pass over the documents: each Arrow
  batch is analyzed with the indexer's tokenizer chain, inverted into a
  batch-local mini index (the ``MemoryIndex`` analog: one dictionary
  encode + one lexicographic sort, no per-row Python), candidates are
  selected by intersecting each doc's distinct terms with the broadcast
  term->queries map, and each candidate query verifies VECTORIZED over
  all its candidate docs in the batch at once.
* The whole pipeline is STATELESS (no shuffle, no aggregation), so the
  same transformation runs unchanged under Structured Streaming
  (``match`` accepts a streaming DataFrame; see ``tests/test_monitor.py``).
  Matching cost is O(batch tokens) + O(candidate pairs), and candidate
  pairs are bounded by the presearcher exactly as in the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.analysis import analyze_batch
from ..plans.query import (
    BoolQ,
    BoostQ,
    ConstScoreQ,
    MatchAllQ,
    NearQ,
    PhraseQ,
    PrefixQ,
    RangeQ,
    RegexpQ,
    SloppyQ,
    SynonymQ,
    TermInSetQ,
    TermQ,
    WildcardQ,
    parse_query,
)

# TermFilteredPresearcher.ANYTOKEN_FIELD: queries whose term sets cannot
# be enumerated are indexed under a token every document implicitly has.
ANYTOKEN = "\x00__ANYTOKEN__"

MATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("query_id", T.StringType(), False),
    ]
)


# --------------------------------------------------------- term extraction


def _weight(term_set: frozenset) -> float:
    """QueryAnalyzer's default TermWeightor over an extracted set.

    A set's weight is its MINIMUM token weight (the set is only as
    selective as its least selective required term); token weight is
    length (``TermWeightor.lengthNorm`` — longer tokens are rarer).
    ANYTOKEN weighs 0: any enumerable child beats it.
    """
    if ANYTOKEN in term_set:
        return 0.0
    return min((len(t) for t in term_set), default=0.0)


def extract_terms(node) -> frozenset:
    """Presearcher term set for one parsed query tree.

    Guarantee (QueryAnalyzer contract): every document that MATCHES the
    query contains at least one extracted term — so indexing the query
    under these terms never loses a match; it only admits false-positive
    candidates that verification removes.
    """
    if isinstance(node, str):
        node = parse_query(node)
    if isinstance(node, TermQ):
        return frozenset((node.term,))
    if isinstance(node, (PhraseQ, SloppyQ, NearQ)):
        # conjunction of its terms: the single best term suffices
        return frozenset((max(node.terms, key=lambda t: (len(t), t)),))
    if isinstance(node, SynonymQ):
        return frozenset(node.terms)  # disjunction: union
    if isinstance(node, TermInSetQ):
        return frozenset(node.terms)
    if isinstance(node, (BoostQ, ConstScoreQ)):
        return extract_terms(node.child)
    if isinstance(node, BoolQ):
        required = tuple(node.must) + tuple(node.filter)
        if required:
            # conjunction: index ONLY the best child's set
            # (QueryTree.conjunction chooses the highest-weighted child)
            best = max((extract_terms(c) for c in required), key=_weight)
            if _weight(best) > 0.0:
                return best
            # every required child is ANYTOKEN-ish: fall through to
            # the disjunction rule over SHOULD if it exists, else ANYTOKEN
        if node.should:
            out: set = set()
            for c in node.should:
                out |= extract_terms(c)
            return frozenset(out)
        return frozenset((ANYTOKEN,))
    # multi-term / match-all / pure-negative: cannot enumerate
    return frozenset((ANYTOKEN,))


# ------------------------------------------------------------ verification


class _BatchIndex:
    """MemoryIndex analog for one Arrow batch of documents.

    One dictionary-encode + one lexicographic (term_code, doc, pos) sort
    turns the batch into term-sliced posting ranges; every per-term lookup
    afterwards is a dict probe + array slice. No per-row Python.
    """

    __slots__ = ("n_docs", "vocab", "starts", "doc_of", "pos_of", "vocab_arr")

    def __init__(self, texts: pd.Series):
        ab = analyze_batch(texts)
        self.n_docs = ab.n_docs
        enc = ab.tok_terms_pa.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        vocab_arr = enc.dictionary.to_numpy(zero_copy_only=False)
        self.vocab_arr = np.asarray(vocab_arr, dtype=object)
        self.vocab = {t: i for i, t in enumerate(self.vocab_arr)}
        doc = ab.tok_doc_idx.astype(np.int64)
        pos = ab.tok_positions.astype(np.int64)
        order = np.lexsort((pos, doc, codes))
        codes, self.doc_of, self.pos_of = codes[order], doc[order], pos[order]
        # starts[c] .. starts[c+1]: posting range of vocab code c
        nv = len(self.vocab_arr)
        self.starts = np.searchsorted(codes, np.arange(nv + 1))

    def postings(self, term: str) -> "tuple[np.ndarray, np.ndarray]":
        c = self.vocab.get(term)
        if c is None:
            return _EMPTY_I8, _EMPTY_I8
        s, e = int(self.starts[c]), int(self.starts[c + 1])
        return self.doc_of[s:e], self.pos_of[s:e]

    def docs_with(self, term: str) -> np.ndarray:
        """Boolean mask over batch docs containing ``term``."""
        d, _ = self.postings(term)
        m = np.zeros(self.n_docs, dtype=bool)
        m[d] = True
        return m

    def expand(self, pred) -> list:
        """Vocabulary-level expansion for multi-term queries: ``pred`` is a
        vectorized predicate over the vocab array (the batch's term dict is
        tiny next to its postings, like MemoryIndex's terms)."""
        keep = pred(self.vocab_arr)
        return [t for t, k in zip(self.vocab_arr, keep) if k]


_EMPTY_I8 = np.zeros(0, dtype=np.int64)
_POS_SHIFT = np.int64(33)


def _phrase_mask(bi: _BatchIndex, terms, offsets) -> np.ndarray:
    """Exact-phrase doc mask: searchsorted chain over (doc<<33)+pos keys —
    the ExactPhraseMatcher contract, all candidate docs at once."""
    d0, p0 = bi.postings(terms[0])
    if not len(d0):
        return np.zeros(bi.n_docs, dtype=bool)
    keys0 = (d0 << _POS_SHIFT) + p0
    ok = np.ones(len(keys0), dtype=bool)
    base = int(offsets[0])
    for t, off in zip(terms[1:], offsets[1:]):
        dk, pk = bi.postings(t)
        if not len(dk):
            return np.zeros(bi.n_docs, dtype=bool)
        want = keys0 + (int(off) - base)
        kk = (dk << _POS_SHIFT) + pk
        j = np.searchsorted(kk, want)
        hit = j < len(kk)
        hit[hit] = kk[j[hit]] == want[hit]
        ok &= hit
    m = np.zeros(bi.n_docs, dtype=bool)
    m[d0[ok]] = True
    return m


def _sloppy_mask(bi: _BatchIndex, terms, offsets, slop) -> np.ndarray:
    """Sloppy-phrase doc mask: conjunction prune, then the reference
    SloppyPhraseMatcher simulation per surviving doc (few by then)."""
    from .search import _sloppy_freq_doc

    cand = np.ones(bi.n_docs, dtype=bool)
    posting = []
    for t, off in zip(terms, offsets):
        d, p = bi.postings(t)
        m = np.zeros(bi.n_docs, dtype=bool)
        m[d] = True
        cand &= m
        # the matcher state machine runs over offset-ADJUSTED positions
        # (PhrasePositions.position = pos - offset), like sloppy_freqs_rpts
        posting.append((d, p - np.int64(off)))
    out = np.zeros(bi.n_docs, dtype=bool)
    if not cand.any():
        return out
    first_of: dict[str, int] = {}
    group_of: list[int] = []
    gid = 0
    for t in terms:
        if t in first_of:
            i = first_of[t]
            if group_of[i] < 0:
                group_of[i] = gid
                gid += 1
            group_of.append(group_of[i])
        else:
            first_of[t] = len(group_of)
            group_of.append(-1)
    for doc in np.nonzero(cand)[0]:
        plists = [p[d == doc] for d, p in posting]
        out[doc] = _sloppy_freq_doc(plists, tuple(offsets), group_of, slop) > 0
    return out


def _near_mask(bi: _BatchIndex, terms, slop) -> np.ndarray:
    """Ordered-near doc mask: per-start searchsorted chain with bounded
    consecutive gaps (NearSpansOrdered), vectorized over all starts."""
    d0, p0 = bi.postings(terms[0])
    if not len(d0):
        return np.zeros(bi.n_docs, dtype=bool)
    cur = (d0 << _POS_SHIFT) + p0
    ok = np.ones(len(cur), dtype=bool)
    for t in terms[1:]:
        dk, pk = bi.postings(t)
        if not len(dk):
            return np.zeros(bi.n_docs, dtype=bool)
        kk = (dk << _POS_SHIFT) + pk
        j = np.searchsorted(kk, cur, side="right")
        hit = j < len(kk)
        nxt = kk[np.minimum(j, len(kk) - 1)]
        hit &= (nxt >> _POS_SHIFT) == (cur >> _POS_SHIFT)
        hit &= (nxt - cur) <= np.int64(slop + 1)
        ok &= hit
        cur = np.where(hit, nxt, cur)
    m = np.zeros(bi.n_docs, dtype=bool)
    m[d0[ok]] = True
    return m


def _match_node(node, bi: _BatchIndex) -> np.ndarray:
    """Boolean match mask over the batch docs for one query tree.

    Match-only semantics (QueryMatch.SIMPLE_MATCHER — Monitor's default
    reports matches, not scores), so FILTER == MUST and boosts are
    identity here.
    """
    if isinstance(node, TermQ):
        return bi.docs_with(node.term)
    if isinstance(node, SynonymQ):
        m = np.zeros(bi.n_docs, dtype=bool)
        for t in node.terms:
            m |= bi.docs_with(t)
        return m
    if isinstance(node, TermInSetQ):
        m = np.zeros(bi.n_docs, dtype=bool)
        for t in node.terms:
            m |= bi.docs_with(t)
        return m
    if isinstance(node, PhraseQ):
        return _phrase_mask(bi, node.terms, node.offsets)
    if isinstance(node, SloppyQ):
        return _sloppy_mask(bi, node.terms, node.offsets, node.slop)
    if isinstance(node, NearQ):
        return _near_mask(bi, node.terms, node.slop)
    if isinstance(node, PrefixQ):
        p = node.prefix
        terms = bi.expand(lambda v: np.char.startswith(v.astype(str), p))
        m = np.zeros(bi.n_docs, dtype=bool)
        for t in terms:
            m |= bi.docs_with(t)
        return m
    if isinstance(node, WildcardQ):
        import re as _re

        rx = _re.compile(
            "".join(
                ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
                for ch in node.pattern
            )
            + r"\Z"
        )
        terms = bi.expand(
            lambda v: np.array([bool(rx.match(t)) for t in v], dtype=bool)
        )
        m = np.zeros(bi.n_docs, dtype=bool)
        for t in terms:
            m |= bi.docs_with(t)
        return m
    if isinstance(node, RegexpQ):
        import re as _re

        rx = _re.compile(node.pattern + r"\Z")
        terms = bi.expand(
            lambda v: np.array([bool(rx.match(t)) for t in v], dtype=bool)
        )
        m = np.zeros(bi.n_docs, dtype=bool)
        for t in terms:
            m |= bi.docs_with(t)
        return m
    if isinstance(node, RangeQ):
        lo, hi = node.lo, node.hi

        def pred(v):
            s = v.astype(str)
            keep = np.ones(len(s), dtype=bool)
            if lo is not None:
                keep &= (s >= lo) if node.include_lo else (s > lo)
            if hi is not None:
                keep &= (s <= hi) if node.include_hi else (s < hi)
            return keep

        m = np.zeros(bi.n_docs, dtype=bool)
        for t in bi.expand(pred):
            m |= bi.docs_with(t)
        return m
    if isinstance(node, MatchAllQ):
        return np.ones(bi.n_docs, dtype=bool)
    if isinstance(node, (BoostQ, ConstScoreQ)):
        return _match_node(node.child, bi)
    if isinstance(node, BoolQ):
        m = np.ones(bi.n_docs, dtype=bool)
        # folded MatchAll MUST clauses (const_add − n_free_opt of them)
        # are required clauses that match every doc: they make SHOULD
        # optional without constraining m
        has_req = bool(node.must or node.filter) or (
            node.const_add - node.n_free_opt > 0
        )
        for c in tuple(node.must) + tuple(node.filter):
            m &= _match_node(c, bi)
        if node.should or node.n_free_opt:
            cnt = np.zeros(bi.n_docs, dtype=np.int64)
            for c in node.should:
                cnt += _match_node(c, bi)
            cnt += int(node.n_free_opt)
            need = max(int(node.msm), 0 if has_req else 1)
            if need:
                m &= cnt >= need
        elif not has_req:
            m &= False  # no positive clause: matches nothing
        for c in node.must_not:
            m &= ~_match_node(c, bi)
        return m
    raise NotImplementedError(
        f"monitor: unsupported query node {type(node).__name__}"
    )


# ------------------------------------------------------------------ public


class Monitor:
    """Registered query set + broadcast presearcher index.

    ``queries``: iterable of ``(query_id, query_string)``. Parsing and
    term extraction happen once at registration (Monitor.register); the
    parsed trees + the term->queries map broadcast to executors.
    """

    def __init__(self, spark: SparkSession, queries) -> None:
        parsed: list[tuple[str, object]] = []
        term_to_q: dict[str, list[int]] = {}
        any_q: list[int] = []
        for qid, qs in queries:
            node = parse_query(qs) if isinstance(qs, str) else qs
            _match_node(node, _EMPTY_INDEX)  # fail fast on unsupported nodes
            i = len(parsed)
            parsed.append((str(qid), node))
            ts = extract_terms(node)
            if ANYTOKEN in ts:
                any_q.append(i)
            else:
                for t in ts:
                    term_to_q.setdefault(t, []).append(i)
        self.n_queries = len(parsed)
        self.n_anytoken = len(any_q)
        self._bc = spark.sparkContext.broadcast((parsed, term_to_q, any_q))

    # ---- presearcher stats (PresearcherMatches analog, for tests/bench)

    def candidate_ids(self, terms) -> list:
        parsed, term_to_q, any_q = self._bc.value
        out = set(any_q)
        for t in set(terms):
            out.update(term_to_q.get(t, ()))
        return sorted(out)

    def match(
        self,
        docs: DataFrame,
        key_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """(doc_id, query_id) pairs for every registered query that matches
        each document. Stateless — works on static AND streaming frames."""
        bc = self._bc

        def kernel(batches):
            parsed, term_to_q, any_q = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                bi = _BatchIndex(pdf[text_col])
                keys = pdf[key_col].to_numpy()
                # candidate selection: batch vocab ∩ presearcher terms.
                # Probing the batch's DISTINCT vocab (tiny) against the
                # broadcast map is the doc-disjunction query of
                # TermFilteredPresearcher.buildQuery, run in one pass for
                # the whole batch.
                cand_q: dict[int, np.ndarray | None] = {}
                for t, qids in term_to_q.items():
                    c = bi.vocab.get(t)
                    if c is None:
                        continue
                    s, e = int(bi.starts[c]), int(bi.starts[c + 1])
                    dmask = np.zeros(bi.n_docs, dtype=bool)
                    dmask[bi.doc_of[s:e]] = True
                    for qi in qids:
                        prev = cand_q.get(qi)
                        cand_q[qi] = dmask if prev is None else (prev | dmask)
                for qi in any_q:
                    cand_q[qi] = None  # None = every doc is a candidate
                out_docs: list[np.ndarray] = []
                out_qids: list[np.ndarray] = []
                for qi, dmask in cand_q.items():
                    qid, node = parsed[qi]
                    m = _match_node(node, bi)
                    if dmask is not None:
                        m &= dmask
                    hit = np.nonzero(m)[0]
                    if len(hit):
                        out_docs.append(keys[hit])
                        out_qids.append(np.full(len(hit), qid, dtype=object))
                if out_docs:
                    yield pd.DataFrame(
                        {
                            "doc_id": np.concatenate(out_docs),
                            "query_id": np.concatenate(out_qids),
                        }
                    )

        return docs.mapInPandas(kernel, schema=MATCH_SCHEMA)


class _EmptyIndex(_BatchIndex):
    """Zero-doc index used to validate query support at register time."""

    def __init__(self):  # noqa: D401 - trivial
        self.n_docs = 0
        self.vocab = {}
        self.vocab_arr = np.zeros(0, dtype=object)
        self.starts = np.zeros(1, dtype=np.int64)
        self.doc_of = _EMPTY_I8
        self.pos_of = _EMPTY_I8


_EMPTY_INDEX = _EmptyIndex()
