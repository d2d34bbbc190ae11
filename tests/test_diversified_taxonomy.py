"""DiversifiedTopDocsCollector + taxonomy facets
(misc/search/DiversifiedTopDocsCollector.java, facet/taxonomy).

The reference collector streams hits in doc order through a global PQ
with per-key PQs, yet its outcome is ORDER-INDEPENDENT: per-key queues
mirror global membership, and once the global queue fills, its floor is
monotone — so a key member freed by global eviction can never readmit a
weaker same-key doc. These tests pin (a) the engine's declarative
semantics, (b) equality with a faithful Python replay of the streaming
algorithm on the real corpus AND on adversarial orderings built to
probe the eviction-interference corner.
"""

import pytest

import __spark_entry__ as entry
from lucene_spark.operators.search import Searcher

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(spark):
    return Searcher(spark, entry._index_for(spark, SF))


@pytest.fixture(scope="module")
def docs(spark):
    import os

    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


def _streaming_replay(hits, max_per_key, k):
    """Faithful replay of DiversifiedTopDocsCollector.insert
    (java:110-160): hits in DOC-ID order; per-key queues mirror global
    membership; a full key queue rejects non-competitive additions
    outright."""
    # ordering: (score asc, doc desc) min-heap via (score, -doc)
    def less(a, b):  # a less-than b in PQ order (weaker first)
        return a[0] < b[0] or (a[0] == b[0] and a[1] > b[1])

    glob: list = []   # list of (score, doc, key), kept unsorted
    perkey: dict = {}

    def weakest(entries):
        w = entries[0]
        for e in entries[1:]:
            if less(e, w):
                w = e
        return w

    for doc, score, key in sorted(hits):
        add = (score, doc, key)
        q = perkey.setdefault(key, [])
        if len(q) >= max_per_key:
            w = weakest(q)
            if less(add, w) or (add == w):
                continue  # not competitive within the full key group
            # evict the key's weakest from BOTH queues, then insert
            q.remove(w)
            glob.remove(w)
            q.append(add)
            glob.append(add)
            continue
        # locally competitive: global insert-with-overflow
        q.append(add)
        glob.append(add)
        if len(glob) > k:
            w = weakest(glob)
            glob.remove(w)
            kq = perkey[w[2]]
            kq.remove(w)
            if not kq:
                del perkey[w[2]]
    return sorted(glob, key=lambda e: (-e[0], e[1]))


def test_matches_declarative_and_streaming(searcher, docs):
    df = searcher.diversified_topk(
        entry.T_HOT, docs, "lang", max_per_key=2, k=10, key_col="doc_id"
    ).collect()
    got = [(r.gid, r.score, r.dim) for r in df]
    # per-key cap + global ordering
    from collections import Counter

    assert all(v <= 2 for v in Counter(d for _, _, d in got).values())
    assert got == sorted(got, key=lambda t: (-t[1], t[0]))
    # exhaustive scores -> declarative ideal
    full = searcher.search(entry.T_HOT, k=1 << 30, prune=False,
                           with_keys=False)
    lang = {r.doc_id: r.lang for r in docs.select("doc_id", "lang")
            .collect()}
    hits = [(int(g), float(s), lang[int(g)])
            for g, s in zip(full.gid, full.score) if int(g) in lang]
    bykey: dict = {}
    for g, s, d in sorted(hits, key=lambda t: (-t[1], t[0])):
        r = bykey.setdefault(d, [])
        r.append((g, s, d))
    kept = [e for rows in bykey.values() for e in rows[:2]]
    ideal = sorted(kept, key=lambda t: (-t[1], t[0]))[:10]
    assert [(g, d) for g, _, d in got] == [(g, d) for g, _, d in ideal]
    # the streaming reference algorithm agrees on this corpus (no
    # global-eviction interference at these scores)
    stream = _streaming_replay([(g, s, d) for g, s, d in hits], 2, 10)
    assert [(doc, key) for _, doc, key in stream] \
        == [(g, d) for g, _, d in got]


def _declarative(hits, max_per_key, k):
    bykey: dict = {}
    out = []
    for g, s, d in sorted(hits, key=lambda t: (-t[1], t[0])):
        r = bykey.setdefault(d, 0)
        if r < max_per_key:
            bykey[d] = r + 1
            out.append((g, s, d))
    return [(g, d) for g, _, d in out[:k]]


def test_streaming_equals_declarative_randomized():
    """Equivalence of the reference's streaming algorithm and the
    engine's declarative semantics, probed with randomized score/key
    assignments INCLUDING the eviction-interference shape (an early weak
    key member evicted globally before stronger same-key docs arrive):
    once the global floor passes a key's evicted member, no weaker
    same-key doc can re-enter — so order never matters."""
    import random

    rng = random.Random(42)
    for trial in range(300):
        n = rng.randrange(3, 25)
        keys = [rng.choice("ABCD") for _ in range(n)]
        scores = [round(rng.uniform(1, 10), 1) for _ in range(n)]
        hits = [(i + 1, scores[i], keys[i]) for i in range(n)]
        mpk = rng.choice([1, 2, 3])
        k = rng.choice([2, 3, 5, 8])
        stream = _streaming_replay(hits, mpk, k)
        assert [(d, key) for _, d, key in stream] == \
            _declarative(hits, mpk, k), (trial, hits, mpk, k)
    # the canonical interference shape, explicitly: a1 (weak, key A)
    # admitted early, evicted globally by b1/c1; a2 (key A) then beats
    # a1 but not the floor — both algorithms exclude it
    hits = [(1, 5.0, "A"), (2, 9.0, "B"), (3, 8.0, "C"), (4, 6.0, "A")]
    assert [(d, key) for _, d, key in _streaming_replay(hits, 1, 2)] \
        == _declarative(hits, 1, 2) == [(2, "B"), (3, "C")]


def test_taxonomy_rollup_properties(searcher, docs):
    """Parent count == sum of child counts (FastTaxonomyFacetCounts
    walks every ancestor); top-children ordering is (n desc, label
    asc)."""
    full = {
        r.path: r.n
        for r in searcher.taxonomy_facet_counts(
            entry.T_HOT, docs, ["lang", "source"], key_col="doc_id"
        ).collect()
    }
    langs = {p for p in full if "/" not in p}
    for lg in langs:
        kids = {p: n for p, n in full.items()
                if p.startswith(lg + "/")}
        assert sum(kids.values()) == full[lg], lg
    top = searcher.taxonomy_facet_counts(
        entry.T_HOT, docs, ["lang", "source"], key_col="doc_id",
        parent=("en",), top_n=5,
    ).collect()
    rows = [(r.path, r.n) for r in top]
    assert rows == sorted(rows, key=lambda t: (-t[1], t[0]))
    assert len(rows) <= 5 and all(p.startswith("en/") for p, _ in rows)
