"""Compositional IntervalsSource parity (queries/intervals/Intervals.java
extended combinators: or/containing/containedBy/overlapping/before/after/
extend/maxwidth/atLeast/...).

Oracle strategy: an independent brute-force per-doc evaluator —
exhaustive combination enumeration + O(n^2) containment antichain, none
of the kernel's searchsorted/prefix-scan machinery — checked against the
vectorized stream algebra on hand traces and randomized corpora, plus
end-to-end Searcher runs (pruned == exhaustive, boost fold, similarity
independence).
"""

import itertools

import numpy as np
import pytest

from lucene_spark.functions import interval_algebra as IA
from lucene_spark.plans import intervals as IV
from lucene_spark.plans.query import BoolQ, BoostQ, IntervalExprQ, TermQ

F32 = np.float32
_S = 33
_MASK = (1 << _S) - 1


# ---------------------------------------------------------------------------
# brute-force reference evaluator (per doc)
# ---------------------------------------------------------------------------

def _ach(ivs):
    """Containment antichain: dedup exact (s, e) keeping min gaps, then
    drop every interval that contains another."""
    best = {}
    for s, e, g in ivs:
        if (s, e) not in best or g < best[(s, e)]:
            best[(s, e)] = g
    out = []
    for (s, e), g in best.items():
        if not any(
            (s2 >= s and e2 <= e and (s2, e2) != (s, e)) for (s2, e2) in best
        ):
            out.append((s, e, g))
    return sorted(out)


def _window(combo):
    s = min(c[0] for c in combo)
    e = max(c[1] for c in combo)
    sumw = sum(c[1] - c[0] + 1 for c in combo)
    return (s, e, (e - s + 1) - sumw)


def brute(node, doc):
    """doc: dict term -> sorted position list. Returns the node's emitted
    interval list [(s, e, gaps), ...] sorted by (s, e)."""
    if isinstance(node, IV.ITerm):
        return [(p, p, 0) for p in doc.get(node.term, [])]
    if isinstance(node, IV.IOrdered):
        subs = [brute(c, doc) for c in node.children]
        if any(not s for s in subs):
            return []
        out = []
        for combo in itertools.product(*subs):
            if all(b[0] > a[1] for a, b in zip(combo, combo[1:])):
                out.append(_window(combo))
        return _ach(out)
    if isinstance(node, IV.IBlock):
        subs = [brute(c, doc) for c in node.children]
        if any(not s for s in subs):
            return []
        out = []
        for combo in itertools.product(*subs):
            if all(b[0] == a[1] + 1 for a, b in zip(combo, combo[1:])):
                s, e, _ = _window(combo)
                out.append((s, e, 0))
        return _ach(out)
    if isinstance(node, IV.IUnordered):
        subs = [brute(c, doc) for c in node.children]
        if any(not s for s in subs):
            return []
        return _ach([_window(c) for c in itertools.product(*subs)])
    if isinstance(node, IV.IAtLeast):
        subs = [brute(c, doc) for c in node.children]
        out = []
        for pick in itertools.combinations(range(len(subs)),
                                           node.min_should_match):
            chosen = [subs[i] for i in pick]
            if any(not s for s in chosen):
                continue
            out.extend(_window(c) for c in itertools.product(*chosen))
        return _ach(out)
    if isinstance(node, IV.IOr):
        out = []
        for c in node.children:
            out.extend(brute(c, doc))
        return _ach(out)
    if isinstance(node, IV.IMaxGaps):
        return [iv for iv in brute(node.child, doc) if iv[2] <= node.max_gaps]
    if isinstance(node, IV.IMaxWidth):
        return [
            iv for iv in brute(node.child, doc)
            if iv[1] - iv[0] + 1 <= node.max_width
        ]
    if isinstance(node, IV.IExtend):
        return [
            (max(0, s - node.before), min(e + node.after, _MASK), g)
            for s, e, g in brute(node.child, doc)
        ]
    if isinstance(node, IV.IOffset):
        ivs = brute(node.child, doc)
        if node.preceding:
            pts = [max(0, s - 1) for s, _, _ in ivs]
        else:
            pts = sorted(min(e + 1, _MASK) for _, e, _ in ivs)
        return [(p, p, 0) for p in pts]
    if isinstance(node, IV.IContaining):
        big, small = brute(node.big, doc), brute(node.small, doc)
        return [
            b for b in big
            if any(s[0] >= b[0] and s[1] <= b[1] for s in small)
        ]
    if isinstance(node, IV.IContainedBy):
        small, big = brute(node.small, doc), brute(node.big, doc)
        return [
            s for s in small
            if any(b[0] <= s[0] and b[1] >= s[1] for b in big)
        ]
    if isinstance(node, IV.INotContaining):
        minu, sub = brute(node.minuend, doc), brute(node.subtrahend, doc)
        return [
            m for m in minu
            if not any(s[0] >= m[0] and s[1] <= m[1] for s in sub)
        ]
    if isinstance(node, IV.INotContainedBy):
        small, big = brute(node.small, doc), brute(node.big, doc)
        return [
            s for s in small
            if not any(b[0] <= s[0] and b[1] >= s[1] for b in big)
        ]
    if isinstance(node, IV.IOverlapping):
        src, ref = brute(node.source, doc), brute(node.reference, doc)
        return [
            a for a in src
            if any(r[0] <= a[1] and r[1] >= a[0] for r in ref)
        ]
    if isinstance(node, IV.INonOverlapping):
        minu, sub = brute(node.minuend, doc), brute(node.subtrahend, doc)
        return [
            m for m in minu
            if not any(r[0] <= m[1] and r[1] >= m[0] for r in sub)
        ]
    raise TypeError(node)


def brute_freq(node, doc):
    me = IV.min_extent(node)
    freq = F32(0.0)
    for s, e, _ in sorted(brute(node, doc), key=lambda iv: (iv[0], iv[1])):
        freq = F32(freq + F32(1.0) / F32(max(e - s + 1 - me + 1, 1)))
    return float(freq)


# ---------------------------------------------------------------------------
# kernel driver over an in-memory corpus
# ---------------------------------------------------------------------------

def _streams(docs, terms):
    """Point streams per term over candidate ids 0..len(docs)-1."""
    out = {}
    e = np.empty(0, np.int64)
    for t in terms:
        keys = []
        for cand, doc in enumerate(docs):
            keys.extend((cand << _S) + p for p in doc.get(t, []))
        if keys:
            k = np.array(sorted(keys), np.int64)
            out[t] = (k, k.copy(), np.zeros(len(k), np.int64))
        else:
            out[t] = (e, e, e)
    return out


def _kernel_sets(node, docs):
    """Per-doc emitted (s, e) multisets from the vectorized algebra."""
    ks, ke, _ = IA.eval_stream(node, _streams(docs, IV.tree_terms(node)))
    per_doc = [[] for _ in docs]
    for a, b in zip(ks, ke):
        per_doc[int(a) >> _S].append((int(a) & _MASK, int(b) & _MASK))
    return [sorted(d) for d in per_doc]


def _kernel_freqs(node, docs):
    ks, ke, _ = IA.eval_stream(node, _streams(docs, IV.tree_terms(node)))
    return IA.stream_freqs(ks, ke, len(docs), IV.min_extent(node))


def _brute_sets(node, docs):
    return [
        sorted((s, e) for s, e, _ in brute(node, d)) for d in docs
    ]


class TestHandTraces:
    def test_unordered_javadoc_example(self):
        # Intervals.java:346-353: "apple wolf apple orange banana" →
        # unordered(apple, banana) returns only "apple orange banana"
        doc = {"apple": [0, 2], "banana": [4]}
        q = IV.unordered("apple", "banana")
        assert _brute_sets(q, [doc]) == [[(2, 4)]]
        assert _kernel_sets(q, [doc]) == [[(2, 4)]]

    def test_or_minimal_antichain(self):
        # or(phrase(a,b), b): the lone b at 1 is inside phrase [0,1] — the
        # narrower interval wins (DisjunctionIntervalsSource minimality)
        doc = {"a": [0, 5], "b": [1, 9]}
        q = IV.or_(IV.phrase("a", "b"), "b")
        # phrase hits [0,1]; b points [1,1], [9,9]: [0,1] contains [1,1]
        assert _kernel_sets(q, [doc]) == [[(1, 1), (9, 9)]]
        assert _brute_sets(q, [doc]) == [[(1, 1), (9, 9)]]

    def test_containing(self):
        # unordered(a, c) windows containing a b occurrence
        doc = {"a": [0, 10], "c": [3, 12], "b": [2, 20]}
        q = IV.containing(IV.unordered("a", "c"), IV.term("b"))
        # unordered windows: [0,3] (a0..c3), [3,10] (c3..a10), [10,12];
        # only [0,3] contains b@2
        assert _kernel_sets(q, [doc]) == [[(0, 3)]]
        assert _brute_sets(q, [doc]) == [[(0, 3)]]

    def test_before_and_position_zero_clamp(self):
        # before(a, b): a occurrences ending before b starts. The
        # OffsetIntervalsSource clamp (max(0, start-1)) admits position 0
        # when the reference itself starts at 0 — reference quirk kept.
        doc = {"a": [0, 3, 7], "b": [5]}
        q = IV.before("a", "b")
        assert _kernel_sets(q, [doc]) == [[(0, 0), (3, 3)]]
        doc0 = {"a": [0, 2], "b": [0]}
        q0 = IV.before("a", "b")
        assert _kernel_sets(q0, [doc0]) == [[(0, 0)]]
        assert _brute_sets(q0, [doc0]) == [[(0, 0)]]

    def test_after(self):
        doc = {"a": [0, 3, 7], "b": [5]}
        q = IV.after("a", "b")
        assert _kernel_sets(q, [doc]) == [[(7, 7)]]
        assert _brute_sets(q, [doc]) == [[(7, 7)]]

    def test_extend_phrase_gap_pattern(self):
        # the Intervals.extend javadoc use case: 'a b [2 arbitrary] c'
        doc = {"a": [0], "b": [1], "c": [4]}
        q = IV.phrase(IV.term("a"), IV.extend(IV.term("b"), 0, 2),
                      IV.term("c"))
        assert _kernel_sets(q, [doc]) == [[(0, 4)]]
        doc2 = {"a": [0], "b": [1], "c": [5]}
        assert _kernel_sets(q, [doc2]) == [[]]

    def test_within_not_within(self):
        doc = {"a": [0, 9], "b": [2]}
        assert _kernel_sets(IV.within("a", 2, IV.term("b")), [doc]) == [
            [(0, 0)]
        ]
        assert _kernel_sets(IV.not_within("a", 2, IV.term("b")), [doc]) == [
            [(9, 9)]
        ]

    def test_at_least(self):
        doc = {"a": [0], "b": [2], "c": [50]}
        q = IV.at_least(2, "a", "b", "c")
        # 2-subsets: {a,b} → [0,2]; {b,c} → [2,50]; {a,c} → [0,50] which
        # contains both and is dropped by the minimizing antichain
        assert _kernel_sets(q, [doc]) == [[(0, 2), (2, 50)]]
        assert _brute_sets(q, [doc]) == [[(0, 2), (2, 50)]]

    def test_unordered_no_overlaps(self):
        # or(ordered(a,b), ordered(b,a)) — Intervals.java:355-357
        doc = {"a": [3], "b": [3]}  # same position: neither order matches
        q = IV.unordered_no_overlaps("a", "b")
        assert _kernel_sets(q, [doc]) == [[]]
        doc2 = {"a": [1], "b": [4]}
        assert _kernel_sets(q, [doc2]) == [[(1, 4)]]

    def test_min_extent_rules(self):
        assert IV.min_extent(IV.term("a")) == 1
        assert IV.min_extent(IV.unordered("a", IV.phrase("b", "c"))) == 3
        assert IV.min_extent(IV.or_("a", IV.phrase("b", "c"))) == 1
        assert IV.min_extent(IV.extend(IV.term("a"), 2, 3)) == 6
        assert IV.min_extent(IV.containing(IV.unordered("a", "b"),
                                           IV.term("c"))) == 2
        assert IV.min_extent(IV.contained_by(IV.term("c"),
                                             IV.unordered("a", "b"))) == 1
        assert IV.min_extent(
            IV.at_least(2, "a", IV.phrase("b", "c"),
                        IV.unordered("d", "e", "f"))
        ) == 3  # two smallest child extents: 1 + 2

    def test_factory_validation(self):
        with pytest.raises(ValueError):
            IV.at_least(4, "a", "b")
        with pytest.raises(ValueError):
            IV.extend(IV.term("a"), -1, 0)
        with pytest.raises(ValueError):
            IV.ordered("a")
        assert IV.at_least(2, "a", "b") == IV.unordered("a", "b")
        assert IV.at_least(1, "a", "b") == IV.or_("a", "b")


def _rand_tree(rng, terms, depth):
    """Random interval tree; leaves draw from ``terms`` (distinct across
    the whole tree so duplicate-source edge semantics stay out of scope,
    as they do for the flat IntervalQ)."""
    if depth == 0 or len(terms) < 2:
        t = terms.pop()
        return IV.ITerm(t)
    kind = rng.choice([
        "ordered", "unordered", "block", "or", "atleast", "maxgaps",
        "maxwidth", "extend", "containing", "contained_by",
        "not_containing", "not_contained_by", "overlapping",
        "non_overlapping", "before", "after", "within", "not_within",
    ])
    if kind in ("ordered", "unordered", "block", "or", "atleast"):
        n = min(int(rng.integers(2, 4)), len(terms))
        if n < 2:
            return IV.ITerm(terms.pop())
        kids = tuple(_rand_tree(rng, terms, depth - 1) for _ in range(n))
        if kind == "ordered":
            return IV.IOrdered(kids)
        if kind == "unordered":
            return IV.IUnordered(kids)
        if kind == "block":
            return IV.IBlock(kids)
        if kind == "or":
            return IV.IOr(kids)
        m = int(rng.integers(2, n + 1))
        return IV.at_least(m, *kids)
    if kind in ("maxgaps", "maxwidth"):
        # gaps are only unambiguous for combinators over plain terms
        # (sub-interval choices with equal windows but different widths
        # are iterator-order-dependent in the reference)
        n = min(int(rng.integers(2, 4)), len(terms))
        if n < 2:
            return IV.ITerm(terms.pop())
        kids = tuple(IV.ITerm(terms.pop()) for _ in range(n))
        comb = IV.IOrdered(kids) if rng.random() < 0.5 else IV.IUnordered(kids)
        if kind == "maxgaps":
            return IV.IMaxGaps(comb, int(rng.integers(0, 4)))
        return IV.IMaxWidth(comb, int(rng.integers(2, 7)))
    if kind == "extend":
        return IV.IExtend(_rand_tree(rng, terms, depth - 1),
                          int(rng.integers(0, 3)), int(rng.integers(0, 3)))
    a = _rand_tree(rng, terms, depth - 1)
    b = _rand_tree(rng, terms, depth - 1)
    if kind == "containing":
        return IV.IContaining(a, b)
    if kind == "contained_by":
        return IV.IContainedBy(a, b)
    if kind == "not_containing":
        return IV.INotContaining(a, b)
    if kind == "not_contained_by":
        return IV.INotContainedBy(a, b)
    if kind == "overlapping":
        return IV.IOverlapping(a, b)
    if kind == "non_overlapping":
        return IV.INonOverlapping(a, b)
    if kind == "before":
        return IV.before(a, b)
    if kind == "after":
        return IV.after(a, b)
    if kind == "within":
        return IV.within(a, int(rng.integers(1, 4)), b)
    return IV.not_within(a, int(rng.integers(1, 4)), b)


class TestRandomizedParity:
    def test_kernel_matches_brute(self):
        rng = np.random.default_rng(20260820)
        vocab = list("abcdefgh")
        for trial in range(120):
            docs = []
            for _ in range(8):
                length = int(rng.integers(6, 22))
                toks = rng.choice(vocab, size=length)
                doc = {}
                for p, t in enumerate(toks):
                    doc.setdefault(str(t), []).append(p)
                docs.append(doc)
            tree = _rand_tree(rng, list(rng.permutation(vocab)), depth=2)
            if isinstance(tree, IV.ITerm):
                continue
            got = _kernel_sets(tree, docs)
            want = [
                sorted((s, e) for s, e, _ in brute(tree, d)) for d in docs
            ]
            assert got == want, (trial, tree, docs)
            kf = _kernel_freqs(tree, docs)
            bf = [brute_freq(tree, d) for d in docs]
            assert [float(x) for x in kf] == bf, (trial, tree)

    def test_maxgaps_over_general_children_matches_brute(self):
        # gaps on ordered/unordered of PLAIN terms (unambiguous widths)
        rng = np.random.default_rng(7)
        vocab = list("abcde")
        for trial in range(60):
            docs = []
            for _ in range(6):
                toks = rng.choice(vocab, size=int(rng.integers(8, 20)))
                doc = {}
                for p, t in enumerate(toks):
                    doc.setdefault(str(t), []).append(p)
                docs.append(doc)
            terms = list(rng.permutation(vocab))[:3]
            comb = (IV.IOrdered if trial % 2 else IV.IUnordered)(
                tuple(IV.ITerm(t) for t in terms)
            )
            tree = IV.IMaxGaps(comb, int(rng.integers(0, 3)))
            assert _kernel_sets(tree, docs) == [
                sorted((s, e) for s, e, _ in brute(tree, d)) for d in docs
            ], (trial, tree)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def searcher(self, spark):
        import __spark_entry__ as entry

        from lucene_spark.operators.search import Searcher

        return Searcher(spark, entry._index_for(spark, "/root/testdata/sf0.001"))

    def test_pruned_equals_exhaustive(self, searcher):
        q = IntervalExprQ(
            IV.containing(IV.unordered("table", "scan"),
                          IV.or_("data", "query", "merge"))
        )
        pr = searcher.search(q, k=10, with_keys=False, prune=True)
        ex = searcher.search(q, k=10, with_keys=False, prune=False)
        assert list(pr.gid) == list(ex.gid)
        assert list(pr.score) == list(ex.score)
        assert pr.score.max() < 1.0  # saturation < weight

    def test_or_tree_matches_flat_union_semantics(self, searcher):
        q = IntervalExprQ(IV.or_(IV.phrase("table", "scan"), "merge"))
        r = searcher.search(q, k=10, with_keys=False)
        assert len(r) > 0

    def test_boost_rebinds_weight(self, searcher):
        q = IntervalExprQ(IV.before("table", "scan"))
        base = searcher.search(q, k=10, with_keys=False)
        if len(base) == 0:
            pytest.skip("no before-matches at sf0.001")
        boosted = searcher.search(BoostQ(q, boost=2.0), k=10,
                                  with_keys=False)
        assert list(base.gid) == list(boosted.gid)
        for b, s in zip(boosted.score, base.score):
            assert F32(b) == F32(F32(2.0) * F32(s))

    def test_similarity_independent(self, spark, searcher):
        import __spark_entry__ as entry

        from lucene_spark.functions.similarity import LMDirichletSim
        from lucene_spark.operators.search import Searcher

        q = IntervalExprQ(IV.maxwidth(6, IV.unordered("table", "scan")))
        idx = entry._index_for(spark, "/root/testdata/sf0.001")
        lm = Searcher(spark, idx, similarity=LMDirichletSim())
        a = searcher.search(q, k=10, with_keys=False)
        b = lm.search(q, k=10, with_keys=False)
        assert list(a.gid) == list(b.gid)
        assert list(a.score) == list(b.score)

    def test_prefix_source_rewrites_to_disjunction(self, searcher):
        """Intervals.prefix: dictionary expansion → IOr of terms
        (MultiTermIntervalsSource is a disjunction over the TermsEnum)."""
        q = IntervalExprQ(IV.unordered(IV.term("table"), IV.prefix("sca")))
        r = searcher.rewrite(q)
        assert isinstance(r, IntervalExprQ)
        leaves = IV.tree_terms(r.root)
        assert "table" in leaves
        assert all(t == "table" or t.startswith("sca") for t in leaves)
        hits = searcher.search(r, k=10, with_keys=False)
        assert len(hits) > 0
        # search() rewrites internally too: same result from the raw node
        direct = searcher.search(q, k=10, with_keys=False)
        assert list(direct.gid) == list(hits.gid)
        assert list(direct.score) == list(hits.score)

    def test_prefix_expansion_limit(self, searcher):
        with pytest.raises(ValueError, match="too many terms"):
            searcher.rewrite(
                IntervalExprQ(IV.unordered(
                    IV.term("table"), IV.prefix("s", max_expansions=3)))
            )

    def test_wildcard_no_match_is_empty(self, searcher):
        q = IntervalExprQ(IV.or_(IV.term("table"),
                                 IV.wildcard("zzqx*zz")))
        r = searcher.rewrite(q)
        assert isinstance(r, IntervalExprQ)
        assert any(isinstance(c, IV.INoMatch)
                   for c in r.root.children)
        # or(term, NoMatch) degrades to the plain term's match set
        hits = searcher.search(r, k=10, with_keys=False)
        assert len(hits) > 0
        # an empty multi-term expansion keeps minExtent 1 (the reference
        # keeps the MultiTermIntervalsSource node), so the disjunction's
        # minExtent is unchanged
        assert IV.min_extent(r.root) == 1

    def test_unresolved_multiterm_rejected_at_planning(self, searcher):
        q = IntervalExprQ(IV.unordered(IV.term("table"), IV.prefix("sca")))
        with pytest.raises(TypeError, match="rewritten"):
            IV.tree_terms(q.root)

    def test_in_boolean_must(self, searcher):
        q = BoolQ(
            must=(
                TermQ("scan"),
                IntervalExprQ(IV.not_containing(
                    IV.unordered("table", "merge"), IV.term("the"))),
            )
        )
        pr = searcher.search(q, k=10, with_keys=False, prune=True)
        ex = searcher.search(q, k=10, with_keys=False, prune=False)
        assert list(pr.gid) == list(ex.gid)
        assert list(pr.score) == list(ex.score)


class TestMultiTermSources:
    """IPrefix/IWildcard leaves (MultiTermIntervalsSource.java:63-77):
    the Searcher rewrite expands them against the dictionary into an
    or-source (zero matches -> INoMatch, one -> the term, else IOr),
    throwing past max_expansions."""

    @pytest.fixture(scope="class")
    def searcher(self, spark):
        import __spark_entry__ as entry

        from lucene_spark.operators.search import Searcher

        return Searcher(spark, entry._index_for(spark, "/root/testdata/sf0.001"))

    def _s_terms(self, searcher):
        from lucene_spark.plans.query import PrefixQ

        return sorted(searcher.expand_terms(PrefixQ("s")))

    def test_prefix_equals_explicit_or(self, searcher):
        terms = self._s_terms(searcher)
        assert len(terms) >= 2, terms
        a = searcher.search(
            IntervalExprQ(IV.ordered(IV.prefix("s"), "table")),
            k=20, with_keys=False,
        )
        b = searcher.search(
            IntervalExprQ(IV.ordered(IV.or_(*terms), "table")),
            k=20, with_keys=False,
        )
        assert a.values.tolist() == b.values.tolist() and len(a)

    def test_wildcard_equals_prefix(self, searcher):
        a = searcher.search(IntervalExprQ(IV.wildcard("s*")), k=20,
                            with_keys=False)
        b = searcher.search(IntervalExprQ(IV.prefix("s")), k=20,
                            with_keys=False)
        assert a.values.tolist() == b.values.tolist() and len(a)

    def test_single_expansion_collapses_to_term(self, searcher):
        a = searcher.search(IntervalExprQ(IV.prefix("tab")), k=10,
                            with_keys=False)
        b = searcher.search(IntervalExprQ(IV.term("table")), k=10,
                            with_keys=False)
        assert a.values.tolist() == b.values.tolist() and len(a)

    def test_no_match_source(self, searcher):
        r = searcher.search(
            IntervalExprQ(IV.ordered(IV.prefix("zzz"), "table")),
            k=5, with_keys=False,
        )
        assert len(r) == 0

    def test_max_expansions_throws(self, searcher):
        with pytest.raises(Exception, match="[Ee]xpansions|expand"):
            searcher.search(
                IntervalExprQ(IV.prefix("s", max_expansions=1)),
                k=5, with_keys=False,
            )
