"""IntervalQuery kernel parity (queries/intervals).

Pins minimal-interval semantics (``OrderedIntervalsSource.java`` /
``UnorderedIntervalsSource.java``: each doc yields the antichain of minimal
intervals — no emitted interval contains another), the maxgaps filter
(``FilteredIntervalsSource.MaxGaps``: gaps = width − Σ source widths), and
the saturation scoring (``IntervalScorer.ensureFreq`` +
``IntervalScoreFunction.SaturationFunction``):

- hand-traced examples stepped through the reference iterators;
- the vectorized searchsorted kernel == a brute-force enumerate-and-filter
  oracle on randomized corpora;
- end-to-end: pruned top-k == exhaustive, boost/bool composition, and the
  similarity-independence of the saturation score.
"""

import itertools

import numpy as np
import pytest

from lucene_spark.operators.search import TermPostings, interval_freqs
from lucene_spark.plans.query import BoolQ, BoostQ, IntervalQ, TermQ

F32 = np.float32


def _tp(pos_lists):
    gids = np.arange(len(pos_lists), dtype=np.int64)
    freqs = np.array([len(p) for p in pos_lists], dtype=np.int64)
    norms = np.zeros(len(pos_lists), np.uint8)
    flat = (
        np.concatenate([np.asarray(p, np.int64) for p in pos_lists])
        if pos_lists
        else np.empty(0, np.int64)
    )
    starts = np.concatenate(([0], np.cumsum(freqs)))
    return TermPostings(gids, freqs, norms, flat, starts)


def _vec(term_pos_per_doc, ordered, max_gaps=-1):
    """term_pos_per_doc: list over terms of (list over docs of positions).
    Every doc must contain every term (the eval prologue's conjunction
    guarantees this before the kernel runs)."""
    tps = [_tp(doc_lists) for doc_lists in term_pos_per_doc]
    ndocs = len(term_pos_per_doc[0])
    idxs = [np.arange(ndocs, dtype=np.int64) for _ in term_pos_per_doc]
    return interval_freqs(tps, idxs, ordered, max_gaps)


def _brute_minimal(plists, ordered):
    """All minimal intervals of one doc by exhaustive enumeration: every
    one-occurrence-per-term tuple (increasing when ordered) spans a window;
    keep the containment antichain of the distinct windows."""
    cands = set()
    for tup in itertools.product(*[list(map(int, p)) for p in plists]):
        if len(set(tup)) != len(tup) and ordered:
            continue
        if ordered and any(b <= a for a, b in zip(tup, tup[1:])):
            continue
        cands.add((min(tup), max(tup)))
    return sorted(
        w
        for w in cands
        if not any(
            o != w and o[0] >= w[0] and o[1] <= w[1] for o in cands
        )
    )


def _brute_freq(plists, ordered, max_gaps=-1):
    n = len(plists)
    freq = F32(0.0)
    for s, e in _brute_minimal(plists, ordered):
        if max_gaps >= 0 and (e - s + 1 - n) > max_gaps:
            continue
        freq = F32(freq + F32(1.0) / F32(max(e - s + 2 - n, 1)))
    return float(freq)


class TestHandTraces:
    """Examples stepped through OrderedIntervalIterator.nextInterval /
    UnorderedIntervalIterator.nextInterval by hand."""

    def test_ordered_start_maximized_through_intermediates(self):
        # t1=[0,3] t2=[2,4] t3=[10]: the only minimal chain is 3<4<10 —
        # (0,10) is non-minimal because the whole chain can shift right
        f = _vec([[[0, 3]], [[2, 4]], [[10]]], ordered=True)
        assert float(f[0]) == float(F32(1.0) / F32(6.0))  # len 8, n 3

    def test_ordered_two_terms(self):
        # t1=[0,2] t2=[10] -> minimal (2,10) only
        f = _vec([[[0, 2]], [[10]]], ordered=True)
        assert float(f[0]) == float(F32(1.0) / F32(8.0))

    def test_ordered_multiple_minimal(self):
        # t1=[0,5] t2=[1,7] -> (0,1) len 2 -> 1.0, and (5,7) len 3 -> 1/2
        f = _vec([[[0, 5]], [[1, 7]]], ordered=True)
        assert float(f[0]) == float(F32(F32(1.0) + F32(0.5)))

    def test_ordered_needs_order(self):
        f = _vec([[[5]], [[1]]], ordered=True)
        assert float(f[0]) == 0.0

    def test_unordered_antichain(self):
        # t1=[0,3] t2=[1] t3=[2,9]: minimal windows (0,2) and (1,3)
        f = _vec([[[0, 3]], [[1]], [[2, 9]]], ordered=False)
        assert float(f[0]) == 2.0

    def test_unordered_either_order(self):
        f = _vec([[[5]], [[1]]], ordered=False)
        assert float(f[0]) == float(F32(1.0) / F32(4.0))

    def test_maxgaps_filters_after_minimizing(self):
        # minimal windows (0,2)->gaps 0 and (5,9)->gaps 3; maxgaps=1 keeps
        # only the first — gaps = width - n (FilteredIntervalsSource)
        pos = [[[0, 5]], [[2, 9]]]
        assert float(_vec(pos, True, max_gaps=1)[0]) == float(
            F32(1.0) / F32(2.0)
        )
        assert float(_vec(pos, True, max_gaps=-1)[0]) == float(
            F32(F32(1.0) / F32(2.0)) + F32(1.0) / F32(4.0)
        )
        assert float(_vec(pos, True, max_gaps=0)[0]) == 0.0

    def test_multiple_docs_independent(self):
        f = _vec(
            [[[0], [0, 2]], [[1], [10]]],
            ordered=True,
        )
        assert float(f[0]) == 1.0
        assert float(f[1]) == float(F32(1.0) / F32(8.0))


class TestVectorizedVsBrute:
    @pytest.mark.parametrize("ordered", [True, False])
    def test_random_parity(self, ordered):
        rng = np.random.default_rng(20260819)
        for trial in range(300):
            n = int(rng.integers(2, 5))
            max_gaps = int(rng.integers(-1, 4))
            docs = []
            for _ in range(int(rng.integers(1, 5))):
                # positions drawn per term; distinct terms share no
                # position (one token per position in standard analysis)
                pool = rng.choice(40, size=20, replace=False)
                k = 0
                plists = []
                for _ in range(n):
                    cnt = int(rng.integers(1, 4))
                    plists.append(np.sort(pool[k : k + cnt]))
                    k += cnt
                docs.append(plists)
            got = _vec(
                [[d[i] for d in docs] for i in range(n)], ordered, max_gaps
            )
            want = [_brute_freq(d, ordered, max_gaps) for d in docs]
            assert [float(x) for x in got] == want, (trial, docs)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def searcher(self, spark):
        import __spark_entry__ as entry

        from lucene_spark.operators.search import Searcher

        return Searcher(spark, entry._index_for(spark, "/root/testdata/sf0.001"))

    def test_pruned_equals_exhaustive(self, searcher):
        q = IntervalQ(terms=("table", "scan"), ordered=False)
        pr = searcher.search(q, k=10, with_keys=False, prune=True)
        ex = searcher.search(q, k=10, with_keys=False, prune=False)
        assert len(pr) > 0
        assert list(pr.gid) == list(ex.gid)
        assert list(pr.score) == list(ex.score)
        # saturation score is strictly below the weight (the pruning bound)
        assert pr.score.max() < 1.0

    def test_boost_rebinds_weight(self, searcher):
        q = IntervalQ(terms=("table", "scan"), ordered=False)
        base = searcher.search(q, k=10, with_keys=False)
        boosted = searcher.search(BoostQ(q, boost=2.0), k=10, with_keys=False)
        assert list(base.gid) == list(boosted.gid)
        for b, s in zip(boosted.score, base.score):
            assert F32(b) == F32(F32(2.0) * F32(s))

    def test_similarity_independent(self, spark, searcher):
        """IntervalQuery binds its own saturation scorer, never the
        searcher similarity (IntervalQuery.java createWeight)."""
        import __spark_entry__ as entry

        from lucene_spark.functions.similarity import LMDirichletSim
        from lucene_spark.operators.search import Searcher

        q = IntervalQ(terms=("table", "scan"), ordered=True)
        idx = entry._index_for(spark, "/root/testdata/sf0.001")
        lm = Searcher(spark, idx, similarity=LMDirichletSim())
        a = searcher.search(q, k=10, with_keys=False)
        b = lm.search(q, k=10, with_keys=False)
        assert list(a.gid) == list(b.gid)
        assert list(a.score) == list(b.score)

    def test_in_boolean_must(self, searcher):
        q = BoolQ(
            must=(
                TermQ("scan"),
                IntervalQ(terms=("table", "merge"), ordered=True,
                          max_gaps=8),
            )
        )
        pr = searcher.search(q, k=10, with_keys=False, prune=True)
        ex = searcher.search(q, k=10, with_keys=False, prune=False)
        assert list(pr.gid) == list(ex.gid)
        assert list(pr.score) == list(ex.score)
