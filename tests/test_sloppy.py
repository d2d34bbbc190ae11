"""SloppyPhraseMatcher kernel parity (no Spark).

Pins the greedy unordered-slop traversal semantics
(``core/search/SloppyPhraseMatcher.java:174-206``, the behavioral contract
of ``ct/search/TestSloppyPhraseQuery.java``):
- hand-traced examples from the matcher's own Javadoc;
- the vectorized lock-step machine == the per-doc reference simulation on
  randomized corpora (distinct terms);
- the repeated-term path against hand-checked traces;
- the DuckDB recursive-CTE oracle == the numpy kernel, float32-exact.
"""

import duckdb
import numpy as np
import pytest

from lucene_spark.operators.search import (
    TermPostings,
    _sloppy_freq_doc,
    sloppy_freqs,
    sloppy_freqs_rpts,
)
from lucene_spark.plans.oracle_sql import sloppy_match_sql

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


def _vec_one(term_pos, offsets, slop):
    tps = [_tp([p]) for p in term_pos]
    idxs = [np.array([0]) for _ in term_pos]
    return float(sloppy_freqs(tps, idxs, tuple(offsets), slop)[0])


def _doc_one(term_pos, offsets, slop):
    plists = [np.asarray(p, np.int64) - o for p, o in zip(term_pos, offsets)]
    return float(_sloppy_freq_doc(plists, tuple(offsets), [-1] * len(offsets), slop))


class TestJavadocTraces:
    def test_x_a_b_a_y(self):
        # "a b"~2 on "x a b a y": matches at distance 0 and 2
        want = float(F32(1.0) + F32(1.0) / F32(3.0))
        assert _vec_one([[1, 3], [2]], [0, 1], 2) == want

    def test_order_dependent_greedy(self):
        # doc "a b c b a": "a b c"~4 vs "c b a"~4 score differently
        f_abc = _vec_one([[0, 4], [1, 3], [2]], [0, 1, 2], 4)
        f_cba = _vec_one([[2], [1, 3], [0, 4]], [0, 1, 2], 4)
        assert abs(f_abc - 1.4) < 1e-6
        assert abs(f_cba - 1.2) < 1e-6
        assert f_abc != f_cba

    def test_single_window_minimized(self):
        # "c b"~2 on "a b c b a f g": greedy finds ONE match, minimized to 0
        assert _vec_one([[2], [1, 3]], [0, 1], 2) == 1.0
        assert _vec_one([[6], [5]], [0, 1], 2) == float(F32(1.0) / F32(3.0))

    def test_no_match_outside_slop(self):
        assert _vec_one([[0], [10]], [0, 1], 2) == 0.0


class TestVectorizedVsPerDoc:
    def test_random_parity(self):
        rng = np.random.default_rng(123)
        for _ in range(400):
            n = int(rng.integers(2, 5))
            slop = int(rng.integers(0, 6))
            npos = int(rng.integers(n, 16))
            allpos = sorted(rng.choice(40, npos, replace=False).tolist())
            labels = rng.integers(0, n, npos)
            labels[:n] = np.arange(n)  # every term non-empty
            term_pos = [
                sorted(int(p) for p, l in zip(allpos, labels) if l == i)
                for i in range(n)
            ]
            offsets = [0]
            for _i in range(1, n):
                offsets.append(offsets[-1] + int(rng.integers(1, 3)))
            assert _vec_one(term_pos, offsets, slop) == _doc_one(
                term_pos, offsets, slop
            ), (term_pos, offsets, slop)

    def test_multi_candidate_batch(self):
        # several docs at once through the lock-step machine
        rng = np.random.default_rng(7)
        docs_a, docs_b = [], []
        for _ in range(50):
            docs_a.append(sorted(rng.choice(30, 4, replace=False).tolist()))
            docs_b.append(sorted(rng.choice(30, 3, replace=False).tolist()))
        tps = [_tp(docs_a), _tp(docs_b)]
        idxs = [np.arange(50), np.arange(50)]
        got = sloppy_freqs(tps, idxs, (0, 1), 3)
        for c in range(50):
            assert float(got[c]) == _doc_one([docs_a[c], docs_b[c]], [0, 1], 3), c


class TestRepeats:
    def test_repeated_term_basic(self):
        # "a b a"~2 on "a b a ...": staggered start, one match
        tps = [_tp([[0, 2, 5]]), _tp([[1]]), _tp([[0, 2, 5]])]
        idxs = [np.array([0])] * 3
        f = sloppy_freqs_rpts(tps, idxs, (0, 1, 2), ("a", "b", "a"), 2)
        assert float(f[0]) == 1.0

    def test_repeated_exhaustion_no_match(self):
        # only one 'a' position: the second 'a' PP can never place
        tps = [_tp([[0]]), _tp([[1]]), _tp([[0]])]
        idxs = [np.array([0])] * 3
        f = sloppy_freqs_rpts(tps, idxs, (0, 1, 2), ("a", "b", "a"), 5)
        assert float(f[0]) == 0.0


class TestSqlOracleTwin:
    @pytest.mark.parametrize(
        "terms,offsets,slop",
        [
            (["alpha", "bravo"], [0, 1], 2),
            (["charlie", "delta", "echo"], [0, 1, 2], 3),
            (["bravo", "alpha"], [0, 1], 0),
            (["echo", "golf", "alpha"], [0, 2, 3], 4),
        ],
    )
    def test_sql_matches_kernel(self, terms, offsets, slop):
        rng = np.random.default_rng(42)
        vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]
        docs = [
            " ".join(
                vocab[int(i)]
                for i in rng.integers(0, len(vocab), int(rng.integers(3, 40)))
            )
            for _ in range(200)
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT row_number() OVER () - 1 AS doc_id,"
            " t AS text, 'en' AS lang FROM (SELECT unnest(?) AS t)",
            [docs],
        )
        got = dict(con.execute(sloppy_match_sql(terms, offsets, slop)).fetchall())
        want = {}
        for d, text in enumerate(docs):
            toks = text.split()
            term_pos, ok = [], True
            for t in terms:
                p = [i for i, w in enumerate(toks) if w == t]
                if not p:
                    ok = False
                    break
                term_pos.append(p)
            if not ok:
                continue
            f = _doc_one(term_pos, offsets, slop)
            if f > 0:
                want[d] = f
        assert got == want
