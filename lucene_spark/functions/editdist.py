"""Edit distances for fuzzy term expansion.

Lucene's FuzzyQuery defaults to transpositions=true (FuzzyQuery.java:272):
a transposed adjacent pair costs ONE edit. The distance its automata and
tests pin is the *optimal string alignment* (OSA / restricted Damerau)
form — the plain DP with the ``d[i-2][j-2] + cost`` transposition term and
no substring re-editing (the brute-force contract in
``ct/search/TestFuzzyQuery.java:730-793``, "poached from
LuceneLevenshteinDistance"). Note OSA differs from DuckDB's builtin
``damerau_levenshtein`` (unrestricted Damerau) on pairs like ca→abc
(OSA 3, unrestricted 2), so the SQL oracle reproduces OSA with an explicit
recursive DP instead of the builtin.

``osa_distances`` is vectorized across many terms at once: one DP over the
padded character matrix, every cell update a numpy op over all terms.
"""

from __future__ import annotations

import numpy as np

__all__ = ["osa", "osa_distances", "osa_prefix_min"]


def osa(a: str, b: str) -> int:
    """Scalar optimal-string-alignment distance (tests / driver-side)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return max(n, m)
    d = np.zeros((n + 1, m + 1), dtype=np.int64)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1, d[i - 1, j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d[i, j] = min(d[i, j], d[i - 2, j - 2] + cost)
    return int(d[n, m])


def osa_distances(terms, q: str) -> np.ndarray:
    """OSA distance from ``q`` to each of ``terms``, vectorized.

    One (max_len x len(q)) DP where every cell update operates on the whole
    term batch at once; per-term lengths handled by masking. O(L_max *
    len(q)) numpy passes regardless of batch size.
    """
    terms = list(terms)
    N = len(terms)
    if N == 0:
        return np.empty(0, dtype=np.int64)
    m = len(q)
    lens = np.fromiter((len(t) for t in terms), np.int64, N)
    L = int(lens.max()) if N else 0
    if m == 0:
        return lens.copy()
    if L == 0:
        return np.full(N, m, dtype=np.int64)
    prev = _osa_dp(terms, q, lens, L)
    return prev[np.arange(N), lens]


def osa_prefix_min(terms, q: str, d: int) -> np.ndarray:
    """min over prefix lengths L of OSA(q, t[:L]) for each term,
    restricted to |L − len(q)| <= d (a longer or shorter prefix can
    never be within ``d`` edits). This is the FuzzySuggester automaton
    test: an entry completes when SOME prefix of its analyzed form is
    within ``d`` edits of the analyzed key
    (suggest/.../analyzing/FuzzySuggester.java:44-91, with
    transpositions the LevenshteinAutomata transposition alphabet).

    The full-prefix column of the same vectorized DP already holds
    OSA(q, t[:i]) for every i, so this is one masked min over the
    allowed column range — no extra DP passes.
    """
    terms = list(terms)
    N = len(terms)
    if N == 0:
        return np.empty(0, dtype=np.int64)
    m = len(q)
    lens = np.fromiter((len(t) for t in terms), np.int64, N)
    L = int(lens.max()) if N else 0
    if m == 0:
        return np.zeros(N, dtype=np.int64)  # the empty prefix matches
    if L == 0:
        return np.full(N, m, dtype=np.int64)  # only the empty prefix
    prev = _osa_dp(terms, q, lens, L)  # prev[:, i] = OSA(q, t[:i])
    lo, hi = max(0, m - d), min(L, m + d)
    window = prev[:, lo:hi + 1]
    # prefixes past a term's own length are padding — mask them out
    valid = np.arange(lo, hi + 1)[None, :] <= lens[:, None]
    return np.where(valid, window, np.iinfo(np.int64).max).min(axis=1)


def _osa_dp(terms, q: str, lens: np.ndarray, L: int) -> np.ndarray:
    """The shared (N, L+1) final DP row: entry [t, i] = OSA(q, t[:i])."""
    N = len(terms)
    m = len(q)
    # padded char-code matrix (N, L)
    BIG = 1 << 20
    chars = np.zeros((N, L), dtype=np.int32)
    for i, t in enumerate(terms):
        if t:
            chars[i, : len(t)] = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int32)
    qc = np.frombuffer(q.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
    # DP over term-position i (rows), q-position j (cols); prev/pprev are
    # (N, L+1) row vectors of the previous one/two j-columns transposed:
    # here we roll j as the outer loop and i vectorized via the standard
    # left-dependency unwind new[i] = i + prefixmin(base[k] - k).
    idx = np.arange(L + 1, dtype=np.int64)
    prev = np.broadcast_to(idx, (N, L + 1)).copy()  # j = 0 column
    pprev = None
    for j in range(1, m + 1):
        cost = (chars != qc[j - 1]).astype(np.int64)  # (N, L) for i=1..L
        base = np.empty((N, L + 1), dtype=np.int64)
        base[:, 0] = j
        base[:, 1:] = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        if j > 1:
            tmask = np.zeros((N, L), dtype=bool)
            # transposition: t[i-1]==q[j-2] and t[i-2]==q[j-1], i>=2
            tmask[:, 1:] = (chars[:, 1:] == qc[j - 2]) & (chars[:, :-1] == qc[j - 1])
            talt = np.full((N, L), BIG, dtype=np.int64)
            talt[:, 1:] = pprev[:, :-2] + cost[:, 1:]
            base[:, 1:] = np.minimum(base[:, 1:], np.where(tmask, talt, BIG))
        # new[i] = i + min_{k<=i}(base[k] - k)  (left-dependency unwound)
        new = idx + np.minimum.accumulate(base - idx, axis=1)
        pprev, prev = prev, new
    return prev
