"""Competitive (freq, norm) impact frontiers for block-max scoring.

Mirrors the reference's ``core/codecs/CompetitiveImpactAccumulator.java``
(add:71-80, getCompetitiveFreqNormPairs:97-118): norms are unsigned bytes
0..255; the frontier keeps, in increasing norm order, each norm's max freq
when it strictly exceeds the max freq of all lower norms. BM25 scores are
non-decreasing in freq and non-increasing in norm (given the same freq), so
the max block score is attained on this Pareto frontier.

Serialization (for the postings table) is two parallel int arrays
(freqs, norms) — per-block frontiers are tiny (usually 1-10 entries).
"""

from __future__ import annotations

import numpy as np

__all__ = ["competitive_impacts", "competitive_impacts_grouped"]


def competitive_impacts_grouped(
    block_ids: np.ndarray, freqs: np.ndarray, norms: np.ndarray, n_blocks: int
) -> tuple[list[list[int]], list[list[int]]]:
    """Pareto frontiers for MANY blocks at once (vectorized twin of
    ``competitive_impacts`` — identical output per block).

    block_ids assigns each (freq, norm) pair to a block in [0, n_blocks).
    Returns per-block (frontier_freqs, frontier_norms) lists.
    """
    block_ids = np.asarray(block_ids, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64) & 0xFF
    max_freqs = np.zeros(n_blocks * 256, dtype=np.int64)
    np.maximum.at(max_freqs, block_ids * 256 + norms, freqs)
    mf = max_freqs.reshape(n_blocks, 256)
    running = np.maximum.accumulate(mf, axis=1)
    prev = np.concatenate((np.zeros((n_blocks, 1), dtype=np.int64), running[:, :-1]), axis=1)
    keep = mf > prev
    rows, cols = np.nonzero(keep)
    kept_freqs = mf[rows, cols]
    splits = np.searchsorted(rows, np.arange(1, n_blocks))
    out_f = [a.tolist() for a in np.split(kept_freqs, splits)]
    out_n = [a.tolist() for a in np.split(cols, splits)]
    return out_f, out_n


def competitive_impacts(freqs: np.ndarray, norms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pareto frontier of (freq, norm) pairs for one block.

    freqs: int array, norms: uint8-valued int array (same length).
    Returns (frontier_freqs, frontier_norms), ordered by increasing freq and
    increasing norm — the same order getCompetitiveFreqNormPairs yields.
    """
    freqs = np.asarray(freqs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    # max freq per norm value (256 slots, like maxFreqs[])
    max_freqs = np.zeros(256, dtype=np.int64)
    np.maximum.at(max_freqs, norms & 0xFF, freqs)
    # keep norm i iff max_freqs[i] > max over all lower norms
    running = np.maximum.accumulate(max_freqs)
    prev = np.concatenate(([0], running[:-1]))
    keep = max_freqs > prev
    out_norms = np.nonzero(keep)[0].astype(np.int64)
    return max_freqs[out_norms], out_norms
