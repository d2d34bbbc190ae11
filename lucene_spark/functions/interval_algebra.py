"""Vectorized evaluation of compositional interval trees.

Every node of an :mod:`lucene_spark.plans.intervals` tree is evaluated as
a transform over flat NumPy **streams** — no per-document Python. A stream
is a triple ``(ks, ke, g)`` of int64 arrays:

* ``ks`` / ``ke``: composite ``(candidate << 33) + position`` keys of each
  interval's start / end (the same keying as the flat positional kernels
  in ``operators/search.py``); the stream is globally sorted by ``ks``,
  which is the reference's iteration contract (``IntervalIterator``
  documents intervals returned in increasing start order);
* ``g``: the interval's ``gaps()`` value (``IntervalIterator.gaps()``),
  carried per interval because filters and ``extend`` DELEGATE gaps to the
  wrapped side (``FilteringIntervalIterator.java:53-55``,
  ``ExtendedIntervalIterator.java:82-84``) rather than recomputing.

Minimality: the combinators (ordered/unordered/or/atLeast) emit minimal
antichains exactly like the reference's minimizing iterators. Their
children are first REDUCED to minimal antichains — semantics-preserving:
any chain/window through a non-minimal child interval C ⊇ C' is contained
by the one through C', so the emitted antichain is unchanged. The filter
family deliberately does NOT assume antichain inputs (``extend`` output
isn't one): existence tests use prefix-max / suffix-min passes that are
correct for any start-sorted stream.

Freq/scoring (``IntervalScorer.java:72``): freq is the float32 running
sum of ``1 / max(length - minExtent + 1, 1)`` over the top-level stream
in emission order, where minExtent is the top-level source's
``minExtent()`` — computed by :func:`lucene_spark.plans.intervals.min_extent`.
"""

from __future__ import annotations

import numpy as np

from ..plans.intervals import (
    IAtLeast,
    IBlock,
    IContainedBy,
    IContaining,
    IExtend,
    IMaxGaps,
    IMaxWidth,
    INoMatch,
    INonOverlapping,
    INotContainedBy,
    INotContaining,
    IOffset,
    IOr,
    IOrdered,
    IOverlapping,
    ITerm,
    IUnordered,
)

_S = 33  # == operators.search._POS_SHIFT
_MASK = (1 << _S) - 1
_HI = ~np.int64(_MASK)
_INF = np.iinfo(np.int64).max

_EMPTY = np.empty(0, np.int64)


def _empty_stream():
    return _EMPTY, _EMPTY, _EMPTY


def _width(ks: np.ndarray, ke: np.ndarray) -> np.ndarray:
    # same candidate bits cancel: width in positions
    return ke - ks + 1


def _antichain(ks, ke, g):
    """Minimal antichain of any stream: drop every interval that contains
    another (the reference iterators' minimizing loops). Exact (ks, ke)
    duplicates collapse to one entry keeping the smallest gaps value
    (which duplicate a DisjunctionIntervalIterator emits is
    queue-order-dependent in the reference; smallest-gaps is our
    deterministic pick). Output is sorted by start AND by end."""
    n = len(ks)
    if n <= 1:
        return ks, ke, g
    order = np.lexsort((-g, ks, ke))  # end asc, start asc, gaps desc
    ks2, ke2, g2 = ks[order], ke[order], g[order]
    # per distinct end keep the LAST entry: max start (the contained
    # interval), and among (start, end) duplicates the min gaps
    last = np.empty(n, dtype=bool)
    last[:-1] = ke2[1:] != ke2[:-1]
    last[-1] = True
    ks2, ke2, g2 = ks2[last], ke2[last], g2[last]
    # an interval contains a prior (smaller-end) one iff its start is not
    # strictly beyond every kept start so far; dropped entries never
    # advance the running max, so cummax over all == cummax over kept
    cm = np.maximum.accumulate(ks2)
    keep = np.empty(len(ks2), dtype=bool)
    keep[0] = True
    keep[1:] = ks2[1:] > cm[:-1]
    return ks2[keep], ke2[keep], g2[keep]


def _keep_last_per_end(starts, ends, g):
    """Minimization for monotone emitters (ordered/unordered/block chains
    enumerate candidates in ascending start with non-decreasing ends):
    the last start of each distinct-end run is the minimal antichain."""
    n = len(starts)
    if n <= 1:
        return starts, ends, g
    keep = np.empty(n, dtype=bool)
    keep[:-1] = ends[1:] != ends[:-1]
    keep[-1] = True
    return starts[keep], ends[keep], g[keep]


def _pick_at_or_after(ks_c, ke_c, targets):
    """Per target key, the child's first interval with start >= target
    (in an antichain: the one with minimal end). Returns (start, end,
    valid) — valid requires same candidate."""
    j = np.searchsorted(ks_c, targets, side="left")
    jc = np.minimum(j, len(ks_c) - 1)
    s, e = ks_c[jc], ke_c[jc]
    ok = (j < len(ks_c)) & ((s >> _S) == (targets >> _S))
    return s, e, ok


def _eval_ordered(children):
    """OrderedIntervalsSource: greedy chain per first-child interval (each
    next child takes its first interval starting strictly after the
    previous child's end — minimal end in an antichain), then the
    last-start-per-distinct-end minimization."""
    ks0, ke0, _ = _antichain(*children[0])
    if not len(ks0):
        return _empty_stream()
    cur = ke0
    valid = np.ones(len(ks0), dtype=bool)
    sumw = _width(ks0, ke0)
    for ch in children[1:]:
        ksi, kei, _ = _antichain(*ch)
        if not len(ksi):
            return _empty_stream()
        j = np.searchsorted(ksi, cur, side="right")
        jc = np.minimum(j, len(ksi) - 1)
        ok = (j < len(ksi)) & ((ksi[jc] >> _S) == (ks0 >> _S))
        valid &= ok
        cur = np.where(ok, kei[jc], cur)
        sumw = sumw + np.where(ok, _width(ksi[jc], kei[jc]), 0)
    s, e, w = ks0[valid], cur[valid], sumw[valid]
    if not len(s):
        return _empty_stream()
    g = _width(s, e) - w  # OrderedIntervalIterator slop computation
    return _keep_last_per_end(s, e, g)


def _eval_block(children):
    """BlockIntervalsSource: like ordered but each child must start
    exactly one past the previous end; gaps are 0 by construction."""
    ks0, ke0, _ = _antichain(*children[0])
    if not len(ks0):
        return _empty_stream()
    cur = ke0
    valid = np.ones(len(ks0), dtype=bool)
    for ch in children[1:]:
        ksi, kei, _ = _antichain(*ch)
        if not len(ksi):
            return _empty_stream()
        tgt = cur + 1
        j = np.searchsorted(ksi, tgt, side="left")
        jc = np.minimum(j, len(ksi) - 1)
        ok = (j < len(ksi)) & (ksi[jc] == tgt)
        valid &= ok
        cur = np.where(ok, kei[jc], cur)
    s, e = ks0[valid], cur[valid]
    if not len(s):
        return _empty_stream()
    return _keep_last_per_end(s, e, np.zeros(len(s), np.int64))


def _eval_unordered(children):
    """UnorderedIntervalsSource: candidate window starts are every child
    interval start; each child contributes its minimal-end interval
    starting at-or-after the window start; window end = max contribution.
    Start-maximization over non-decreasing ends yields the antichain —
    reproduces the javadoc example ('apple wolf apple orange banana' →
    only 'apple orange banana' for unordered(apple, banana))."""
    chs = [_antichain(*c) for c in children]
    if any(not len(c[0]) for c in chs):
        return _empty_stream()
    starts = np.unique(np.concatenate([c[0] for c in chs]))
    valid = np.ones(len(starts), dtype=bool)
    ends = np.full(len(starts), -1, dtype=np.int64)
    sumw = np.zeros(len(starts), dtype=np.int64)
    for ksi, kei, _ in chs:
        s, e, ok = _pick_at_or_after(ksi, kei, starts)
        valid &= ok
        ends = np.maximum(ends, np.where(ok, e, -1))
        sumw = sumw + np.where(ok, _width(s, e), 0)
    s, e, w = starts[valid], ends[valid], sumw[valid]
    if not len(s):
        return _empty_stream()
    g = _width(s, e) - w  # may be negative when sub-intervals overlap
    return _keep_last_per_end(s, e, g)


def _eval_at_least(children, msm: int):
    """MinimumShouldMatchIntervalsSource: windows spanning intervals from
    >= minShouldMatch sources — per candidate start, the msm children
    with the smallest at-or-after ends; window = [min chosen start, the
    msm-th smallest end]; gaps = width − Σ chosen widths."""
    chs = [_antichain(*c) for c in children]
    nonempty = [c for c in chs if len(c[0])]
    if len(nonempty) < msm:
        return _empty_stream()
    cand = np.unique(np.concatenate([c[0] for c in nonempty]))
    n = len(cand)
    k = len(chs)
    smat = np.full((k, n), _INF, dtype=np.int64)
    emat = np.full((k, n), _INF, dtype=np.int64)
    for i, (ksi, kei, _) in enumerate(chs):
        if not len(ksi):
            continue
        s, e, ok = _pick_at_or_after(ksi, kei, cand)
        smat[i] = np.where(ok, s, _INF)
        emat[i] = np.where(ok, e, _INF)
    order = np.argsort(emat, axis=0, kind="stable")[:msm]  # msm best ends
    cols = np.arange(n)
    ends = emat[order[msm - 1], cols]
    valid = ends < _INF  # msm-th end exists => >= msm children matched
    chosen_s = smat[order, cols]
    chosen_e = emat[order, cols]
    starts = chosen_s.min(axis=0)
    sumw = np.where(chosen_e < _INF, chosen_e - chosen_s + 1, 0).sum(axis=0)
    s, e, w = starts[valid], ends[valid], sumw[valid]
    if not len(s):
        return _empty_stream()
    g = _width(s, e) - w
    # emitted starts are not monotone in the candidate order (the min
    # chosen start can fall back) — full antichain reduction, not the
    # run-length shortcut
    return _antichain(s, e, g)


def _eval_or(children):
    """DisjunctionIntervalsSource: minimal antichain of the union; each
    interval keeps its child's gaps."""
    parts = [c for c in children if len(c[0])]
    if not parts:
        return _empty_stream()
    ks = np.concatenate([c[0] for c in parts])
    ke = np.concatenate([c[1] for c in parts])
    g = np.concatenate([c[2] for c in parts])
    return _antichain(ks, ke, g)


def _eval_extend(stream, before: int, after: int):
    """ExtendedIntervalsSource: [max(0, s − before), e + after], gaps
    delegated to the child. The position-space clamp keeps candidate bits
    intact; order is preserved (the transform is monotone per candidate),
    but the result may not be an antichain — downstream consumers don't
    assume one."""
    ks, ke, g = stream
    if not len(ks):
        return stream
    ks2 = (ks & _HI) | np.maximum((ks & _MASK) - before, 0)
    ke2 = (ke & _HI) | np.minimum((ke & _MASK) + after, _MASK)
    return ks2, ke2, g


def _eval_offset(stream, preceding: bool):
    """OffsetIntervalsSource: the point just before each interval
    (``max(0, start − 1)`` — the clamp means a reference interval at
    position 0 yields point 0, the quirk before() inherits) or just after
    (``end + 1``). width 1, gaps 0."""
    ks, ke, _ = stream
    if not len(ks):
        return _empty_stream()
    if preceding:
        p = (ks & _HI) | np.maximum((ks & _MASK) - 1, 0)
    else:
        p = (ke & _HI) | np.minimum((ke & _MASK) + 1, _MASK)
        p = np.sort(p, kind="stable")  # ends of a general stream are unsorted
    return p, p.copy(), np.zeros(len(p), np.int64)


def _exists_containing(big, small):
    """Mask over big's intervals: contains >= 1 small interval. Works on
    any start-sorted streams via a suffix-min of small ends."""
    ks_b, ke_b, _ = big
    ks_s, ke_s, _ = small
    if not len(ks_s) or not len(ks_b):
        return np.zeros(len(ks_b), dtype=bool)
    sm = np.minimum.accumulate(ke_s[::-1])[::-1]
    j = np.searchsorted(ks_s, ks_b, side="left")
    jc = np.minimum(j, len(ks_s) - 1)
    # cross-candidate keys can't false-positive: a later candidate's end
    # key always exceeds this candidate's, an earlier one is excluded by
    # the start search
    return (j < len(ks_s)) & (sm[jc] <= ke_b)


def _exists_contained_by(small, big):
    """Mask over small's intervals: lies within >= 1 big interval
    (prefix-max of big ends among starts <= small.start)."""
    ks_s, ke_s, _ = small
    ks_b, ke_b, _ = big
    if not len(ks_b) or not len(ks_s):
        return np.zeros(len(ks_s), dtype=bool)
    pm = np.maximum.accumulate(ke_b)
    j = np.searchsorted(ks_b, ks_s, side="right") - 1
    return (j >= 0) & (pm[np.maximum(j, 0)] >= ke_s)


def _exists_overlapping(src, ref):
    """Mask over src's intervals: overlaps >= 1 reference interval
    (ref.start <= src.end and ref.end >= src.start)."""
    ks_a, ke_a, _ = src
    ks_r, ke_r, _ = ref
    if not len(ks_r) or not len(ks_a):
        return np.zeros(len(ks_a), dtype=bool)
    pm = np.maximum.accumulate(ke_r)
    j = np.searchsorted(ks_r, ke_a, side="right") - 1
    return (j >= 0) & (pm[np.maximum(j, 0)] >= ks_a)


def _filter(stream, mask):
    ks, ke, g = stream
    return ks[mask], ke[mask], g[mask]


def eval_stream(node, term_streams: dict):
    """Evaluate an interval tree bottom-up over flat streams.

    ``term_streams`` maps term -> point-interval stream over the shared
    candidate keying (missing terms must map to empty streams)."""
    if isinstance(node, ITerm):
        return term_streams[node.term]
    if isinstance(node, INoMatch):
        return _empty_stream()
    if isinstance(node, IOrdered):
        return _eval_ordered([eval_stream(c, term_streams) for c in node.children])
    if isinstance(node, IBlock):
        return _eval_block([eval_stream(c, term_streams) for c in node.children])
    if isinstance(node, IUnordered):
        return _eval_unordered([eval_stream(c, term_streams) for c in node.children])
    if isinstance(node, IAtLeast):
        return _eval_at_least(
            [eval_stream(c, term_streams) for c in node.children],
            node.min_should_match,
        )
    if isinstance(node, IOr):
        return _eval_or([eval_stream(c, term_streams) for c in node.children])
    if isinstance(node, IMaxGaps):
        ks, ke, g = eval_stream(node.child, term_streams)
        return _filter((ks, ke, g), g <= node.max_gaps)
    if isinstance(node, IMaxWidth):
        ks, ke, g = eval_stream(node.child, term_streams)
        return _filter((ks, ke, g), _width(ks, ke) <= node.max_width)
    if isinstance(node, IExtend):
        return _eval_extend(
            eval_stream(node.child, term_streams), node.before, node.after
        )
    if isinstance(node, IOffset):
        return _eval_offset(eval_stream(node.child, term_streams), node.preceding)
    if isinstance(node, IContaining):
        big = eval_stream(node.big, term_streams)
        small = eval_stream(node.small, term_streams)
        return _filter(big, _exists_containing(big, small))
    if isinstance(node, IContainedBy):
        small = eval_stream(node.small, term_streams)
        big = eval_stream(node.big, term_streams)
        return _filter(small, _exists_contained_by(small, big))
    if isinstance(node, INotContaining):
        minu = eval_stream(node.minuend, term_streams)
        sub = eval_stream(node.subtrahend, term_streams)
        return _filter(minu, ~_exists_containing(minu, sub))
    if isinstance(node, INotContainedBy):
        small = eval_stream(node.small, term_streams)
        big = eval_stream(node.big, term_streams)
        return _filter(small, ~_exists_contained_by(small, big))
    if isinstance(node, IOverlapping):
        src = eval_stream(node.source, term_streams)
        ref = eval_stream(node.reference, term_streams)
        return _filter(src, _exists_overlapping(src, ref))
    if isinstance(node, INonOverlapping):
        minu = eval_stream(node.minuend, term_streams)
        sub = eval_stream(node.subtrahend, term_streams)
        return _filter(minu, ~_exists_overlapping(minu, sub))
    raise TypeError(f"not an interval source: {node!r}")


def stream_freqs(ks, ke, ncand: int, min_ext: int) -> np.ndarray:
    """Per-candidate interval freq: strict left-to-right float32 running
    sum of 1 / max(length − minExtent + 1, 1) in emission (start) order —
    IntervalScorer.ensureFreq's accumulator, same rounding discipline as
    the flat kernel's."""
    freqs = np.zeros(ncand, np.float32)
    if not len(ks):
        return freqs
    denom = np.maximum(_width(ks, ke) - min_ext + 1, 1)
    inc = (np.float32(1.0) / denom.astype(np.float32)).astype(np.float32)
    cids = ks >> _S
    bounds = np.flatnonzero(np.concatenate(([True], cids[1:] != cids[:-1])))
    lens = np.diff(np.append(bounds, len(inc)))
    rank = np.arange(len(inc)) - np.repeat(bounds, lens)
    for r in range(int(lens.max())):
        m = rank == r
        freqs[cids[m]] = freqs[cids[m]] + inc[m]
    return freqs
