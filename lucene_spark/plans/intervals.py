"""Compositional interval sources — the full ``Intervals.java`` factory
surface (``queries/intervals/Intervals.java``) as an immutable expression
tree evaluated by a vectorized antichain algebra
(:mod:`lucene_spark.functions.interval_algebra`).

The flat two-combinator fast path (``IntervalQ``: ordered/unordered over
distinct terms + maxgaps) predates this module and stays; these nodes
cover the rest of the public factory methods:

========================  ==================================================
factory                   reference construction (Intervals.java line)
========================  ==================================================
``term``                  TermIntervalsSource (65)
``ordered``               OrderedIntervalsSource.build (332)
``unordered``             UnorderedIntervalsSource.build (346)
``phrase``                BlockIntervalsSource.build (93/110)
``or_``                   DisjunctionIntervalsSource.create (119)
``maxgaps``               FilteredIntervalsSource.maxGaps (299)
``maxwidth``              FilteredIntervalsSource.maxWidth (289)
``extend``                ExtendedIntervalsSource (321)
``containing``            ContainingIntervalsSource.build (444)
``contained_by``          ContainedByIntervalsSource.build (469)
``not_containing``        NotContainingIntervalsSource.build (431)
``not_contained_by``      NotContainedByIntervalsSource.build (457)
``overlapping``           OverlappingIntervalsSource (388)
``non_overlapping``       NonOverlappingIntervalsSource (377)
``within``                containedBy(src, extend(ref, pos, pos)) (418)
``not_within``            nonOverlapping(min, extend(sub, pos, pos)) (403)
``before``                containedBy(src, extend(PRECEDING(ref), MAX, 0))
                          (491; OffsetIntervalsSource before=true)
``after``                 containedBy(src, extend(FOLLOWING(ref), 0, MAX))
                          (497; OffsetIntervalsSource before=false)
``at_least``              MinimumShouldMatchIntervalsSource (476)
``unordered_no_overlaps`` or(ordered(a, b), ordered(b, a)) (355)
========================  ==================================================

Desugarings (within/not_within/before/after/unordered_no_overlaps) are the
reference's own — we build the same composed tree it does, so semantics
including the ``max(0, start-1)`` clamp of PRECEDING at position 0 carry
over exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

# ExtendedIntervalsSource clamps minExtent overflow to Integer.MAX_VALUE
# (ExtendedIntervalsSource.java:126-131); extend() offsets use the same
# MAX_VALUE sentinel in before()/after() (Intervals.java:491-501)
INT_MAX = 2**31 - 1


@dataclass(frozen=True)
class ITerm:
    """Single-term source: one point interval [p, p] per occurrence
    (TermIntervalsSource.java; width() == 1, gaps() == 0)."""

    term: str


@dataclass(frozen=True)
class IOrdered:
    """Sub-sources in query order, each starting strictly after the
    previous one ends (OrderedIntervalsSource.java nextInterval:
    ``subIterators.get(i).start() <= subIterators.get(i-1).end()`` skip);
    emits the minimal antichain; gaps = width − Σ chosen sub widths."""

    children: tuple


@dataclass(frozen=True)
class IUnordered:
    """Minimal windows containing one interval of every sub-source, in any
    order, overlaps allowed (UnorderedIntervalsSource.java); gaps = width
    − Σ chosen sub widths."""

    children: tuple


@dataclass(frozen=True)
class IBlock:
    """phrase(): each sub-source starts exactly one past the previous end
    (BlockIntervalsSource.java nextInterval start-alignment); gaps == 0."""

    children: tuple


@dataclass(frozen=True)
class IOr:
    """Disjunction: minimal antichain of the union of the children's
    streams (DisjunctionIntervalsSource.java); each emitted interval keeps
    its child's gaps."""

    children: tuple


@dataclass(frozen=True)
class IMaxGaps:
    """maxgaps(): keep intervals whose gaps() <= max_gaps
    (FilteredIntervalsSource.MaxGaps)."""

    child: object
    max_gaps: int


@dataclass(frozen=True)
class IMaxWidth:
    """maxwidth(): keep intervals with end − start + 1 <= max_width
    (FilteredIntervalsSource.MaxWidth)."""

    child: object
    max_width: int


@dataclass(frozen=True)
class IExtend:
    """extend(): [max(0, s − before), e + after]; gaps() delegates to the
    wrapped iterator (ExtendedIntervalIterator.java:82-84), so the child's
    gaps ride along unchanged. Output may not be an antichain — Lucene
    emits the extended stream as-is and so do we."""

    child: object
    before: int
    after: int


@dataclass(frozen=True)
class IOffset:
    """OffsetIntervalsSource (package-private; used by before()/after()):
    the point interval just before each child interval (``max(0, start −
    1)``, note the position-0 clamp) or just after (``end + 1``).
    width 1, gaps 0."""

    child: object
    preceding: bool


@dataclass(frozen=True)
class IContaining:
    """Intervals of ``big`` that contain >= 1 interval of ``small``
    (ContainingIntervalsSource); emits big's intervals with big's gaps."""

    big: object
    small: object


@dataclass(frozen=True)
class IContainedBy:
    """Intervals of ``small`` that lie within >= 1 interval of ``big``
    (ContainedByIntervalsSource); emits small's intervals."""

    small: object
    big: object


@dataclass(frozen=True)
class INotContaining:
    """Intervals of ``minuend`` containing NO subtrahend interval
    (NotContainingIntervalsSource)."""

    minuend: object
    subtrahend: object


@dataclass(frozen=True)
class INotContainedBy:
    """Intervals of ``small`` inside NO big interval
    (NotContainedByIntervalsSource)."""

    small: object
    big: object


@dataclass(frozen=True)
class IOverlapping:
    """Intervals of ``source`` overlapping >= 1 reference interval
    (OverlappingIntervalsSource)."""

    source: object
    reference: object


@dataclass(frozen=True)
class INonOverlapping:
    """Intervals of ``minuend`` overlapping NO subtrahend interval
    (NonOverlappingIntervalsSource)."""

    minuend: object
    subtrahend: object


# MultiTermIntervalsSource's expansion budget (Intervals.java:60)
DEFAULT_MAX_EXPANSIONS = 128


@dataclass(frozen=True)
class IPrefix:
    """Intervals.prefix(): disjunction over every dictionary term with
    the prefix (MultiTermIntervalsSource; Intervals.java:156-171).
    UNRESOLVED — ``Searcher.rewrite`` expands it against the term
    dictionary into IOr/ITerm/INoMatch, raising when the expansion
    exceeds ``max_expansions`` (the reference's IllegalStateException,
    MultiTermIntervalsSource.java:69-76). minExtent = 1 regardless of
    the disjunction (MultiTermIntervalsSource.java:163-165)."""

    prefix: str
    max_expansions: int = DEFAULT_MAX_EXPANSIONS


@dataclass(frozen=True)
class IWildcard:
    """Intervals.wildcard(): disjunction over every dictionary term
    matching the glob (``?``/``*``, WildcardQuery format); same
    rewrite/expansion-limit contract as :class:`IPrefix`."""

    pattern: str
    max_expansions: int = DEFAULT_MAX_EXPANSIONS


@dataclass(frozen=True)
class INoMatch:
    """An always-empty stream. NoMatchIntervalsSource proper has
    minExtent 0 (NoMatchIntervalsSource.java:49-51); a multi-term source
    whose dictionary expansion is empty keeps minExtent 1 (the reference
    keeps the MultiTermIntervalsSource node and only its iterator is
    empty, MultiTermIntervalsSource.java:163-165) — ``min_ext``
    distinguishes the two so rewritten trees score identically."""

    reason: str = ""
    min_ext: int = 0


@dataclass(frozen=True)
class IAtLeast:
    """atLeast(): minimal windows spanning intervals from >=
    ``min_should_match`` of the sources
    (MinimumShouldMatchIntervalsSource); gaps = width − Σ matched sub
    widths (its OrDocIdStream slop, MinimumShouldMatchIntervalsSource.java
    212-214)."""

    children: tuple
    min_should_match: int


# ---------------------------------------------------------------------------
# factories (Intervals.java surface)
# ---------------------------------------------------------------------------

def _src(x):
    return ITerm(x) if isinstance(x, str) else x


def term(t: str) -> ITerm:
    return ITerm(t)


def ordered(*subs) -> IOrdered:
    if len(subs) < 2:
        raise ValueError("ordered() needs >= 2 sub-sources")
    return IOrdered(tuple(_src(s) for s in subs))


def unordered(*subs) -> IUnordered:
    if len(subs) < 2:
        raise ValueError("unordered() needs >= 2 sub-sources")
    return IUnordered(tuple(_src(s) for s in subs))


def phrase(*subs) -> IBlock:
    if len(subs) < 2:
        raise ValueError("phrase() needs >= 2 sub-sources")
    return IBlock(tuple(_src(s) for s in subs))


def or_(*subs):
    if len(subs) < 1:
        raise ValueError("or_() needs >= 1 sub-source")
    if len(subs) == 1:
        return _src(subs[0])
    return IOr(tuple(_src(s) for s in subs))


def maxgaps(gaps: int, sub) -> IMaxGaps:
    return IMaxGaps(_src(sub), int(gaps))


def maxwidth(width: int, sub) -> IMaxWidth:
    return IMaxWidth(_src(sub), int(width))


def extend(sub, before: int, after: int) -> IExtend:
    if before < 0 or after < 0:
        raise ValueError("extend() offsets must be >= 0")
    return IExtend(_src(sub), int(before), int(after))


def containing(big, small) -> IContaining:
    return IContaining(_src(big), _src(small))


def contained_by(small, big) -> IContainedBy:
    return IContainedBy(_src(small), _src(big))


def not_containing(minuend, subtrahend) -> INotContaining:
    return INotContaining(_src(minuend), _src(subtrahend))


def not_contained_by(small, big) -> INotContainedBy:
    return INotContainedBy(_src(small), _src(big))


def overlapping(source, reference) -> IOverlapping:
    return IOverlapping(_src(source), _src(reference))


def non_overlapping(minuend, subtrahend) -> INonOverlapping:
    return INonOverlapping(_src(minuend), _src(subtrahend))


def within(source, positions: int, reference) -> IContainedBy:
    # Intervals.java:418-421
    return contained_by(source, extend(reference, positions, positions))


def not_within(minuend, positions: int, subtrahend) -> INonOverlapping:
    # Intervals.java:403-407
    return non_overlapping(minuend, extend(subtrahend, positions, positions))


def before(source, reference) -> IContainedBy:
    # Intervals.java:491-494
    return IContainedBy(
        _src(source), IExtend(IOffset(_src(reference), True), INT_MAX, 0)
    )


def after(source, reference) -> IContainedBy:
    # Intervals.java:497-501
    return IContainedBy(
        _src(source), IExtend(IOffset(_src(reference), False), 0, INT_MAX)
    )


def at_least(min_should_match: int, *subs):
    # Intervals.java:476-489
    m = int(min_should_match)
    if m <= 0:
        raise ValueError("at_least() needs min_should_match >= 1")
    if m > len(subs):
        raise ValueError(
            f"too few sources to match minimum of [{m}]"
        )  # NoMatchIntervalsSource analog: reject eagerly
    if m == len(subs):
        return unordered(*subs)
    if m == 1:
        return or_(*subs)
    return IAtLeast(tuple(_src(s) for s in subs), m)


def prefix(p: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS) -> IPrefix:
    # Intervals.java:156-171
    return IPrefix(p, int(max_expansions))


def wildcard(pattern: str,
             max_expansions: int = DEFAULT_MAX_EXPANSIONS) -> IWildcard:
    # Intervals.java:184-217
    return IWildcard(pattern, int(max_expansions))


def unordered_no_overlaps(a, b) -> IOr:
    # Intervals.java:355-357
    return IOr((IOrdered((_src(a), _src(b))), IOrdered((_src(b), _src(a)))))


# ---------------------------------------------------------------------------
# tree utilities
# ---------------------------------------------------------------------------

def _children_of(node):
    if isinstance(node, INoMatch):
        return ()
    if isinstance(node, (IPrefix, IWildcard)):
        raise TypeError(
            f"{node!r} must be rewritten against the term dictionary "
            "(Searcher.rewrite) before planning"
        )
    if isinstance(node, (IOrdered, IUnordered, IBlock, IOr, IAtLeast)):
        return node.children
    if isinstance(node, (IMaxGaps, IMaxWidth, IExtend, IOffset)):
        return (node.child,)
    if isinstance(node, IContaining):
        return (node.big, node.small)
    if isinstance(node, IContainedBy):
        return (node.small, node.big)
    if isinstance(node, INotContaining):
        return (node.minuend, node.subtrahend)
    if isinstance(node, INotContainedBy):
        return (node.small, node.big)
    if isinstance(node, IOverlapping):
        return (node.source, node.reference)
    if isinstance(node, INonOverlapping):
        return (node.minuend, node.subtrahend)
    raise TypeError(f"not an interval source: {node!r}")


def tree_terms(node) -> tuple:
    """All term leaves, in first-appearance order (the postings-scan set)."""
    if isinstance(node, ITerm):
        return (node.term,)
    out, seen = [], set()
    for c in _children_of(node):
        for t in tree_terms(c):
            if t not in seen:
                seen.add(t)
                out.append(t)
    return tuple(out)


def map_tree_terms(node, fn):
    """Rebuild the tree with every term leaf mapped through ``fn`` (the
    analyzer fold ``plans/query.py::map_terms`` applies to flat nodes)."""
    import dataclasses as _dc

    if isinstance(node, ITerm):
        return ITerm(fn(node.term))
    kids = {f.name: getattr(node, f.name) for f in _dc.fields(node)}
    for k, v in kids.items():
        if isinstance(v, tuple) and v and not isinstance(v[0], (int, str)):
            kids[k] = tuple(map_tree_terms(c, fn) for c in v)
        elif _is_source(v):
            kids[k] = map_tree_terms(v, fn)
    return type(node)(**kids)


_SOURCE_TYPES = (
    ITerm, IOrdered, IUnordered, IBlock, IOr, IMaxGaps, IMaxWidth, IExtend,
    IOffset, IContaining, IContainedBy, INotContaining, INotContainedBy,
    IOverlapping, INonOverlapping, IAtLeast, IPrefix, IWildcard, INoMatch,
)


def _is_source(x) -> bool:
    return isinstance(x, _SOURCE_TYPES)


def min_extent(node) -> int:
    """``IntervalsSource.minExtent()`` — the scorer's per-interval weight
    denominator uses the TOP-LEVEL value (IntervalScorer.java:72)."""
    if isinstance(node, (ITerm, IOffset, IPrefix, IWildcard)):
        # TermIntervalsSource / OffsetIntervalsSource.java:313 /
        # MultiTermIntervalsSource.java:163-165
        return 1
    if isinstance(node, INoMatch):
        return node.min_ext
    if isinstance(node, (IOrdered, IUnordered, IBlock)):
        # OrderedIntervalsSource.java:81-86 etc.: sum of children
        return sum(min_extent(c) for c in node.children)
    if isinstance(node, IOr):
        # DisjunctionIntervalsSource.java:139-144: min of children
        return min(min_extent(c) for c in node.children)
    if isinstance(node, IAtLeast):
        # MinimumShouldMatchIntervalsSource.java:103-113: sum of the
        # minShouldMatch smallest child extents
        ext = sorted(min_extent(c) for c in node.children)
        return sum(ext[: node.min_should_match])
    if isinstance(node, IExtend):
        # ExtendedIntervalsSource.java:126-131 with overflow clamp
        v = node.before + min_extent(node.child) + node.after
        return INT_MAX if v < 0 or v > INT_MAX else v
    if isinstance(node, (IMaxGaps, IMaxWidth)):
        return min_extent(node.child)  # FilteredIntervalsSource.java:128
    if isinstance(node, IContaining):
        return min_extent(node.big)  # ContainingIntervalsSource.java:69
    if isinstance(node, IContainedBy):
        return min_extent(node.small)  # ContainedByIntervalsSource.java:78
    if isinstance(node, (INotContaining, INotContainedBy, INonOverlapping)):
        # DifferenceIntervalsSource.java:75: the minuend
        m = node.minuend if hasattr(node, "minuend") else node.small
        return min_extent(m)
    if isinstance(node, IOverlapping):
        return min_extent(node.source)  # OverlappingIntervalsSource.java:74
    raise TypeError(f"not an interval source: {node!r}")
