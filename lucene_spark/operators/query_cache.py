"""LRU query cache for non-scoring (FILTER) clauses.

Re-expresses ``core/search/LRUQueryCache.java`` +
``core/search/UsageTrackingQueryCachingPolicy.java`` in Spark terms.

Lucene caches, per (query, leaf-reader core), the clause's matching-doc
BitSet, bounded by ``maxSize`` queries and ``maxRamBytes``, and only after
a ``QueryCachingPolicy`` has seen the same clause often enough in a
256-entry frequency ring buffer (costly queries cache at 2 sightings,
cheap ones at 5; TermQuery / MatchAllDocsQuery never cache —
``UsageTrackingQueryCachingPolicy.java:50-120``).

The Spark analog keeps the same three pieces:

* cache unit = the clause's **sorted matching-gid array**, shipped to
  executors once as a Spark *broadcast* (TorrentBroadcast — the handle in
  each task closure is a few hundred bytes, like Lucene's per-leaf BitSet
  pointer). Kernels apply it as a keep-mask at the exact point the
  live-docs mask runs, and pre-drop postings blocks whose
  [first_gid, last_gid] range contains no cached gid — the block-grain
  analog of leapfrogging a BitSetIterator.
* bounds = ``max_entries`` (LRUQueryCache maxSize), ``max_total_gids``
  (maxRamBytes at 8 bytes/gid), and ``max_entry_gids`` — a match set
  bigger than that is never cached (the skipCacheFactor spirit: a filter
  that matches half the corpus is cheaper to re-execute than to ship).
* policy = :class:`UsageTrackingPolicy` below, ring buffer + per-class
  minimum frequency.

Entry keys embed the index generation (live merge-unit paths + committed
delete files), so a commit or delete under a shared cache simply misses —
stale generations age out through the LRU, exactly like Lucene keying on
``IndexReader.CacheKey`` per segment core.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

from ..plans.query import (
    BoolQ,
    ConstScoreQ,
    FuzzyQ,
    MatchAllQ,
    PrefixQ,
    RangeQ,
    RegexpQ,
    TermInSetQ,
    TermQ,
    TermSetRefQ,
    WildcardQ,
)

__all__ = ["LRUQueryCache", "UsageTrackingPolicy"]

# clause classes whose standalone execution is expensive enough that two
# sightings justify caching (UsageTrackingQueryCachingPolicy.isCostly:
# multi-term queries and point/range queries)
_COSTLY = (PrefixQ, WildcardQ, RegexpQ, FuzzyQ, RangeQ, TermInSetQ, TermSetRefQ)


def _strip_const(node):
    """The cache-identity node: ConstantScoreQuery caches by its child
    (LRUQueryCache.java cacheImpl unwraps ConstantScoreQuery/BoostQuery)."""
    while isinstance(node, ConstScoreQ):
        node = node.child
    return node


class UsageTrackingPolicy:
    """FrequencyTrackingRingBuffer + minFrequencyToCache
    (UsageTrackingQueryCachingPolicy.java).

    ``on_use`` records a sighting; ``should_cache`` answers whether the
    clause has been seen often enough. TermQuery and MatchAllDocsQuery
    never cache (they're cheaper to re-execute than to ship —
    shouldNeverCache), multi-term/range/set clauses cache at
    ``min_freq_costly`` sightings, everything else at ``min_freq_cheap``.
    """

    def __init__(self, history: int = 256, min_freq_costly: int = 2,
                 min_freq_cheap: int = 5):
        self.history = int(history)
        self.min_freq_costly = int(min_freq_costly)
        self.min_freq_cheap = int(min_freq_cheap)
        self._ring: list = []  # bounded at ``history`` sightings

    def on_use(self, key) -> None:
        self._ring.append(key)
        if len(self._ring) > self.history:
            self._ring.pop(0)

    def frequency(self, key) -> int:
        return sum(1 for k in self._ring if k == key)

    def should_cache(self, node, key) -> bool:
        inner = _strip_const(node)
        if isinstance(inner, (TermQ, MatchAllQ)):
            return False
        need = (
            self.min_freq_costly
            if isinstance(inner, _COSTLY)
            else self.min_freq_cheap
        )
        return self.frequency(key) >= need


class LRUQueryCache:
    """Bounded LRU of clause -> broadcast sorted gid array.

    Shareable across Searchers over the same SparkSession (Lucene's cache
    is shared across IndexSearchers); thread-unsafe by design, like the
    rest of the driver-side planner.

    Counters mirror LRUQueryCache's getHitCount/getMissCount/
    getCacheCount/getEvictionCount.
    """

    def __init__(self, max_entries: int = 1000,
                 max_total_gids: int = 1 << 25,
                 max_entry_gids: int = 1 << 22,
                 policy: "UsageTrackingPolicy | None" = None):
        self.max_entries = int(max_entries)
        self.max_total_gids = int(max_total_gids)
        self.max_entry_gids = int(max_entry_gids)
        self.policy = policy if policy is not None else UsageTrackingPolicy()
        self._entries: "OrderedDict[object, tuple]" = OrderedDict()  # key -> (bc, n)
        self._total_gids = 0
        self.hit_count = 0
        self.miss_count = 0
        self.cache_count = 0
        self.eviction_count = 0

    def __len__(self) -> int:
        return len(self._entries)

    def get(self, key):
        """Broadcast handle on hit (moved to MRU), else None."""
        ent = self._entries.get(key)
        if ent is None:
            self.miss_count += 1
            return None
        self._entries.move_to_end(key)
        self.hit_count += 1
        return ent[0]

    def put(self, key, gids: np.ndarray, spark):
        """Cache a sorted gid array; returns the broadcast handle, or None
        when the entry exceeds ``max_entry_gids`` (never cached — the
        too-dense-to-cache guard)."""
        n = int(len(gids))
        if n > self.max_entry_gids:
            return None
        while self._entries and (
            len(self._entries) >= self.max_entries
            or self._total_gids + n > self.max_total_gids
        ):
            _, (old_bc, old_n) = self._entries.popitem(last=False)
            self._total_gids -= old_n
            self.eviction_count += 1
            old_bc.unpersist()
        bc = spark.sparkContext.broadcast(np.ascontiguousarray(gids, np.int64))
        self._entries[key] = (bc, n)
        self._total_gids += n
        self.cache_count += 1
        return bc

    def clear(self) -> None:
        for bc, _ in self._entries.values():
            bc.unpersist()
        self._entries.clear()
        self._total_gids = 0
