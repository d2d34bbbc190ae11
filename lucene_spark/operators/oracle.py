"""Brute-force reference engine for correctness tests.

Deliberately naive and independent of the Spark engine's kernels: a dict
inverted index + per-doc loop scoring with Lucene's BM25 float32 expression.
The distributed engine (pruned or exhaustive) must match it rank- and
float32-score-identically — the CheckHits contract (tf/search/CheckHits.java)
and the WAND-vs-bruteforce test shape (ct/search/TestWANDScorer.java).

Only the analysis chain is shared (its parity is pinned by its own goldens).
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from ..functions.analysis import analyze_batch
from ..functions.smallfloat import LENGTH_TABLE, int_to_byte4
from ..plans.query import BoolQ, MatchAllQ, NearQ, PhraseQ, SloppyQ, TermQ


def _f32(x: float) -> np.float32:
    return np.float32(x)


class BruteForceIndex:
    def __init__(self, gids, keys, texts):
        self.gids = [int(g) for g in gids]
        self.keys = list(keys)
        batch = analyze_batch(list(texts))
        self.doc_len = {}
        self.norm = {}
        for i, g in enumerate(self.gids):
            dl = int(batch.doc_lens[i])
            self.doc_len[g] = dl
            self.norm[g] = int_to_byte4(dl)
        # postings: term -> {gid: freq}; positions: (term, gid) -> [pos...]
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.positions: dict[tuple[str, int], list[int]] = defaultdict(list)
        for d, t, p in zip(batch.tok_doc_idx, batch.tok_terms, batch.tok_positions):
            g = self.gids[int(d)]
            self.postings[t][g] = self.postings[t].get(g, 0) + 1
            self.positions[(t, g)].append(int(p))
        self.doc_count = sum(1 for g in self.gids if self.doc_len[g] > 0)
        self.sum_ttf = sum(self.doc_len.values())

    # ---- scoring ---------------------------------------------------------
    def _idf(self, term: str) -> np.float32:
        n = len(self.postings.get(term, {}))
        N = self.doc_count
        return _f32(math.log(1.0 + (N - n + 0.5) / (n + 0.5)))

    def _cache(self) -> np.ndarray:
        avgdl = _f32(self.sum_ttf / float(self.doc_count))
        one, k1, b = _f32(1.0), _f32(1.2), _f32(0.75)
        out = np.empty(256, dtype=np.float32)
        for i in range(256):
            dl = _f32(float(LENGTH_TABLE[i]))
            out[i] = one / (k1 * ((one - b) + (b * dl) / avgdl))
        return out

    def _score_tf(self, weight: np.float32, freq: int, norm: int, cache) -> np.float32:
        one = _f32(1.0)
        return weight - weight / (one + _f32(float(freq)) * cache[norm])

    def _doc_score(self, node, g: int, cache) -> "np.float32 | None":
        """Score of doc g for node, or None if not a match."""
        if isinstance(node, MatchAllQ):
            # MatchAllDocsQuery.score() == 1.0 on every doc
            return _f32(1.0)
        if isinstance(node, TermQ):
            f = self.postings.get(node.term, {}).get(g)
            if f is None:
                return None
            return self._score_tf(self._idf(node.term), f, self.norm[g], cache)
        if isinstance(node, PhraseQ):
            freq = self._phrase_freq(node, g)
            if freq == 0:
                return None
            w = _f32(sum(float(self._idf(t)) for t in node.terms))
            return self._score_tf(w, freq, self.norm[g], cache)
        if isinstance(node, NearQ):
            freq = self._near_freq(node, g)
            if freq == 0:
                return None
            w = _f32(sum(float(self._idf(t)) for t in node.terms))
            return self._score_tf(w, freq, self.norm[g], cache)
        if isinstance(node, SloppyQ):
            freq = self._sloppy_freq(node, g)
            if freq == 0:
                return None
            w = _f32(sum(float(self._idf(t)) for t in node.terms))
            one = _f32(1.0)
            return w - w / (one + freq * cache[self.norm[g]])
        if isinstance(node, BoolQ):
            total = 0.0  # double accumulation, float32 cast at the end
            if node.must:
                for c in node.must:
                    s = self._doc_score(c, g, cache)
                    if s is None:
                        return None
                    total += float(s)
                for c in node.should:
                    s = self._doc_score(c, g, cache)
                    if s is not None:
                        total += float(s)
            else:
                matched = False
                for c in node.should:
                    s = self._doc_score(c, g, cache)
                    if s is not None:
                        matched = True
                        total += float(s)
                if not matched:
                    return None
            for c in node.must_not:
                if self._matches(c, g):
                    return None
            return _f32(total)
        raise TypeError(node)

    def _matches(self, node, g: int) -> bool:
        if isinstance(node, MatchAllQ):
            return True
        if isinstance(node, TermQ):
            return g in self.postings.get(node.term, {})
        if isinstance(node, PhraseQ):
            return self._phrase_freq(node, g) > 0
        if isinstance(node, NearQ):
            return self._near_freq(node, g) > 0
        if isinstance(node, SloppyQ):
            return self._sloppy_freq(node, g) > 0
        if isinstance(node, BoolQ):
            return self._doc_score(node, g, self._cache()) is not None
        raise TypeError(node)

    def _near_freq(self, node: NearQ, g: int) -> int:
        """Ordered N-term proximity tuple count, naive nested-dict DP."""
        pos_lists = []
        for t in node.terms:
            ps = self.positions.get((t, g))
            if not ps:
                return 0
            pos_lists.append(sorted(ps))
        prev = {p: 1 for p in pos_lists[0]}
        for ps in pos_lists[1:]:
            cur = {}
            for p in ps:
                c = sum(v for q, v in prev.items() if 1 <= p - q <= node.slop + 1)
                if c:
                    cur[p] = c
            if not cur:
                return 0
            prev = cur
        return sum(prev.values())

    def _sloppy_freq(self, node: SloppyQ, g: int) -> np.float32:
        """Greedy sloppy-phrase traversal (SloppyPhraseMatcher semantics),
        written plainly: pop the min-(position, offset, ord) PhrasePositions,
        advance it past the runner-up while shrinking the window, count a
        match of weight 1/(1+matchLength) when the window closes (or the
        stream ends) within slop. Repeating terms start staggered and
        collisions advance the lesser of the pair."""
        n = len(node.terms)
        plists = []
        for t, off in zip(node.terms, node.offsets):
            ps = self.positions.get((t, g))
            if not ps:
                return np.float32(0.0)
            plists.append([p - off for p in sorted(ps)])
        ptr = [0] * n
        groups: dict[str, list[int]] = {}
        for i, t in enumerate(node.terms):
            groups.setdefault(t, []).append(i)
        rpt = [sorted(m, key=lambda i: node.offsets[i])
               for m in groups.values() if len(m) > 1]
        for rg in rpt:
            for j in range(1, len(rg)):
                ptr[rg[j]] += j
                if ptr[rg[j]] >= len(plists[rg[j]]):
                    return np.float32(0.0)
        in_rpt = {i: rg for rg in rpt for i in rg}

        def pos(i):
            return plists[i][ptr[i]]

        end = max(pos(i) for i in range(n))

        def advance(i):
            nonlocal end
            ptr[i] += 1
            if ptr[i] >= len(plists[i]):
                return False
            end = max(end, pos(i))
            return True

        def resolve(i):
            c = i
            while True:
                hit = [j for j in in_rpt.get(c, ()) if j != c
                       and pos(j) + node.offsets[j] == pos(c) + node.offsets[c]]
                if not hit:
                    return True
                k = hit[0]
                c = min(c, k, key=lambda x: (pos(x), node.offsets[x]))
                if not advance(c):
                    return False

        one = _f32(1.0)
        freq = _f32(0.0)
        p = min(range(n), key=lambda i: (pos(i), node.offsets[i], i))
        ml = end - pos(p)
        nxt = min(pos(i) for i in range(n) if i != p)
        while advance(p) and (not in_rpt or resolve(p)):
            if pos(p) > nxt:
                if ml <= node.slop:
                    freq = _f32(freq + one / (one + _f32(ml)))
                p = min(range(n), key=lambda i: (pos(i), node.offsets[i], i))
                nxt = min(pos(i) for i in range(n) if i != p)
                ml = end - pos(p)
            else:
                ml = min(ml, end - pos(p))
        if ml <= node.slop:
            freq = _f32(freq + one / (one + _f32(ml)))
        return freq

    def _phrase_freq(self, node: PhraseQ, g: int) -> int:
        sets = []
        for t, off in zip(node.terms, node.offsets):
            ps = self.positions.get((t, g))
            if not ps:
                return 0
            sets.append({p - off for p in ps})
        inter = set.intersection(*sets)
        return len(inter)

    # ---- API -------------------------------------------------------------
    def search(self, node, k: int = 10) -> list[tuple[int, str, np.float32]]:
        cache = self._cache()
        hits = []
        for g in self.gids:
            s = self._doc_score(node, g, cache)
            if s is not None:
                hits.append((g, s))
        hits.sort(key=lambda x: (-float(x[1]), x[0]))
        return [(g, self.keys[self.gids.index(g)], s) for g, s in hits[:k]]

    def count(self, node) -> int:
        return sum(1 for g in self.gids if self._matches(node, g))
