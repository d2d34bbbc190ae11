"""Top-k BM25 search over the segment index.

Spark shape of Lucene's search lifecycle (SURVEY.md §3b):

  1. Driver plans the query (parse + rewrite, ``plans/query.py``) and pins
     GLOBAL stats — docCount/avgdl from ``stats.json``, per-term docFreq from
     the ``terms`` table (TermStates.build analog). idf/avgdl therefore match
     a single-index Lucene search exactly.
  2. The postings scan is a plain DataFrame filter ``term IN (...)`` over the
     block-row Parquet — predicate pushdown + column pruning do the term-
     dictionary seek (positions column only read for phrase queries).
  3. Scoring runs in vectorized Arrow kernels:
       - single-term: ``mapInPandas`` straight over block rows (no shuffle);
       - boolean/phrase: blocks are exploded onto gid-range *buckets* and
         ``applyInPandas`` aligns all query terms' postings per bucket —
         the conjunction/disjunction/exclusion set ops are numpy sorted-array
         ops (ConjunctionDISI / DisjunctionSumScorer / ReqExclScorer).
     Score composition is float32-exact: each scorer node returns float32,
     parents sum children in double and cast to float32 once — the same cast
     points as ConjunctionScorer/DisjunctionSumScorer/ReqOptSumScorer.
  4. Block-max pruning (WANDScorer / ImpactsDISI analog): per-block impact
     frontiers give max scores; a worker-local top-k heap provides θ, and
     blocks/buckets whose upper bound < θ are skipped *before decoding*.
     θ from any subset of docs is ≤ the true kth score, so pruning never
     changes results (CheckHits contract, tested pruned == exhaustive).
  5. Global top-k = orderBy(score desc, gid asc).limit(k) — Spark's
     TakeOrdered is exactly TopDocs.merge with Lucene's tie-break
     (HitQueue.java:78-84: score desc, docID asc).
"""

from __future__ import annotations

import heapq
import json
import os
import uuid
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..functions.bm25 import BM25Scorer, avgdl as _avgdl, idf as _idf, norm_cache
from ..functions.pfor import decode_stream
from ..plans.query import (
    BoolQ,
    BoostQ,
    ConstScoreQ,
    DisMaxQ,
    FuzzyQ,
    MatchAllQ,
    NearQ,
    PhraseQ,
    PrefixQ,
    RangeQ,
    RegexpQ,
    SynonymQ,
    TermQ,
    WildcardQ,
    parse_query,
    query_terms,
)

__all__ = ["Searcher", "TermPostings", "eval_plan", "decode_term_blocks"]

# BooleanQuery clause cap for scoring rewrites (IndexSearcher.java:81)
MAX_CLAUSE_COUNT = 1024


@dataclass
class TermPostings:
    gids: np.ndarray  # int64, sorted asc
    freqs: np.ndarray  # int64
    norms: np.ndarray  # uint8
    positions: "list[np.ndarray] | None" = None  # per-doc absolute positions


def decode_term_blocks(block_rows: pd.DataFrame, need_positions: bool = False) -> TermPostings:
    """Decode all block rows of ONE term into flat posting arrays.

    Rows may span segments; segment gid ranges are disjoint, so sorting
    blocks by first_gid and concatenating yields globally sorted postings.
    """
    block_rows = block_rows.sort_values("first_gid", kind="mergesort")
    gids_l, freqs_l, norms_l, pos_l = [], [], [], []
    for row in block_rows.itertuples(index=False):
        gaps = decode_stream(row.gids).astype(np.int64)
        g = np.empty(len(gaps) + 1, dtype=np.int64)
        g[0] = row.first_gid
        if len(gaps):
            g[1:] = row.first_gid + np.cumsum(gaps)
        f = decode_stream(row.freqs).astype(np.int64)
        n = decode_stream(row.norms).astype(np.uint8)
        gids_l.append(g)
        freqs_l.append(f)
        norms_l.append(n)
        if need_positions:
            deltas = decode_stream(row.positions).astype(np.int64)
            cs = np.cumsum(deltas)
            starts = np.concatenate(([0], np.cumsum(f)[:-1]))
            base = np.where(starts > 0, cs[starts - 1], 0)
            abs_pos = cs - np.repeat(base, f)
            pos_l.extend(np.split(abs_pos, np.cumsum(f)[:-1]))
    if not gids_l:
        return TermPostings(
            np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.uint8),
            [] if need_positions else None,
        )
    return TermPostings(
        np.concatenate(gids_l),
        np.concatenate(freqs_l),
        np.concatenate(norms_l),
        pos_l if need_positions else None,
    )


# ------------------------------------------------------------ plan evaluation


@dataclass
class ScoreCtx:
    weights: dict  # term -> np.float32 weight (boost * idf)
    cache: np.ndarray  # float32[256] shared norm-inverse cache
    phrase_weights: dict  # PhraseQ -> np.float32
    syn_weights: dict = None  # SynonymQ -> np.float32 (blended stats)
    boost_weights: dict = None  # BoostQ -> np.float32 (boost * idf, f32 mult)


def _score_term(tp: TermPostings, weight: np.float32, cache: np.ndarray) -> np.ndarray:
    one = np.float32(1.0)
    return weight - weight / (one + tp.freqs.astype(np.float32) * cache[tp.norms])


def eval_plan(node, postings: dict, ctx: ScoreCtx) -> tuple[np.ndarray, np.ndarray]:
    """Evaluate a query node -> (sorted gids, float32 scores).

    ``postings`` maps term -> TermPostings restricted to the current range.
    """
    if node is None:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    if isinstance(node, TermQ):
        tp = postings.get(node.term)
        if tp is None or not len(tp.gids):
            return np.empty(0, np.int64), np.empty(0, np.float32)
        return tp.gids, _score_term(tp, ctx.weights[node.term], ctx.cache)
    if isinstance(node, PhraseQ):
        return _eval_phrase(node, postings, ctx)
    if isinstance(node, NearQ):
        return _eval_near(node, postings, ctx)
    if isinstance(node, BoolQ):
        return _eval_bool(node, postings, ctx)
    if isinstance(node, SynonymQ):
        return _eval_synonym(node, postings, ctx)
    if isinstance(node, DisMaxQ):
        return _eval_dismax(node, postings, ctx)
    if isinstance(node, ConstScoreQ):
        gids, _ = eval_plan(node.child, postings, ctx)
        return gids, np.full(len(gids), np.float32(node.boost), dtype=np.float32)
    if isinstance(node, BoostQ):
        return _eval_boost(node, postings, ctx)
    raise TypeError(f"unknown node {node!r}")


def _eval_boost(node: BoostQ, postings: dict, ctx: ScoreCtx) -> tuple[np.ndarray, np.ndarray]:
    """BoostQuery over a leaf: score with weight = boost * idf (the same
    float32 fold as BM25Scorer's ctor), so rounding matches Lucene's."""
    w = ctx.boost_weights[node]
    child = node.child
    if isinstance(child, TermQ):
        tp = postings.get(child.term)
        if tp is None or not len(tp.gids):
            return np.empty(0, np.int64), np.empty(0, np.float32)
        return tp.gids, _score_term(tp, w, ctx.cache)
    if isinstance(child, (PhraseQ, SynonymQ)):
        # temporarily rebind the child's weight to the boosted one
        sub = ScoreCtx(
            weights=ctx.weights,
            cache=ctx.cache,
            phrase_weights={**ctx.phrase_weights, child: w}
            if isinstance(child, PhraseQ) else ctx.phrase_weights,
            syn_weights={**(ctx.syn_weights or {}), child: w}
            if isinstance(child, SynonymQ) else ctx.syn_weights,
            boost_weights=ctx.boost_weights,
        )
        return eval_plan(child, postings, sub)
    raise TypeError(f"BoostQ supports leaf scoring nodes, got {child!r}")


def _eval_synonym(node: SynonymQ, postings: dict, ctx: ScoreCtx) -> tuple[np.ndarray, np.ndarray]:
    """SynonymQuery kernel: member postings merge into one pseudo-term —
    per-doc freq = Σ member freqs, one score with the blended weight
    (SynonymQuery.java SynonymWeight/SynonymScorer)."""
    tps = [postings.get(t) for t in node.terms]
    tps = [tp for tp in tps if tp is not None and len(tp.gids)]
    if not tps:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    all_g = np.concatenate([tp.gids for tp in tps])
    all_f = np.concatenate([tp.freqs for tp in tps])
    all_n = np.concatenate([tp.norms for tp in tps])
    gids, inv = np.unique(all_g, return_inverse=True)
    freqs = np.zeros(len(gids), dtype=np.int64)
    np.add.at(freqs, inv, all_f)
    norms = np.zeros(len(gids), dtype=np.uint8)
    norms[inv] = all_n  # per-doc norm, identical across member terms
    w = ctx.syn_weights[node]
    one = np.float32(1.0)
    scores = w - w / (one + freqs.astype(np.float32) * ctx.cache[norms])
    return gids, scores


def _eval_dismax(node: DisMaxQ, postings: dict, ctx: ScoreCtx) -> tuple[np.ndarray, np.ndarray]:
    """DisjunctionMaxQuery kernel: per doc, max clause score plus
    tie * (sum - max), composed in double and cast to float32 once
    (DisjunctionMaxScorer.score)."""
    evals = [eval_plan(c, postings, ctx) for c in node.clauses]
    evals = [(g, s) for g, s in evals if len(g)]
    if not evals:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    all_g = np.concatenate([g for g, _ in evals])
    all_s = np.concatenate([s for _, s in evals]).astype(np.float64)
    gids, inv = np.unique(all_g, return_inverse=True)
    smax = np.full(len(gids), -np.inf)
    np.maximum.at(smax, inv, all_s)
    ssum = np.zeros(len(gids))
    np.add.at(ssum, inv, all_s)
    scores = (smax + (ssum - smax) * float(node.tie)).astype(np.float32)
    return gids, scores


def _eval_bool(node: BoolQ, postings: dict, ctx: ScoreCtx) -> tuple[np.ndarray, np.ndarray]:
    # evaluate children
    musts = [eval_plan(c, postings, ctx) for c in node.must]
    shoulds = [eval_plan(c, postings, ctx) for c in node.should]
    nots = [eval_plan(c, postings, ctx) for c in node.must_not]
    msm = max(int(node.msm), 0)
    if msm > len(node.should):
        return np.empty(0, np.int64), np.empty(0, np.float32)

    if node.must:
        gids = musts[0][0]
        for g, _ in musts[1:]:
            gids = np.intersect1d(gids, g, assume_unique=True)
        if not len(gids):
            return gids, np.empty(0, np.float32)
        total = np.zeros(len(gids), dtype=np.float64)
        n_opt = np.zeros(len(gids), dtype=np.int64)
        for g, s in musts:
            idx = np.searchsorted(g, gids)
            total += s[idx].astype(np.float64)
        for g, s in shoulds:
            if not len(g):
                continue
            idx = np.searchsorted(g, gids)
            idx_c = np.minimum(idx, len(g) - 1)
            hit = g[idx_c] == gids
            total[hit] += s[idx_c[hit]].astype(np.float64)
            n_opt[hit] += 1
        if msm > 0:
            keep = n_opt >= msm
            gids, total = gids[keep], total[keep]
    else:
        if not shoulds:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        all_g = np.concatenate([g for g, _ in shoulds])
        all_s = np.concatenate([s for _, s in shoulds]).astype(np.float64)
        if not len(all_g):
            return np.empty(0, np.int64), np.empty(0, np.float32)
        gids, inv = np.unique(all_g, return_inverse=True)
        total = np.zeros(len(gids), dtype=np.float64)
        np.add.at(total, inv, all_s)
        if msm > 1:
            # WANDScorer's minShouldMatch mode: keep docs matching >= msm
            # optional clauses (TestWANDScorer's brute-force contract)
            cnt = np.zeros(len(gids), dtype=np.int64)
            np.add.at(cnt, inv, 1)
            keep = cnt >= msm
            gids, total = gids[keep], total[keep]

    for g, _ in nots:
        if len(g):
            keep = ~np.isin(gids, g, assume_unique=True)
            gids, total = gids[keep], total[keep]
    return gids, total.astype(np.float32)


def _eval_phrase(node: PhraseQ, postings: dict, ctx: ScoreCtx) -> tuple[np.ndarray, np.ndarray]:
    """Exact phrase: leapfrog on positions (ExactPhraseMatcher analog).

    Candidate docs = conjunction of the phrase terms; per candidate, phrase
    freq = |∩_i (positions_i - offset_i)|; scored like a term with the
    summed idf weight (PhraseWeight/BM25 semantics).
    """
    tps = [postings.get(t) for t in node.terms]
    if any(tp is None or not len(tp.gids) for tp in tps):
        return np.empty(0, np.int64), np.empty(0, np.float32)
    gids = tps[0].gids
    for tp in tps[1:]:
        gids = np.intersect1d(gids, tp.gids, assume_unique=True)
    if not len(gids):
        return gids, np.empty(0, np.float32)
    idxs = [np.searchsorted(tp.gids, gids) for tp in tps]
    freqs = np.zeros(len(gids), dtype=np.int64)
    norms = tps[0].norms[idxs[0]]
    for j in range(len(gids)):
        cand = tps[0].positions[idxs[0][j]] - node.offsets[0]
        for i in range(1, len(tps)):
            cand = np.intersect1d(cand, tps[i].positions[idxs[i][j]] - node.offsets[i], assume_unique=True)
            if not len(cand):
                break
        freqs[j] = len(cand)
    hit = freqs > 0
    gids, freqs, norms = gids[hit], freqs[hit], norms[hit]
    w = ctx.phrase_weights[node]
    one = np.float32(1.0)
    scores = w - w / (one + freqs.astype(np.float32) * ctx.cache[norms])
    return gids, scores


def _eval_near(node: NearQ, postings: dict, ctx: ScoreCtx) -> tuple[np.ndarray, np.ndarray]:
    """Ordered proximity kernel: per candidate doc, count position pairs
    (p1, p2) with 1 <= p2 - p1 <= slop + 1 via searchsorted over the sorted
    position arrays; score like a phrase with that pair count as freq."""
    t1, t2 = node.terms
    a, b = postings.get(t1), postings.get(t2)
    if a is None or b is None or not len(a.gids) or not len(b.gids):
        return np.empty(0, np.int64), np.empty(0, np.float32)
    gids = np.intersect1d(a.gids, b.gids, assume_unique=True)
    if not len(gids):
        return gids, np.empty(0, np.float32)
    ia = np.searchsorted(a.gids, gids)
    ib = np.searchsorted(b.gids, gids)
    freqs = np.zeros(len(gids), dtype=np.int64)
    for j in range(len(gids)):
        p1 = a.positions[ia[j]]
        p2 = b.positions[ib[j]]
        lo = np.searchsorted(p2, p1 + 1)
        hi = np.searchsorted(p2, p1 + node.slop + 1, side="right")
        freqs[j] = int((hi - lo).sum())
    hit = freqs > 0
    gids, freqs = gids[hit], freqs[hit]
    norms = a.norms[ia[hit]]
    w = ctx.phrase_weights[node]
    one = np.float32(1.0)
    scores = w - w / (one + freqs.astype(np.float32) * ctx.cache[norms])
    return gids, scores


def _max_score_of_impacts(imp_freqs, imp_norms, weight, cache) -> float:
    f = np.asarray(imp_freqs, dtype=np.int64)
    n = np.asarray(imp_norms, dtype=np.int64).astype(np.uint8)
    if not len(f):
        return float("inf")
    one = np.float32(1.0)
    s = weight - weight / (one + f.astype(np.float32) * cache[n])
    return float(s.max())


def _plan_upper_bound(node, term_maxes: dict, ctx: ScoreCtx) -> float:
    """Conservative max score of a node given per-term max scores in range.

    A missing must term makes the node impossible (-inf).
    """
    if node is None:
        return float("-inf")
    if isinstance(node, TermQ):
        return term_maxes.get(node.term, float("-inf"))
    if isinstance(node, (PhraseQ, NearQ)):
        if any(t not in term_maxes for t in node.terms):
            return float("-inf")
        return float("inf")  # no cheap bound for phrase/proximity freq
    if isinstance(node, BoolQ):
        ub = 0.0
        if node.must:
            for c in node.must:
                b = _plan_upper_bound(c, term_maxes, ctx)
                if b == float("-inf"):
                    return float("-inf")
                ub += b
            for c in node.should:
                b = _plan_upper_bound(c, term_maxes, ctx)
                if b > 0:
                    ub += b
            return ub
        any_present = False
        for c in node.should:
            b = _plan_upper_bound(c, term_maxes, ctx)
            if b != float("-inf"):
                any_present = True
                ub += max(b, 0.0)
        return ub if any_present else float("-inf")
    if isinstance(node, SynonymQ):
        if not any(t in term_maxes for t in node.terms):
            return float("-inf")
        # score is bounded above by the blended weight (w - w/(1+x) < w)
        return float(ctx.syn_weights[node])
    if isinstance(node, DisMaxQ):
        bounds = [_plan_upper_bound(c, term_maxes, ctx) for c in node.clauses]
        bounds = [b for b in bounds if b != float("-inf")]
        if not bounds:
            return float("-inf")
        mx = max(bounds)
        return mx + node.tie * sum(max(b, 0.0) for b in bounds if b is not mx)
    if isinstance(node, ConstScoreQ):
        child = _plan_upper_bound(node.child, term_maxes, ctx)
        return float("-inf") if child == float("-inf") else float(node.boost)
    if isinstance(node, BoostQ):
        child = _plan_upper_bound(node.child, term_maxes, ctx)
        if child == float("-inf"):
            return float("-inf")
        return float(ctx.boost_weights[node])  # score < weight always
    return float("inf")


# ------------------------------------------------------------------ searcher

# worker-local top-k heaps: query id -> min-heap of scores. Python workers
# are long-lived across queries, so the map is bounded: oldest entries drop
# once more than _MAX_LIVE_QUERIES distinct queries have touched this worker
# (dict preserves insertion order; dropping only ever loses pruning
# opportunity, never correctness).
_LOCAL_HEAPS: dict = {}
_MAX_LIVE_QUERIES = 64


def _theta(qid: str, k: int) -> float:
    heap = _LOCAL_HEAPS.get(qid)
    if heap is None or len(heap) < k:
        return float("-inf")
    return heap[0]


def _offer(qid: str, k: int, scores: np.ndarray) -> None:
    heap = _LOCAL_HEAPS.setdefault(qid, [])
    while len(_LOCAL_HEAPS) > _MAX_LIVE_QUERIES:
        _LOCAL_HEAPS.pop(next(iter(_LOCAL_HEAPS)))
    scores = np.asarray(scores)
    if len(scores) > k:  # only the batch's top-k can matter
        scores = scores[np.argpartition(-scores, k - 1)[:k]]
    for s in scores:
        s = float(s)
        if len(heap) < k:
            heapq.heappush(heap, s)
        elif s > heap[0]:
            heapq.heapreplace(heap, s)


RESULT_SCHEMA = T.StructType(
    [T.StructField("gid", T.LongType()), T.StructField("score", T.FloatType())]
)


class Searcher:
    """Searches one finalized index directory."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self._terms_df = None

    # ---- planning -----------------------------------------------------
    def _postings_df(self) -> DataFrame:
        """Postings scan: merged table (if a merge committed) + any batches
        appended after the merge; otherwise all per-segment batches."""
        from ..operators.indexer import read_manifest

        manifest = read_manifest(self.index_dir)
        merged_through: set = set()
        has_merge = False
        for rec in manifest:
            if rec.get("type") == "merge" and rec.get("status") == "committed":
                has_merge = True
                merged_through |= set(rec.get("merged_batches", []))
        all_batches = sorted(
            {r["batch"] for r in manifest if r.get("status") == "committed" and r.get("batch") is not None}
        )
        cols = [
            "term", "seg", "block_ord", "doc_count", "first_gid", "last_gid",
            "gids", "freqs", "norms", "positions", "imp_freqs", "imp_norms",
        ]
        if not has_merge:
            path = os.path.join(self.index_dir, "segments", "batch=*", "row_type=post")
            return self.spark.read.parquet(path).select(*cols)
        parts = [
            self.spark.read.parquet(os.path.join(self.index_dir, "postings_merged")).select(*cols)
        ]
        residual = [b for b in all_batches if b not in merged_through]
        for b in residual:
            parts.append(
                self.spark.read.parquet(
                    os.path.join(self.index_dir, "segments", f"batch={b}", "row_type=post")
                ).select(*cols)
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def term_stats(self, terms: set[str]) -> dict[str, tuple[int, int]]:
        if not terms:
            return {}
        tdf = self.spark.read.parquet(os.path.join(self.index_dir, "terms"))
        rows = tdf.filter(F.col("term").isin(list(terms))).collect()
        return {r["term"]: (int(r["doc_freq"]), int(r["total_term_freq"])) for r in rows}

    # ---- multi-term rewrite (MultiTermQuery.java rewrite methods) ------
    def terms_table(self) -> DataFrame:
        if self._terms_df is None:
            self._terms_df = self.spark.read.parquet(
                os.path.join(self.index_dir, "terms")
            )
        return self._terms_df

    def expand_terms(self, node) -> list[str]:
        """Term-dictionary scan for one multi-term node. The filter pushes
        into the sorted terms Parquet (min/max row-group pruning = the
        blocktree/FST seek analog); matches collect to the driver, capped
        like BooleanQuery's maxClauseCount."""
        tdf = self.terms_table()
        if isinstance(node, PrefixQ):
            matched = tdf.filter(F.col("term").startswith(node.prefix))
        elif isinstance(node, WildcardQ):
            import re as _re

            rx = "".join(
                ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
                for ch in node.pattern
            )
            matched = tdf.filter(F.col("term").rlike(f"^{rx}$"))
        elif isinstance(node, FuzzyQ):
            # FuzzyQuery.java: candidates within maxEdits, keeping the
            # maxExpansions highest-docFreq terms (exact-match always kept)
            cand = tdf.filter(
                F.levenshtein(F.col("term"), F.lit(node.term)) <= node.max_edits
            )
            rows = (
                cand.select("term", "doc_freq")
                .orderBy(
                    (F.col("term") == node.term).desc(),
                    F.desc("doc_freq"),
                    F.asc("term"),
                )
                .limit(node.max_expansions)
                .collect()
            )
            return sorted(r["term"] for r in rows)
        elif isinstance(node, RegexpQ):
            matched = tdf.filter(F.col("term").rlike(f"^{node.pattern}$"))
        elif isinstance(node, RangeQ):
            c = F.lit(True)
            if node.lo is not None:
                c = c & (
                    F.col("term") >= node.lo if node.include_lo else F.col("term") > node.lo
                )
            if node.hi is not None:
                c = c & (
                    F.col("term") <= node.hi if node.include_hi else F.col("term") < node.hi
                )
            matched = tdf.filter(c)
        else:
            raise TypeError(f"not a multi-term node: {node!r}")
        terms = [r["term"] for r in matched.select("term").limit(MAX_CLAUSE_COUNT + 1).collect()]
        if len(terms) > MAX_CLAUSE_COUNT:
            raise ValueError(
                f"multi-term query expands to >{MAX_CLAUSE_COUNT} terms "
                "(maxClauseCount, IndexSearcher.java:81)"
            )
        return sorted(terms)

    def rewrite(self, node):
        """Resolve multi-term nodes against the term dictionary
        (Query.rewrite fixpoint, IndexSearcher.java:761-768).

        Prefix/wildcard → scoring boolean OR over matched terms
        (MultiTermQuery.SCORING_BOOLEAN_REWRITE); range → constant-score
        over the match set (Lucene's default for ranges). An empty
        expansion becomes a match-nothing BoolQ (MatchNoDocsQuery analog).
        """
        if node is None or isinstance(node, (TermQ, PhraseQ, NearQ, SynonymQ, MatchAllQ)):
            return node
        if isinstance(node, (PrefixQ, WildcardQ, FuzzyQ, RegexpQ)):
            terms = self.expand_terms(node)
            return BoolQ(should=tuple(TermQ(t) for t in terms)).simplified()
        if isinstance(node, RangeQ):
            terms = self.expand_terms(node)
            return ConstScoreQ(BoolQ(should=tuple(TermQ(t) for t in terms)), boost=1.0)
        if isinstance(node, BoolQ):
            return BoolQ(
                must=tuple(self.rewrite(c) for c in node.must),
                should=tuple(self.rewrite(c) for c in node.should),
                must_not=tuple(self.rewrite(c) for c in node.must_not),
                msm=node.msm,
            ).simplified()
        if isinstance(node, DisMaxQ):
            return DisMaxQ(
                clauses=tuple(self.rewrite(c) for c in node.clauses), tie=node.tie
            )
        if isinstance(node, ConstScoreQ):
            return ConstScoreQ(self.rewrite(node.child), boost=node.boost)
        if isinstance(node, BoostQ):
            return BoostQ(self.rewrite(node.child), boost=node.boost)
        raise TypeError(f"unknown node {node!r}")

    def make_ctx(self, node) -> ScoreCtx:
        terms = query_terms(node)
        tstats = self.term_stats(terms)
        doc_count = self.stats["doc_count"]
        cache = norm_cache(_avgdl(self.stats["sum_total_term_freq"], doc_count))
        weights = {
            t: _idf(tstats[t][0], doc_count) for t in terms if t in tstats
        }
        phrase_weights = {}
        syn_weights = {}
        boost_weights = {}

        def walk(n):
            if isinstance(n, BoostQ):
                walk(n.child)
                if isinstance(n.child, TermQ):
                    base = weights.get(n.child.term, np.float32(0.0))
                elif isinstance(n.child, PhraseQ):
                    base = phrase_weights.get(n.child, np.float32(0.0))
                elif isinstance(n.child, SynonymQ):
                    base = syn_weights.get(n.child, np.float32(0.0))
                else:
                    raise TypeError(f"BoostQ supports leaf nodes, got {n.child!r}")
                # float32 multiply, the BM25Scorer ctor's cast point
                boost_weights[n] = np.float32(np.float32(n.boost) * base)
            elif isinstance(n, (PhraseQ, NearQ)):
                # idf summed as double over float per-term idfs, cast to float
                s = sum(float(_idf(tstats[t][0], doc_count)) for t in n.terms if t in tstats)
                phrase_weights[n] = np.float32(s)
            elif isinstance(n, SynonymQ):
                # blended stats: df = max over members (SynonymQuery.java)
                dfs = [tstats[t][0] for t in n.terms if t in tstats]
                syn_weights[n] = _idf(max(dfs), doc_count) if dfs else np.float32(0.0)
            elif isinstance(n, BoolQ):
                for c in n.must + n.should + n.must_not:
                    walk(c)
            elif isinstance(n, DisMaxQ):
                for c in n.clauses:
                    walk(c)
            elif isinstance(n, ConstScoreQ):
                walk(n.child)

        walk(node)
        return ScoreCtx(
            weights=weights, cache=cache,
            phrase_weights=phrase_weights, syn_weights=syn_weights,
            boost_weights=boost_weights,
        )

    # ---- execution ------------------------------------------------------
    def search(self, query, k: int = 10, prune: bool = True,
               with_keys: bool = True) -> pd.DataFrame:
        """Top-k. Returns pandas (gid, key, score) ordered score desc, gid asc.

        ``with_keys=False`` skips the stored-field fetch (the second job that
        joins urls/keys by gid) — (gid, score) only, for scoring-only paths.
        """
        node = parse_query(query) if isinstance(query, str) else query
        candidates = self.candidates(node, k=k, prune=prune)
        top = (
            candidates.orderBy(F.desc("score"), F.asc("gid")).limit(k).toPandas()
        )
        if not with_keys:
            return top[["gid", "score"]]
        if top.empty:
            return pd.DataFrame({"gid": [], "key": [], "score": []})
        docs_path = os.path.join(self.index_dir, "segments", "batch=*", "row_type=doc")
        keys = (
            self.spark.read.parquet(docs_path)
            .filter(F.col("gid").isin([int(g) for g in top["gid"]]))
            .select("gid", "key")
            .toPandas()
        )
        out = top.merge(keys, on="gid", how="left")
        return out[["gid", "key", "score"]]

    def doc_rows(self) -> DataFrame:
        """The docs/norms table: (seg, gid, key, doc_len, norm_b)."""
        path = os.path.join(self.index_dir, "segments", "batch=*", "row_type=doc")
        return self.spark.read.parquet(path).select("seg", "gid", "key", "doc_len", "norm_b")

    def search_after(self, query, after: "tuple[float, int]", k: int = 10,
                     depth: "int | None" = None) -> pd.DataFrame:
        """Deep paging (IndexSearcher.searchAfter / TopScoreDocCollector's
        after-doc): top-k strictly after the (score, gid) cursor in
        (score desc, gid asc) order.

        ``depth`` = the cursor's global rank (e.g. pages_seen * k) enables
        pruned execution keeping the top depth+k per bucket; without it the
        candidate set is exhaustive (always correct, no pruning).
        """
        node = parse_query(query) if isinstance(query, str) else query
        a_score, a_gid = float(after[0]), int(after[1])
        if depth is None:
            cand = self.candidates(node, k=1 << 62, prune=False)
        else:
            cand = self.candidates(node, k=depth + k, prune=True)
        page = cand.filter(
            (F.col("score") < F.lit(a_score))
            | ((F.col("score") == F.lit(a_score)) & (F.col("gid") > F.lit(a_gid)))
        )
        return page.orderBy(F.desc("score"), F.asc("gid")).limit(k).toPandas()

    def candidates(self, node, k: int = 10, prune: bool = True) -> DataFrame:
        """DataFrame (gid, score) of all scored candidates (per-bucket top-k)."""
        if node is None:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        node = self.rewrite(node)
        if isinstance(node, MatchAllQ) or (
            isinstance(node, ConstScoreQ) and isinstance(node.child, MatchAllQ)
        ):
            boost = node.boost if isinstance(node, ConstScoreQ) else 1.0
            return self.doc_rows().select(
                "gid", F.lit(float(np.float32(boost))).cast("float").alias("score")
            )
        ctx = self.make_ctx(node)
        terms = {t for t in query_terms(node) if t in ctx.weights}
        if not terms:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        need_positions = _has_phrase(node)
        cols = ["seg", "term", "first_gid", "last_gid", "doc_count", "gids", "freqs", "norms",
                "imp_freqs", "imp_norms"] + (["positions"] if need_positions else [])
        scan = self._postings_df().select(*cols).filter(F.col("term").isin(list(terms)))

        qid = uuid.uuid4().hex
        if isinstance(node, TermQ):
            return self._single_term(scan, node, ctx, k, prune, qid)
        return self._bucketed(scan, node, ctx, k, prune, qid, need_positions)

    def _single_term(self, scan, node, ctx, k, prune, qid) -> DataFrame:
        weight = ctx.weights[node.term]
        cache = ctx.cache

        def kernel(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                if prune:
                    maxes = [
                        _max_score_of_impacts(f, n, weight, cache)
                        for f, n in zip(pdf["imp_freqs"], pdf["imp_norms"])
                    ]
                    theta = _theta(qid, k)
                    keep = [m >= theta for m in maxes]
                    pdf = pdf[np.array(keep, dtype=bool)]
                    if pdf.empty:
                        continue
                tp = decode_term_blocks(pdf)
                scores = _score_term(tp, weight, cache)
                if prune:
                    _offer(qid, k, scores)
                yield pd.DataFrame({"gid": tp.gids, "score": scores.astype(np.float32)})

        return scan.mapInPandas(kernel, schema=RESULT_SCHEMA)

    def _bucketed(self, scan, node, ctx, k, prune, qid, need_positions) -> DataFrame:
        max_gid = max(self.stats.get("max_gid", 0), 0)
        # bucket width: aim for ~256 buckets, at least one 128-block span
        width = max(128, (max_gid + 256) // 256)
        with_bucket = scan.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    (F.col("first_gid") / width).cast("long"),
                    (F.col("last_gid") / width).cast("long"),
                )
            ),
        )
        cache = ctx.cache
        weights = ctx.weights

        def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
            bucket = int(key[0])
            lo, hi = bucket * width, (bucket + 1) * width
            theta = _theta(qid, k) if prune else float("-inf")
            if prune:
                term_maxes: dict[str, float] = {}
                for t, grp in pdf.groupby("term", sort=False):
                    m = max(
                        _max_score_of_impacts(f, n, weights[t], cache)
                        for f, n in zip(grp["imp_freqs"], grp["imp_norms"])
                    )
                    term_maxes[t] = m
                if _plan_upper_bound(node, term_maxes, ctx) < theta:
                    return pd.DataFrame({"gid": [], "score": []}).astype(
                        {"gid": np.int64, "score": np.float32}
                    )
            postings: dict[str, TermPostings] = {}
            for t, grp in pdf.groupby("term", sort=False):
                tp = decode_term_blocks(grp, need_positions=need_positions)
                mask = (tp.gids >= lo) & (tp.gids < hi)
                postings[t] = TermPostings(
                    tp.gids[mask],
                    tp.freqs[mask],
                    tp.norms[mask],
                    [p for p, m in zip(tp.positions, mask) if m] if need_positions else None,
                )
            gids, scores = eval_plan(node, postings, ctx)
            if len(gids) > k:
                part = np.argpartition(-scores.astype(np.float64), k - 1)[:k]
                # keep exact tie-break: sort kept candidates by (-score, gid)
                # but argpartition may split ties arbitrarily — include ties at kth
                kth = scores[part].min()
                keep = scores >= kth
                gids, scores = gids[keep], scores[keep]
            if prune and len(scores):
                _offer(qid, k, scores)
            return pd.DataFrame({"gid": gids, "score": scores.astype(np.float32)})

        return with_bucket.groupBy("bucket").applyInPandas(kernel, schema=RESULT_SCHEMA)

    def postings(self, term: str) -> DataFrame:
        """Decoded posting list of one term: (gid, freq, norm_b, doc_len-ish).

        TermsEnum.postings() analog; a mapInPandas decode over the pruned
        block scan.
        """
        scan = self._postings_df().select(
            "term", "first_gid", "gids", "freqs", "norms"
        ).filter(F.col("term") == term)

        def kernel(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                tp = decode_term_blocks(pdf)
                yield pd.DataFrame(
                    {"gid": tp.gids, "freq": tp.freqs, "norm_b": tp.norms.astype(np.int32)}
                )

        schema = T.StructType(
            [
                T.StructField("gid", T.LongType()),
                T.StructField("freq", T.LongType()),
                T.StructField("norm_b", T.IntegerType()),
            ]
        )
        return scan.mapInPandas(kernel, schema=schema)

    def count(self, query) -> int:
        """TotalHitCountCollector analog."""
        node = parse_query(query) if isinstance(query, str) else query
        if node is None:
            return 0
        node = self.rewrite(node)
        if isinstance(node, MatchAllQ):
            return int(self.doc_rows().count())
        if isinstance(node, TermQ):
            # no decode needed: block doc counts sum exactly
            row = (
                self._postings_df()
                .filter(F.col("term") == node.term)
                .agg(F.sum("doc_count").alias("n"))
                .collect()[0]
            )
            return int(row["n"] or 0)
        df = self.candidates(node, k=1 << 62, prune=False)
        return df.count()

    # ---- field collectors (TopFieldCollector / facets / grouping) ------

    def search_sorted(self, query, by: str = "doc_len", k: int = 10,
                      ascending: bool = False) -> DataFrame:
        """Sort-by-field top-k over the match set (TopFieldCollector.java
        analog): order by the doc-values column, ties by gid asc. Scoring is
        skipped conceptually (Lucene passes needsScores=false); candidates
        are computed unpruned since θ-pruning only applies to score order.
        """
        node = parse_query(query) if isinstance(query, str) else query
        cand = self.candidates(node, k=1 << 62, prune=False).select("gid").distinct()
        order = F.asc(by) if ascending else F.desc(by)
        return (
            cand.join(self.doc_rows().select("gid", by), "gid")
            .orderBy(order, F.asc("gid"))
            .limit(k)
        )

    def facet_counts(self, query, dim_df: DataFrame, dim_col: str,
                     key_col: str = "key") -> DataFrame:
        """Per-dimension match counts (FacetsCollector + facet counting,
        lucene/facet): match set → broadcast-join the dimension table on the
        doc key → groupBy(dim).count(). The dim table join is the
        taxonomy-ordinal lookup analog."""
        node = parse_query(query) if isinstance(query, str) else query
        cand = self.candidates(node, k=1 << 62, prune=False).select("gid").distinct()
        keyed = cand.join(self.doc_rows().select("gid", "key"), "gid")
        dims = dim_df.select(
            F.col(key_col).cast("string").alias("key"), F.col(dim_col).alias("dim")
        )
        return (
            keyed.join(F.broadcast(dims), "key")
            .groupBy("dim")
            .agg(F.count("*").alias("n"))
        )

    def grouped_topk(self, query, dim_df: DataFrame, dim_col: str,
                     k_per_group: int = 2, key_col: str = "key") -> DataFrame:
        """Top-k docs per group by BM25 score (grouping module analog,
        lucene/grouping FirstPass/SecondPassGroupingCollector): window rank
        over (group, score desc, gid asc)."""
        from pyspark.sql import Window

        node = parse_query(query) if isinstance(query, str) else query
        cand = self.candidates(node, k=1 << 62, prune=False)
        keyed = cand.join(self.doc_rows().select("gid", "key"), "gid")
        dims = dim_df.select(
            F.col(key_col).cast("string").alias("key"), F.col(dim_col).alias("dim")
        )
        w = Window.partitionBy("dim").orderBy(F.desc("score"), F.asc("gid"))
        return (
            keyed.join(F.broadcast(dims), "key")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k_per_group)
            .select("dim", "gid", "score", "rn")
        )


def _has_phrase(node) -> bool:
    if isinstance(node, (PhraseQ, NearQ)):
        return True
    if isinstance(node, BoolQ):
        return any(_has_phrase(c) for c in node.must + node.should + node.must_not)
    if isinstance(node, DisMaxQ):
        return any(_has_phrase(c) for c in node.clauses)
    if isinstance(node, (ConstScoreQ, BoostQ)):
        return _has_phrase(node.child)
    return False
