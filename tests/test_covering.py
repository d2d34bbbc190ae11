"""CoveringQuery + LatLonPoint distance-feature query
(sandbox/search/CoveringQuery.java, LatLonPointDistanceFeatureQuery.java).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from lucene_spark.operators.search import Searcher

SF = "/root/testdata/sf0.001"
TERMS = [entry.T_HOT, entry.T_MID, entry.T_B]


@pytest.fixture(scope="module")
def searcher(spark):
    return Searcher(spark, entry._index_for(spark, SF))


def _clause_scores(searcher):
    out = {}
    for t in TERMS:
        r = searcher.search(t, k=1 << 30, prune=False, with_keys=False)
        out[t] = dict(zip((int(g) for g in r.gid), map(float, r.score)))
    return out


def test_covering_matches_replay(searcher):
    """Engine == per-doc replay: minMatch = max(1, 1 + doc % 3)
    (CoveringScorer.java:138), score = f32(Σ f64 matching clauses)."""
    per = _clause_scores(searcher)
    docs = set().union(*[set(m) for m in per.values()])
    want = []
    for d in docs:
        matches = [m[d] for m in per.values() if d in m]
        if len(matches) >= max(1, 1 + d % 3):
            want.append((d, float(np.float32(math.fsum(matches)))))
    want.sort(key=lambda t: (-t[1], t[0]))
    got = searcher.covering_topk(
        TERMS, F.lit(1) + F.col("gid") % 3, k=10
    ).collect()
    assert [(r.gid, np.float32(r.score)) for r in got] == [
        (d, np.float32(s)) for d, s in want[:10]
    ]
    # minMatch clamp: a constant 0 behaves as 1 (any clause suffices)
    got0 = searcher.covering_topk(TERMS, F.lit(0), k=10).collect()
    got1 = searcher.covering_topk(TERMS, F.lit(1), k=10).collect()
    assert [(r.gid, r.score) for r in got0] == \
        [(r.gid, r.score) for r in got1]
    # minMatch = 3 requires every clause
    got3 = {r.gid for r in searcher.covering_topk(
        TERMS, F.lit(3), k=1 << 30).collect()}
    assert got3 == {d for d in docs
                    if all(d in m for m in per.values())}


def test_distance_feature_matches_replay(searcher):
    """score = f32(f64(bm25) + f64(f32(w * p/(p + haversinMeters))))
    over the decoded quantized synthetic coordinates."""
    from lucene_spark.operators.spatial import (
        LAT_DECODE, LON_DECODE, TO_METERS,
    )

    qlat, qlon, pivot, w = 10.0, 20.0, 500_000.0, 2.0
    base = searcher.search(entry.T_HOT, k=1 << 30, prune=False,
                           with_keys=False)

    def dist(doc):
        lat = math.floor(
            (((doc * 7919) % 1700000) / 10000.0 - 85.0) / LAT_DECODE
        ) * LAT_DECODE
        lon = math.floor(
            (((doc * 104729) % 3500000) / 10000.0 - 175.0) / LON_DECODE
        ) * LON_DECODE
        x1 = lat / 180.0 * math.pi
        x2 = qlat / 180.0 * math.pi
        h1 = 1.0 - math.cos(x1 - x2)
        h2 = 1.0 - math.cos((lon - qlon) / 180.0 * math.pi)
        h = h1 + math.cos(x1) * math.cos(x2) * h2
        return TO_METERS * 2.0 * math.asin(min(1.0, math.sqrt(h * 0.5)))

    want = []
    for g, s in zip(base.gid, base.score):
        boost = np.float32(w * (pivot / (pivot + dist(int(g)))))
        want.append((int(g),
                     np.float32(np.float64(s) + np.float64(boost))))
    want.sort(key=lambda t: (-t[1], t[0]))
    got = searcher.distance_feature_topk(
        entry.T_HOT, qlat, qlon, pivot, weight=w, k=10
    ).collect()
    assert [(r.gid, np.float32(r.score)) for r in got] == want[:10]
    # boost monotonicity: the feature contribution is in (0, w]
    boosts = [np.float64(s_tot) - np.float64(s_base) for (g, s_tot), s_base
              in zip(((r.gid, r.score) for r in got),
                     (dict(zip((int(x) for x in base.gid),
                               map(float, base.score)))[r.gid]
                      for r in got))]
    assert all(0.0 < b <= w + 1e-6 for b in boosts)
