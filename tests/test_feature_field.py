"""FeatureField / FeatureQuery semantics
(core/document/FeatureField.java): freq quantization, the four scoring
functions' float cast points, and the BM25+feature SHOULD combination."""

import math

import numpy as np
import pytest

import __spark_entry__ as entry
from lucene_spark.operators.feature_field import (
    build_features, decode_feature_values, encode_feature_values,
    feature_boosted_topk, feature_topk,
)
from lucene_spark.operators.search import Searcher
from lucene_spark.plans.query import TermQ

SF = "/root/testdata/sf0.001"


def test_encode_decode_quantization():
    """encode = floatToIntBits >>> 15; decode = intBitsToFloat(tf << 15)
    — 9 significand bits survive (java:165-166, 209-219)."""
    vals = np.array([1.0, 3.0, 256.0, 0.5, 1e-6, 123456.789], np.float32)
    freq = encode_feature_values(vals)
    dec = decode_feature_values(freq)
    # exact small values round-trip
    assert dec[0] == 1.0 and dec[1] == 3.0 and dec[2] == 256.0
    # quantization truncates the low 15 mantissa bits (toward zero)
    for v, d in zip(vals, dec):
        assert d <= v  # truncation never rounds up
        bits = np.float32(v).view(np.int32)
        assert np.int32((bits >> 15) << 15).view(np.float32) == d
    # monotone: order preserved
    assert list(np.argsort(dec)) == list(np.argsort(vals))


def test_encode_validation():
    with pytest.raises(ValueError):
        encode_feature_values(np.array([float("inf")], np.float32))
    with pytest.raises(ValueError):
        encode_feature_values(np.array([0.0], np.float32))
    with pytest.raises(ValueError):
        encode_feature_values(np.array([-1.0], np.float32))
    with pytest.raises(ValueError):
        encode_feature_values(np.array([1e-40], np.float32))  # subnormal


def _java_scores(vals, function, weight, **p):
    """Reference replay of the FeatureFunction SimScorers (java:231-456)
    with numpy float32 at the same cast points."""
    w = np.float32(weight)
    out = []
    for s in np.asarray(vals, np.float32):
        if function == "linear":
            out.append(np.float32(w * s))
        elif function == "log":
            a = np.float32(p["scaling_factor"])
            out.append(np.float32(
                float(w) * math.log(float(np.float32(a + s)))
            ))
        elif function == "saturation":
            k = np.float32(p["pivot"])
            t = np.float32(
                w * np.float32(
                    np.float32(1.0) - np.float32(k / np.float32(s + k))
                )
            )
            out.append(t)
        elif function == "sigmoid":
            k, a = float(p["pivot"]), float(p["exp"])
            ppa = math.pow(k, a)
            out.append(np.float32(
                float(w) * (1.0 - ppa / (math.pow(float(s), a) + ppa))
            ))
    return out


@pytest.fixture(scope="module")
def feat_path(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("feat") / "features")
    rows = [("pr", g, float(v)) for g, v in
            [(0, 1.0), (1, 3.5), (2, 10.0), (3, 0.25), (4, 77.0)]]
    rows += [("age", 0, 2.0), ("age", 1, 5.0)]
    df = spark.createDataFrame(
        [(f, g, v) for f, g, v in rows],
        "feature string, gid long, value float",
    )
    build_features(spark, df, out)
    return out


@pytest.mark.parametrize("function,params", [
    ("linear", {}),
    ("log", {"scaling_factor": 1.5}),
    ("saturation", {"pivot": 4.0}),
    ("sigmoid", {"pivot": 4.0, "exp": 2.0}),
])
def test_function_scores_match_java_replay(spark, feat_path, function,
                                           params):
    got = {
        r["gid"]: r["score"]
        for r in feature_topk(spark, feat_path, "pr", function,
                              k=10, weight=1.5, **params).collect()
    }
    vals = {0: 1.0, 1: 3.5, 2: 10.0, 3: 0.25, 4: 77.0}
    dec = decode_feature_values(
        encode_feature_values(np.array(list(vals.values()), np.float32))
    )
    want = _java_scores(dec, function, 1.5, **params)
    assert set(got) == set(vals)
    for g, w in zip(vals, want):
        assert np.float32(got[g]) == w, (g, got[g], w)


def test_feature_filter_scopes_rows(spark, feat_path):
    got = feature_topk(spark, feat_path, "age", "linear", k=10).collect()
    assert sorted(r["gid"] for r in got) == [0, 1]


def test_weight_and_param_validation(spark, feat_path):
    with pytest.raises(ValueError):
        feature_topk(spark, feat_path, "pr", "linear", weight=65.0)
    with pytest.raises(ValueError):
        feature_topk(spark, feat_path, "pr", "log", scaling_factor=0.5)
    with pytest.raises(ValueError):
        feature_topk(spark, feat_path, "pr", "saturation", pivot=0.0)
    with pytest.raises(ValueError):
        feature_topk(spark, feat_path, "pr", "sigmoid", pivot=1.0,
                     exp=-1.0)


def test_boosted_combination_exact(spark, tmp_path):
    """BM25 MUST + feature SHOULD: score = f32(bm25 + fscore); docs
    without the feature keep the bare BM25 score (java:90-99)."""
    s = Searcher(spark, entry._index_for(spark, SF))
    base = s.search(TermQ("merge"), k=10**6, prune=False,
                    with_keys=False)
    # feature only on half the matching docs
    gids = [int(g) for g in base.gid[: len(base) // 2]]
    df = spark.createDataFrame(
        [("pr", g, float((g % 5) + 1)) for g in gids],
        "feature string, gid long, value float",
    )
    out = str(tmp_path / "feat")
    build_features(spark, df, out)
    got = feature_boosted_topk(
        s, TermQ("merge"), out, "pr", "saturation",
        k=10, pivot=2.0, weight=3.0,
    ).collect()
    dec = {g: decode_feature_values(
        encode_feature_values(np.array([(g % 5) + 1], np.float32)))[0]
        for g in gids}
    comp = []
    for g, sc in zip(base.gid, base.score):
        f = (_java_scores([dec[int(g)]], "saturation", 3.0, pivot=2.0)[0]
             if int(g) in dec else np.float32(0.0))
        comp.append((int(g), np.float32(np.float64(sc) + np.float64(f))))
    comp.sort(key=lambda x: (-x[1], x[0]))
    assert [(int(r["gid"]), np.float32(r["score"])) for r in got] \
        == comp[:10]
