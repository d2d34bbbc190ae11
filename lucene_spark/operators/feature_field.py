"""FeatureField / FeatureQuery
(lucene/core/src/java/org/apache/lucene/document/FeatureField.java).

The reference stores static per-document features (pagerank, url length,
recency, ...) as TERM FREQUENCIES of a special field: the float feature
value is quantized to 9 significand bits (``floatToIntBits(v) >>> 15``)
and written as the freq of the ``(field, featureName)`` posting. Feature
queries then score from that freq with one of four monotone functions —
linear / log / saturation / sigmoid — and are combined with text queries
as SHOULD clauses of a BooleanQuery so the static signal simply ADDS to
BM25 (FeatureField.java:40-100).

Spark-first layout: the feature "postings" are a parquet table
``(feature, gid, freq, value)`` range-sorted by (feature, gid) — the
feature filter prunes row groups exactly like a term seek, and ``value``
is the POST-quantization float32 (decoded once at build, so the query
path is pure JVM column math; ``freq`` keeps the reference's on-disk
unit for parity/debug). A pure FeatureQuery is a pushed-down scan +
projection; the boosted combination is the child query's exhaustive
scored match set (the same docs Lucene's disjunction visits) hash-joined
on gid with the feature projection — one shuffle-free broadcast/hash
join and a distributed top-k, no driver loops, however many docs carry
the feature.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

MIN_NORMAL = float(np.float32(2.0) ** -126)  # Float.MIN_NORMAL


def encode_feature_values(vals: np.ndarray) -> np.ndarray:
    """``floatToIntBits(float32(v)) >>> 15`` (FeatureField.java:165-166).
    Values must be positive, finite, normal floats (setFeatureValue,
    java:132-150)."""
    v = np.asarray(vals, dtype=np.float32)
    if not np.all(np.isfinite(v)):
        raise ValueError("featureValue must be finite")
    if np.any(v < MIN_NORMAL):
        raise ValueError(
            "featureValue must be a positive normal float (>= 2^-126)"
        )
    # sign bit is 0 for positive values, so arithmetic >> == logical >>>
    return (v.view(np.int32).astype(np.int64) >> 15).astype(np.int64)


def decode_feature_values(freqs: np.ndarray) -> np.ndarray:
    """``intBitsToFloat(freq << 15)`` (decodeFeatureValue,
    FeatureField.java:209-219) — the 9-significand-bit quantized value."""
    return (
        (np.asarray(freqs, dtype=np.int64) << 15)
        .astype(np.int32)
        .view(np.float32)
    )


def build_features(
    spark,
    entries: DataFrame,
    out_path: str,
    *,
    key_partitions: int = 1,
) -> None:
    """Write the feature table from (feature string, gid long,
    value float) rows. Quantization happens here (one Arrow-vectorized
    kernel), exactly as the reference quantizes at index time; duplicate
    (feature, gid) entries keep the max freq (last-writer semantics are
    order-dependent in Lucene — max is the deterministic analog)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            freq = encode_feature_values(pdf["value"].to_numpy())
            yield pd.DataFrame({
                "feature": pdf["feature"].to_numpy(),
                "gid": pdf["gid"].to_numpy("int64"),
                "freq": freq,
                "value": decode_feature_values(freq).astype(np.float32),
            })

    rows = entries.select(
        F.col("feature").cast("string").alias("feature"),
        F.col("gid").cast("long").alias("gid"),
        F.col("value").cast("float").alias("value"),
    ).mapInPandas(
        kernel, schema="feature string, gid long, freq long, value float"
    )
    dedup = rows.groupBy("feature", "gid").agg(
        F.max("freq").alias("freq"), F.max("value").alias("value")
    )
    (
        dedup.repartitionByRange(key_partitions, "feature", "gid")
        .sortWithinPartitions("feature", "gid")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def _f4(col):
    return col.cast("float")


def _check_weight(weight: float) -> float:
    if not (0.0 < weight <= 64.0):
        raise ValueError(f"weight must be in (0, 64], got {weight}")
    return float(np.float32(weight))


def feature_score_col(
    value_col,
    function: str,
    *,
    weight: float = 1.0,
    scaling_factor: "float | None" = None,
    pivot: "float | None" = None,
    exp: "float | None" = None,
):
    """The feature score as a Spark Column over the decoded float32
    value, float-cast at the reference's exact points:

    - ``linear``:     f32(w * S)                     (java:231-243)
    - ``log``:        f32(w * ln(f32(a + S))), a>=1  (java:304-315)
    - ``saturation``: f32(w * f32(1 - f32(p / f32(S + p)))), p>0 — all
      float32 ops (java:375-391)
    - ``sigmoid``:    f32(w * (1 - p^a / (S^a + p^a))), double math,
      one final cast (java:440-456)
    """
    w = _check_weight(weight)
    if function == "linear":
        return _f4(F.lit(w) * _f4(value_col))
    if function == "log":
        if scaling_factor is None or not (
            1.0 <= scaling_factor <= float(np.finfo(np.float32).max)
        ):
            raise ValueError("scalingFactor must be >= 1")
        a = float(np.float32(scaling_factor))
        # java: Math.log(scalingFactor + S) — float add, then double ln
        return _f4(
            F.lit(w).cast("double")
            * F.log(_f4(F.lit(a) + _f4(value_col)).cast("double"))
        )
    if function == "saturation":
        if pivot is None or not (pivot > 0 and np.isfinite(pivot)):
            raise ValueError("pivot must be in (0, +Infinity)")
        p = float(np.float32(pivot))
        t1 = _f4(_f4(value_col) + F.lit(p))
        t2 = _f4(F.lit(p) / t1)
        t3 = _f4(F.lit(np.float32(1.0)) - t2)
        return _f4(F.lit(w) * t3)
    if function == "sigmoid":
        if pivot is None or not (pivot > 0 and np.isfinite(pivot)):
            raise ValueError("pivot must be in (0, +Infinity)")
        if exp is None or not (exp > 0 and np.isfinite(exp)):
            raise ValueError("exp must be in (0, +Infinity)")
        p = float(np.float32(pivot))
        a = float(np.float32(exp))
        ppa = F.pow(F.lit(p), F.lit(a))  # pivotPa, double (java:417)
        inner = F.lit(1.0) - ppa / (
            F.pow(_f4(value_col).cast("double"), F.lit(a)) + ppa
        )
        return _f4(F.lit(w).cast("double") * inner)
    raise ValueError(f"unknown feature function: {function}")


def feature_scores(spark, path: str, feature: str, function: str,
                   **params) -> DataFrame:
    """(gid, score) for every doc carrying ``feature`` — the pure
    FeatureQuery match set (docs on the feature term's posting list).
    The feature equality filter pushes into the (feature, gid)-sorted
    parquet scan."""
    return (
        spark.read.parquet(path)
        .where(F.col("feature") == feature)
        .select(
            "gid",
            feature_score_col(F.col("value"), function, **params)
            .alias("score"),
        )
    )


def feature_topk(spark, path: str, feature: str, function: str,
                 k: int = 10, **params) -> DataFrame:
    """Standalone FeatureQuery top-k (score desc, gid asc)."""
    return (
        feature_scores(spark, path, feature, function, **params)
        .orderBy(F.desc("score"), F.asc("gid"))
        .limit(k)
    )


def feature_boosted_topk(searcher, child, path: str, feature: str,
                         function: str, k: int = 10, **params) -> DataFrame:
    """The reference's recommended pattern (FeatureField.java:90-99):
    ``BooleanQuery(MUST text query, SHOULD feature query)`` — the text
    query defines the match set, the feature score ADDS (double sum of
    the two float32 clause scores, one float32 cast, BooleanWeight's
    disjunction fold).

    The child runs exhaustive (``_ALL_K``/unpruned — the same docs
    Lucene's scorer visits when the feature clause caps WAND's bound at
    w), then one gid hash-join against the pushed-down feature
    projection and a distributed top-k. Docs without the feature keep
    the bare child score, like a SHOULD clause that doesn't match."""
    from .search import _ALL_K

    cand = searcher.candidates(child, k=_ALL_K, prune=False)
    feats = feature_scores(
        searcher.spark, path, feature, function, **params
    ).withColumnRenamed("score", "fscore")
    return (
        cand.join(feats, "gid", "left")
        .select(
            "gid",
            _f4(
                F.col("score").cast("double")
                + F.coalesce(F.col("fscore"), F.lit(np.float32(0.0)))
                .cast("double")
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("gid"))
        .limit(k)
    )
