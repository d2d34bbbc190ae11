"""Structured-field analytics over the events table.

Lucene counterparts: numeric/temporal range filtering is PointRangeQuery
(BKD tree, core/search/PointRangeQuery.java) — in Spark a plain ``between``
whose predicate pushes into the Parquet scan (row-group min/max stats play
the BKD role); per-dimension counting after a match is the facets module;
scalar expressions over stored values are the expressions module
(lucene/expressions JavascriptCompiler) — here ordinary Spark SQL exprs,
JVM-side and codegen'd.

Money-like doubles aggregate as integer cents so sums are order-independent
and reproduce exactly on any engine/partitioning (double summation is not
associative; don't hash-compare it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["events", "event_range_agg", "event_hourly_rollup", "event_json_stats"]


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("long")


def event_range_agg(
    spark: SparkSession, sf_dir: str, lo: str, hi: str
) -> DataFrame:
    """Aggregates per event_type over a [lo, hi) timestamp range.

    The ts predicate reaches the Parquet scan (PushedFilters) — row-group
    pruning on a time-sorted table is the BKD/PointRangeQuery analog.
    """
    e = events(spark, sf_dir)
    return (
        e.filter((F.col("ts") >= F.lit(lo).cast("timestamp"))
                 & (F.col("ts") < F.lit(hi).cast("timestamp")))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(_cents(F.col("value"))).alias("sum_cents"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


def event_hourly_rollup(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    """Tumbling-hour rollup for one event type (hypertable-style time bucket;
    batch analog of a streaming tumbling window)."""
    e = events(spark, sf_dir)
    return (
        e.filter(F.col("event_type") == event_type)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(F.count("*").alias("n"), F.sum(_cents(F.col("value"))).alias("sum_cents"))
    )


def event_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction over the props column + per-type aggregation."""
    e = events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"), F.max("k").alias("max_k"))
    )
