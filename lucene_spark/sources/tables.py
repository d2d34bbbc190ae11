"""Input-table adapter: filesystem Parquet directories or catalog tables.

The production deployment reads Common-Crawl-style pages from an Iceberg
table (BASELINE north rule); Iceberg tables are addressed in Spark by a
catalog identifier (``catalog.db.pages``) and read through
``spark.read.table`` — the Iceberg runtime registered via
``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...``
plugs into exactly that call, giving snapshot isolation, hidden-partition
pruning, and metadata-level file skipping with no engine change here.
This container ships no Iceberg JAR, so tests cover the adapter with
temp-view and Parquet-dir inputs; the dispatch itself is the same code
path a cluster run takes.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

# catalog identifiers: dotted or bare names, no path separators / globs
_IDENT_RE = re.compile(r"^\w+(\.\w+)*$")


def is_table_identifier(source: str) -> bool:
    """True when ``source`` names a catalog table (Iceberg / temp view /
    metastore) rather than a filesystem path. Anything with a path
    separator, scheme, or glob is a path; a dotted or bare identifier
    that exists in the catalog — or is dotted (multi-part names are never
    bare relative dirs in our CLI contract) — is a table."""
    if "/" in source or os.sep in source or "*" in source or ":" in source:
        return False
    return bool(_IDENT_RE.match(source))


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Load the input pages table from a catalog identifier or Parquet dir.

    ``catalog.db.pages`` (Iceberg on a configured cluster, or any
    metastore table / temp view) → ``spark.read.table``; a filesystem
    path → ``spark.read.parquet``. Iceberg time travel works through the
    standard option plumbing (``spark.read.option("snapshot-id", ...)
    .table(...)``) if callers need it; this helper keeps the default
    current-snapshot read.
    """
    if is_table_identifier(source):
        return spark.read.table(source)
    return spark.read.parquet(source)
