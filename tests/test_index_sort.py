"""Index-time sorting (IndexWriterConfig.setIndexSort analog) and the
early-terminating sorted collection over it.

Contract mirrored from the reference: the index sort is fixed at creation
(IndexWriterConfig.setIndexSort), docID order within a segment follows the
sort (core/index/IndexSorter.java), and a query sorting by the same field
early-terminates per leaf (TopFieldCollector canEarlyTerminate).
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.operators.indexer import SEG_SHIFT, build_index
from lucene_spark.operators.search import Searcher

SF_DIR = "/root/testdata/sf0.001"
SORT_EXPR = "n_chars * 100000 + doc_id"


@pytest.fixture(scope="module")
def sorted_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx") / "sorted")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    build_index(
        spark, docs, idx, key_col="doc_id", text_col="text",
        n_segments=4, sort_by=SORT_EXPR,
    )
    return idx


def test_sorted_head_equals_full_sort(spark, sorted_idx):
    """sorted_index_topk == brute-force global sort of the whole doc
    table, values included."""
    s = Searcher(spark, sorted_idx)
    got = s.sorted_index_topk(k=10).toPandas()
    want = (
        s.doc_rows().select("gid", "key")
        .join(
            spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .select(
                F.col("doc_id").cast("string").alias("key"),
                F.expr(SORT_EXPR).cast("long").alias("sv"),
            ),
            "key",
        )
        .orderBy(F.asc("sv"), F.asc("gid"))
        .limit(10)
        .toPandas()
    )
    assert got["key"].tolist() == want["key"].tolist()
    assert got["sort_val"].tolist() == want["sv"].tolist()


def test_gid_order_is_sort_order(spark, sorted_idx):
    """Within every segment, gids ascend exactly with the sort key."""
    pdf = (
        spark.read.parquet(
            os.path.join(sorted_idx, "segments", "batch=*", "row_type=doc")
        ).select("seg", "gid", "sort_val").toPandas()
    )
    for _, grp in pdf.groupby("seg"):
        grp = grp.sort_values("gid")
        sv = grp["sort_val"].to_numpy()
        assert (np.diff(sv) >= 0).all()
        base = int(grp["seg"].iloc[0]) << SEG_SHIFT
        assert (grp["gid"].to_numpy()
                == base + np.arange(len(grp), dtype=np.int64)).all()


def test_check_index_passes_on_sorted(spark, sorted_idx):
    """The integrity audit accepts a sort_by index (the extra doc-row
    column and the sorted gid assignment change nothing it validates)."""
    from lucene_spark.operators.check import check_index

    report = check_index(spark, sorted_idx)
    assert report.get("healthy", False), report


def test_sorted_head_with_deletes(spark, sorted_idx, tmp_path):
    """Deleting docs widens the per-segment head ranges; the result still
    equals the live-docs brute-force sort."""
    import shutil

    from lucene_spark.operators.indexer import delete_docs

    idx = str(tmp_path / "sorted_del")
    shutil.copytree(sorted_idx, idx)
    s0 = Searcher(spark, sorted_idx)
    # delete the current global top-5 so the head must reach deeper
    top = s0.sorted_index_topk(k=5).toPandas()
    delete_docs(spark, idx, gids=[int(g) for g in top["gid"]])
    s = Searcher(spark, idx)
    got = s.sorted_index_topk(k=10).toPandas()
    assert not (set(got["key"]) & set(top["key"]))
    full = s0.sorted_index_topk(k=20).toPandas()
    want = full[~full["key"].isin(set(top["key"]))].head(10)
    assert got["key"].tolist() == want["key"].tolist()


def test_sorted_head_plan_pushes_gid_ranges(spark, sorted_idx):
    """The head scan's gid-range predicate reaches the Parquet scan
    (PushedFilters), so row groups outside each segment's head prune."""
    df = Searcher(spark, sorted_idx).sorted_index_topk(k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "gid" in plan


def test_sort_by_rejects_fixed_gids(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    with pytest.raises(ValueError, match="engine-assigned"):
        build_index(
            spark, docs, "/tmp/never_written_idx", key_col="doc_id",
            text_col="text", gid_col="doc_id", sort_by="n_chars",
        )
    with pytest.raises(ValueError, match="sparse"):
        build_index(
            spark, docs, "/tmp/never_written_idx", key_col="doc_id",
            text_col="text", dense_gids=True, sort_by="n_chars",
        )


def test_append_must_keep_sort(spark, sorted_idx, tmp_path):
    """Appending with a different (or missing) sort errors — the index
    sort is fixed at creation (IndexWriterConfig.setIndexSort)."""
    import shutil

    idx = str(tmp_path / "sorted_app")
    shutil.copytree(sorted_idx, idx)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    extra = docs.limit(50).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    with pytest.raises(ValueError, match="sorted by"):
        build_index(
            spark, extra, idx, key_col="doc_id", text_col="text",
            n_segments=2, append=True,
        )
    # same sort: append succeeds and the head still early-terminates
    build_index(
        spark, extra, idx, key_col="doc_id", text_col="text",
        n_segments=2, append=True, sort_by=SORT_EXPR,
    )
    got = Searcher(spark, idx).sorted_index_topk(k=10).toPandas()
    assert len(got) == 10
    assert (np.diff(got["sort_val"].to_numpy()) >= 0).all()
