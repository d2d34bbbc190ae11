"""Physical-plan hygiene: the properties SCALE.md promises must show in
.explain — term filters push into the Parquet scan (term-dictionary seek)
and the positions column is pruned unless a phrase needs it."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def searcher(spark):
    import __spark_entry__ as entry
    from lucene_spark.operators.search import Searcher

    return Searcher(spark, entry._index_for(spark, "/root/testdata/sf0.001"))


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_term_filter_pushes_into_parquet_scan(searcher):
    scan = searcher._postings_df().filter(F.col("term").isin(["merge", "window"]))
    plan = _explain(scan)
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("term" in l and "merge" in l for l in pushed), pushed


def test_positions_pruned_for_boolean_query(searcher):
    from lucene_spark.plans.query import parse_query

    cand = searcher.candidates(parse_query("merge AND window"), prune=False)
    plan = _explain(cand)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    assert all("positions" not in l for l in read_schema), read_schema


def test_positions_read_for_phrase_query(searcher):
    from lucene_spark.plans.query import parse_query

    cand = searcher.candidates(parse_query('"table scan"'), prune=False)
    plan = _explain(cand)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert any("positions" in l for l in read_schema), read_schema


def test_facet_dim_join_is_broadcast(searcher, spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = searcher.facet_counts("merge", docs, "lang", key_col="doc_id")
    plan = _explain(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
