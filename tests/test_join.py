"""Parent/child join operators (lucene/join analog)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(spark):
    import __spark_entry__ as entry

    from lucene_spark.operators.search import Searcher

    return Searcher(spark, entry._index_for(spark, SF))


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_to_parent_join_modes(spark, searcher):
    from lucene_spark.operators.join import to_parent_join

    pmap = _docs(spark).select(
        "doc_id", (F.col("doc_id") / 7).cast("long").alias("parent_id")
    )
    child = searcher.candidates(
        __import__("lucene_spark.plans.query", fromlist=["parse_query"]).parse_query(
            "merge OR window"
        ),
        k=1 << 62, prune=False,
    ).toPandas()
    child["parent_id"] = child["gid"] // 7
    for mode in ("max", "total", "avg", "min"):
        got = to_parent_join(
            searcher, "merge OR window", pmap, score_mode=mode, k=5, gid_col="doc_id"
        ).toPandas()
        grp = child.groupby("parent_id")["score"]
        if mode == "max":
            want = grp.max()
        elif mode == "min":
            want = grp.min()
        elif mode == "total":
            want = grp.apply(lambda s: np.float32(s.astype(np.float64).sum()))
        else:
            want = grp.apply(
                lambda s: np.float32(s.astype(np.float64).sum() / len(s))
            )
        want = want.sort_values(ascending=False)
        order = sorted(
            want.items(), key=lambda kv: (-float(np.float32(kv[1])), kv[0])
        )[:5]
        assert list(got["parent_id"]) == [p for p, _ in order], mode
        for gs, (_, ws) in zip(got["score"], order):
            assert np.float32(gs) == np.float32(ws), mode


def test_query_time_join(spark, searcher):
    from lucene_spark.operators.join import query_time_join

    d = _docs(spark).select("doc_id", "lang")
    got = query_time_join(
        searcher, "merge AND window", d, d,
        from_gid_col="doc_id", value_col="lang",
    )
    match_gids = {
        int(r["gid"])
        for r in searcher.candidates(
            __import__("lucene_spark.plans.query", fromlist=["parse_query"]).parse_query(
                "merge AND window"
            ),
            k=1 << 62, prune=False,
        ).select("gid").collect()
    }
    langs = {
        r["lang"] for r in d.filter(F.col("doc_id").isin(list(match_gids))).collect()
    }
    want = d.filter(F.col("lang").isin(list(langs))).count()
    assert got.count() == want
