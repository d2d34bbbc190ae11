"""DrillSideways semantics (facet/.../DrillSideways.java:48-90): per
drilled dimension, counts with every OTHER drill applied; '$hits' with
all of them."""

import pandas as pd
import pytest

import __spark_entry__ as entry
from lucene_spark.operators.search import Searcher

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(spark):
    return Searcher(spark, entry._index_for(spark, SF))


def _expected(spark, searcher, term, langs, sources):
    base = set(
        searcher.search(term, k=10**6, prune=False, with_keys=False).gid
    )
    docs = spark.read.parquet(SF + "/documents.parquet").toPandas()
    docs = docs[docs.doc_id.isin(base)]
    lang_counts = (
        docs[docs.source.isin(sources)].groupby("lang").size().to_dict()
    )
    src_counts = (
        docs[docs.lang.isin(langs)].groupby("source").size().to_dict()
    )
    hits = len(docs[docs.lang.isin(langs) & docs.source.isin(sources)])
    return lang_counts, src_counts, hits


def test_drill_sideways_counts(spark, searcher):
    langs, sources = ["en", "de"], ["src1", "src2", "src3"]
    docs = spark.read.parquet(SF + "/documents.parquet")
    got = searcher.drill_sideways(
        "merge",
        [("lang", docs, "lang", langs),
         ("source", docs, "source", sources)],
        key_col="doc_id",
    ).toPandas()
    lang_counts, src_counts, hits = _expected(
        spark, searcher, "merge", langs, sources
    )
    g_lang = dict(zip(*got[got.dim == "lang"][["label", "n"]].T.values))
    g_src = dict(zip(*got[got.dim == "source"][["label", "n"]].T.values))
    assert g_lang == lang_counts
    assert g_src == src_counts
    assert int(got[got.dim == "$hits"].n.iloc[0]) == hits
    # the sideways point: lang labels OUTSIDE the lang drill appear
    assert set(g_lang) - set(langs), "sideways must show near-misses"
    # but only drilled sources feed the lang counts' denominator
    assert sum(g_lang.values()) <= sum(src_counts.values()) + hits


def test_non_drilled_dim_counts_full_drill(spark, searcher):
    """A dim with values=None is counted over the FULL drill-down
    match set (plain facet counting on the DrillDownQuery)."""
    langs = ["en"]
    docs = spark.read.parquet(SF + "/documents.parquet")
    got = searcher.drill_sideways(
        "merge",
        [("lang", docs, "lang", langs),
         ("source", docs, "source", None)],
        key_col="doc_id",
    ).toPandas()
    base = set(
        searcher.search("merge", k=10**6, prune=False, with_keys=False).gid
    )
    pdf = spark.read.parquet(SF + "/documents.parquet").toPandas()
    pdf = pdf[pdf.doc_id.isin(base)]
    want_src = pdf[pdf.lang.isin(langs)].groupby("source").size().to_dict()
    g_src = dict(zip(*got[got.dim == "source"][["label", "n"]].T.values))
    assert g_src == want_src
    # lang sideways ignores its own drill and the non-drill is no filter
    want_lang = pdf.groupby("lang").size().to_dict()
    g_lang = dict(zip(*got[got.dim == "lang"][["label", "n"]].T.values))
    assert g_lang == want_lang


def test_missing_label_uncounted(spark, searcher):
    """Docs absent from the dim table don't count (no facet field)."""
    docs = spark.read.parquet(SF + "/documents.parquet")
    half = docs.where("doc_id % 2 = 0")
    got = searcher.drill_sideways(
        "merge", [("lang", half, "lang", None)], key_col="doc_id"
    ).toPandas()
    base = set(
        searcher.search("merge", k=10**6, prune=False, with_keys=False).gid
    )
    pdf = docs.toPandas()
    pdf = pdf[pdf.doc_id.isin(base) & (pdf.doc_id % 2 == 0)]
    want = pdf.groupby("lang").size().to_dict()
    g = dict(zip(*got[got.dim == "lang"][["label", "n"]].T.values))
    assert g == want
    # $hits unaffected: no drills applied
    assert int(got[got.dim == "$hits"].n.iloc[0]) == len(base)
