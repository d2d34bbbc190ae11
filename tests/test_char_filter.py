"""char_filter="html": index web pages straight off the raw html column.

Covers: rich-corpus extraction invariant (html_strip(html) == text,
byte-identical — the BASELINE.json per-row invariant exercised through the
real HTMLStripCharFilter port), invert-equivalence between (html,
char_filter) and (extracted text, no filter), and offset correction: with
``with_offsets`` the stored token offsets point into the ORIGINAL html.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.operators import indexer
from lucene_spark.operators.search import Searcher
from lucene_spark.sources.webtext import extract_text, generate_pages_pdf

N_DOCS = 150


@pytest.fixture(scope="module")
def rich_pdf():
    pdf = generate_pages_pdf(0, N_DOCS, seed=23, rich=True)
    pdf = pdf.sort_values("url", kind="mergesort").reset_index(drop=True)
    pdf["gid"] = np.arange(len(pdf), dtype=np.int64)
    pdf["html_str"] = [h.decode("utf-8") for h in pdf["html"]]
    return pdf


def test_rich_extraction_invariant(rich_pdf):
    for h, t in zip(rich_pdf["html"], rich_pdf["text"]):
        assert extract_text(h) == t  # str equality == byte equality (utf-8)


def test_invert_equivalence(rich_pdf):
    """(html, char_filter='html') inverts to exactly the rows of (text, -)."""
    gids = rich_pdf["gid"].to_numpy()
    keys = rich_pdf["url"].to_numpy()
    a = indexer.invert_segment(
        0, gids, keys, rich_pdf["html_str"], char_filter="html"
    )
    b = indexer.invert_segment(0, gids, keys, rich_pdf["text"])
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def html_index(spark, rich_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_html"))
    df = spark.createDataFrame(rich_pdf[["gid", "url", "html_str"]])
    indexer.build_index(
        spark, df, d, key_col="url", text_col="html_str", gid_col="gid",
        n_segments=3, with_offsets=True, char_filter="html",
    )
    return d


def test_char_filter_search_matches_text_index(spark, rich_pdf, html_index, tmp_path_factory):
    d2 = str(tmp_path_factory.mktemp("idx_text"))
    df = spark.createDataFrame(rich_pdf[["gid", "url", "text"]])
    indexer.build_index(
        spark, df, d2, key_col="url", text_col="text", gid_col="gid",
        n_segments=3,
    )
    s_html = Searcher(spark, html_index)
    s_text = Searcher(spark, d2)
    for q in ("t0003", "t0001 t0021", '"t0000 that"'):
        a = s_html.search(q, k=10, with_keys=False)
        b = s_text.search(q, k=10, with_keys=False)
        assert a.values.tolist() == b.values.tolist(), q
        assert len(a) == 10, q


def test_offsets_point_into_original_html(spark, rich_pdf, html_index):
    htmls = dict(zip(rich_pdf["gid"], rich_pdf["html_str"]))
    for term in ("t0003", "page"):
        pdf = Searcher(spark, html_index).term_offsets(term).toPandas()
        assert len(pdf) > 0, term
        for gid, start, end in zip(pdf["gid"], pdf["start_off"], pdf["end_off"]):
            # start offsets land exactly on the token in the ORIGINAL html;
            # an end offset abutting removed markup extends past it — the
            # reference's BaseCharFilter does the same (its doTestOffsets
            # pins start offsets only), so we assert end >= token end.
            assert htmls[int(gid)][int(start):int(start) + len(term)].lower() == term, (
                term, gid, start, end,
            )
            assert int(end) >= int(start) + len(term)


def test_char_filter_append_guard(spark, rich_pdf, html_index):
    df = spark.createDataFrame(rich_pdf[["gid", "url", "html_str"]])
    with pytest.raises(ValueError, match="char_filter"):
        indexer.build_index(
            spark, df, html_index, key_col="url", text_col="html_str",
            gid_col="gid", n_segments=2, append=True, with_offsets=True,
        )


def test_unknown_char_filter_rejected():
    with pytest.raises(ValueError, match="char_filter"):
        indexer.invert_segment(
            0, np.array([0]), np.array(["k"]), pd.Series(["a b"]),
            char_filter="nope",
        )
