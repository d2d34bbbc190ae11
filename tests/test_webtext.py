"""Synthetic pages corpus: determinism + the html→text byte-identity invariant."""

import pandas as pd

from lucene_spark.sources.webtext import extract_text, generate_pages_pdf


def test_extraction_byte_identical_per_url():
    pdf = generate_pages_pdf(0, 200)
    for html, text in zip(pdf["html"], pdf["text"]):
        assert extract_text(html) == text  # str equality == byte equality (utf-8)
        assert extract_text(html).encode("utf-8") == bytes(html)[12:-14]


def test_generation_chunking_invariant():
    """A row's content depends only on (i, seed) — any chunking agrees."""
    whole = generate_pages_pdf(0, 120)
    parts = pd.concat(
        [generate_pages_pdf(0, 37), generate_pages_pdf(37, 90), generate_pages_pdf(90, 120)],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(whole, parts)


def test_seed_changes_content():
    a = generate_pages_pdf(0, 10, seed=1)
    b = generate_pages_pdf(0, 10, seed=2)
    assert (a["text"] != b["text"]).any()


def test_read_pages_dispatch(spark, tmp_path):
    """Input adapter: a catalog identifier (how Iceberg tables are
    addressed) reads via the session catalog; a path reads Parquet."""
    from lucene_spark.sources.tables import is_table_identifier, read_pages
    from lucene_spark.sources.webtext import pages_df

    assert is_table_identifier("catalog.db.pages")
    assert is_table_identifier("pages_view")
    assert not is_table_identifier("/root/testdata/sf0.001")
    assert not is_table_identifier("s3://bucket/pages")
    assert not is_table_identifier("dir/*.parquet")

    pages = pages_df(spark, 50, n_partitions=2)
    pages.createOrReplaceTempView("pages_adapter_view")
    via_table = read_pages(spark, "pages_adapter_view")
    assert via_table.count() == 50

    out = str(tmp_path / "pages_pq")
    pages.write.parquet(out)
    via_path = read_pages(spark, out)
    assert via_path.count() == 50
    assert set(via_path.columns) == set(via_table.columns)
