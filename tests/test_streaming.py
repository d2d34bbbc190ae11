"""NRT incremental indexing: file-source stream → foreachBatch append.

Mirrors Lucene NRT semantics: a searcher re-opened after each drain sees
exactly the committed docs (DirectoryReader.openIfChanged), the stream
checkpoint guarantees files index once, and appended segments never
collide with earlier gids.
"""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.operators.search import Searcher
from lucene_spark.sources.webtext import generate_pages_pdf
from lucene_spark.streaming.nrt import stream_index


@pytest.mark.parametrize("n1,n2", [(120, 80)])
def test_stream_drain_then_append(spark, tmp_path, n1, n2):
    inp = str(tmp_path / "pages")
    idx = str(tmp_path / "idx")
    os.makedirs(inp)

    pdf1 = generate_pages_pdf(0, n1)
    spark.createDataFrame(pdf1).write.mode("append").parquet(inp)
    q = stream_index(spark, inp, idx, segments_per_batch=3)
    q.awaitTermination(120)
    s1 = Searcher(spark, idx)
    assert s1.doc_rows().count() == n1
    hits1 = s1.search("t0000", k=5)

    # second wave of files → only the new ones index (checkpoint dedup)
    pdf2 = generate_pages_pdf(n1, n1 + n2)
    spark.createDataFrame(pdf2).write.mode("append").parquet(inp)
    q = stream_index(spark, inp, idx, segments_per_batch=3)
    q.awaitTermination(120)

    s2 = Searcher(spark, idx)
    docs = s2.doc_rows()
    assert docs.count() == n1 + n2
    # no gid collisions across appended segment generations
    assert docs.select("gid").distinct().count() == n1 + n2
    # all urls present exactly once
    assert docs.select("key").distinct().count() == n1 + n2
    # stats refreshed: re-opened searcher sees the grown corpus
    assert s2.stats["doc_count"] >= s1.stats["doc_count"]
    hits2 = s2.search("t0000", k=5)
    assert len(hits2) >= len(hits1)
