"""Near-real-time (NRT) incremental indexing via Structured Streaming.

Lucene core has no streaming operators; its incremental surface is NRT
segment refresh — ``DirectoryReader.openIfChanged`` picks up segments
committed after the reader opened (``core/index/DirectoryReader.java``).
The Spark-first mirror: a file-source stream over the pages directory,
``foreachBatch`` appending each micro-batch as NEW segments through the
same checkpointed build path (``build_index(append=True)``), so a reader
(Searcher) re-opened after a batch commit sees exactly the committed
segments — the manifest is the segments_N generation.

Scale: each micro-batch is an independent append job (no state store, no
shuffle beyond the batch's own build); the searcher merges per-batch
postings at query time until a background ``merge_index`` folds them in
(ConcurrentMergeScheduler analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.indexer import build_index
from ..sources.webtext import PAGES_SCHEMA


def stream_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    *,
    key_col: str = "url",
    text_col: str = "text",
    segments_per_batch: int = 4,
    checkpoint_dir: "str | None" = None,
    available_now: bool = True,
    schema=PAGES_SCHEMA,
):
    """Continuously index parquet files arriving under ``input_dir``.

    Returns the started StreamingQuery. ``available_now=True`` drains the
    currently-visible files and stops (test/backfill mode); False runs a
    continuous micro-batch loop. The stream's own checkpoint handles
    exactly-once file tracking; the index manifest handles segment commits,
    so a crash between the two at worst re-appends an uncommitted batch's
    files, which the manifest-driven resume then completes idempotently.
    """

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            build_index(
                batch_df.sparkSession,
                batch_df,
                index_dir,
                key_col=key_col,
                text_col=text_col,
                n_segments=segments_per_batch,
                append=True,
            )

    reader = spark.readStream.schema(schema).parquet(input_dir)
    writer = reader.writeStream.foreachBatch(append_batch).option(
        "checkpointLocation", checkpoint_dir or f"{index_dir}/_stream_checkpoint"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
