"""Structured-streaming encode: a stream of webtext rows is encoded into
chunk-table rows micro-batch by micro-batch.

The reference's async reader is IO concurrency, not stream semantics
(src/async_arrow_reader.rs:165-190) — this module is the Spark-native
streaming surface a continuously-crawled corpus needs: readStream (file
source) -> foreachBatch(encode_table) -> append chunk parquet + manifest.

Late data needs no watermark here because encoding is row-local; the
optional `stats_stream` shows watermarked windowed aggregation over
warc_ts for monitoring (events/sec per host bucket).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.encode import encode_table
from ..sources.webtext import WEBTEXT_SCHEMA


def encode_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    plan: dict | None = None,
    trigger_once: bool = True,
    checkpoint_dir: str | None = None,
    schema=None,
):
    """Start a streaming query that encodes arriving parquet files.

    Returns the StreamingQuery; with trigger_once the query drains the
    current backlog and stops (incremental batch — the checkpoint makes
    re-runs resume where the last one left off, the streaming analog of
    the manifest in plans.pipeline).
    """
    chunks_dir = os.path.join(output_dir, "chunks")
    checkpoint_dir = checkpoint_dir or os.path.join(output_dir, "_stream_checkpoint")
    stream = (
        spark.readStream.schema(schema or WEBTEXT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # IDEMPOTENT per-batch landing: each micro-batch OVERWRITES its own
        # stream_batch_id=<id> directory, so a foreachBatch retry after a
        # partial append replaces the partial output instead of duplicating
        # chunk rows (foreachBatch is at-least-once; a blind append to one
        # shared dir double-counted on retry — code-review r6). part_id is
        # task-local and UNCHANGED: chunk identity across the whole stream
        # is (stream_batch_id, part_id, chunk_ord) — readers pass that as
        # decode group_cols — which never overflows int32 no matter how
        # long the stream runs (the old +batch_id*65536 offset hit ANSI
        # CAST_OVERFLOW at batch 32768). stream_batch_id is recovered by
        # partition discovery from the directory name.
        batch_dir = os.path.join(chunks_dir, f"stream_batch_id={int(batch_id)}")
        encode_table(batch_df, plan=plan or {}).write.mode(
            "overwrite"
        ).parquet(batch_dir)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stats_stream(spark: SparkSession, input_dir: str):
    """Watermarked per-host ingest-rate monitor (windowed agg demo)."""
    stream = (
        spark.readStream.schema(WEBTEXT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    return (
        stream.withWatermark("warc_ts", "10 minutes")
        .groupBy(F.window("warc_ts", "1 minute"), host.alias("host"))
        .agg(F.count(F.lit(1)).alias("pages"), F.sum(F.length("html")).alias("bytes"))
    )
