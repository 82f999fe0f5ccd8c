"""Structured-Streaming index ingest — the reference's "sip" mode.

After rebuild, a Miru partition tails the WAL for new activities via a
sip cursor (enterstudio/miru ``MiruSipIndex.java:20-26``; the
sip-migrate thread of ``MiruLocalHostedPartition.java:572-660``).
Spark-native: the transcripts directory IS the log — a file-source
stream discovers new files exactly-once (checkpointed), and each
micro-batch appends delta segments through the SegmentStore (which
applies its own per-shard watermark, so replayed rows are no-ops).

``trigger=availableNow`` drains everything pending and stops — the
incremental-batch pattern; omit it for a long-running tail.

Late/duplicate handling mirrors the reference (``LabTimeIndex.contains``
dedupe + versioned REPAIR upsert): ``dropDuplicates`` on the doc key
inside the batch + the store's watermark across batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miru_spark.indexing.incremental import SegmentStore
from miru_spark.transcripts import SCHEMA


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    store: SegmentStore,
    checkpoint_dir: str,
    available_now: bool = True,
    compact_every: int | None = None,
    merge_factor: int = 10,
):
    """Tail ``input_dir`` (parquet files of transcript turns) into the
    segment store. Returns the StreamingQuery.

    ``compact_every=N`` runs one round of tiered compaction
    (``store.compact(merge_factor)``) after every N micro-batches — the
    reference's background chit-throttled merger folded into the ingest
    loop. A long-running sip otherwise accumulates one delta unit per
    shard per batch, and serving cost grows with unit count; the tiered
    policy bounds live units at O(merge_factor · log total) with
    O(log) write amplification, so the tail can run forever. Compaction
    is crash-atomic and idempotent, so a batch retry after a mid-compact
    crash is safe (same guarantee as the append's watermark)."""
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def sink(batch: DataFrame, epoch_id: int) -> None:
        rows = batch.dropDuplicates(["conv_id", "turn_idx"])
        store.append(rows)
        if compact_every and (int(epoch_id) + 1) % compact_every == 0:
            store.compact(merge_factor=merge_factor)

    writer = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_waveform(
    spark: SparkSession,
    input_dir: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Live time-bucketed term counts — the Analytics waveform
    (reference ``Analytics.analyze``, miru-analytics-plugins/.../
    Analytics.java:57-201) as a windowed streaming aggregation with a
    late-data watermark. Caller attaches a sink."""
    from miru_spark.tokenize import tokens_col

    src = spark.readStream.schema(SCHEMA).parquet(input_dir)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        src.withWatermark("ts", watermark)
        .select("ts", F.explode(tokens_col("text")).alias("term"))
        .groupBy(win.alias("w"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            "term",
            "n",
        )
    )
