"""Realtime push delivery — subscription matching at ingest time.

Reference: ``MiruRealtimeDelivery`` / ``RoutingBirdRealtimeDelivery``
(``miru-service/.../realtime/RoutingBirdRealtimeDelivery.java``): as
activities are ingested, their ids are pushed to registered delivery
endpoints, with a staleness cutoff
(``dropRealtimeDeliveryOlderThanNMillis``) so a partition rebuilding
from old history does not replay ancient updates to live consumers.

Spark-native shape: a Structured-Streaming ``foreachBatch`` sink. Each
registered subscription is a query string compiled ONCE to a boolean
column predicate (``query.filters.row_predicate`` — array_contains /
exists over the batch's token arrays plus typed metadata predicates);
every micro-batch is matched against ALL subscriptions in one pass
(union of per-subscription filters over one cached tokenized batch) and
matches append to a per-subscription delivery log (parquet partitioned
by sub_id — the "endpoint"; swap the writer for an HTTP push in a
deployment with network egress). Exactly-once across restarts comes
from the stream checkpoint; the delivery log is append-only exactly
like the reference's at-least-once POST with consumer-side dedupe on
(sub_id, conv_id, turn_idx).

Staleness: rows older than ``drop_older_than`` (Spark interval string)
relative to the BATCH's max event time are dropped — the watermark-free
equivalent of dropRealtimeDeliveryOlderThanNMillis that stays
deterministic in tests (no wall clock).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miru_spark.query.filters import row_predicate
from miru_spark.query.parser import parse_query
from miru_spark.tokenize import tokens_col
from miru_spark.transcripts import SCHEMA


def match_subscriptions(
    batch: DataFrame,
    subscriptions: list[tuple[str, str]],
    drop_older_than: str | None = None,
) -> DataFrame:
    """(sub_id, conv_id, turn_idx, ts) matches of ``batch`` rows against
    every subscription query. One tokenize pass, one output relation."""
    parsed = [(sid, parse_query(q)) for sid, q in subscriptions]
    b = batch.withColumn("_toks", tokens_col("text"))
    if drop_older_than is not None:
        cutoff = b.agg(F.max("ts").alias("mx")).select(
            (F.col("mx") - F.expr(f"INTERVAL {drop_older_than}")).alias("cut")
        )
        b = b.crossJoin(F.broadcast(cutoff)).where(F.col("ts") >= F.col("cut"))
    outs = [
        b.where(row_predicate(node, F.col("_toks"))).select(
            F.lit(sid).alias("sub_id"), "conv_id", "turn_idx", "ts"
        )
        for sid, node in parsed
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def deliver_stream(
    spark: SparkSession,
    input_dir: str,
    subscriptions: list[tuple[str, str]],
    out_dir: str,
    checkpoint_dir: str,
    drop_older_than: str | None = None,
    available_now: bool = True,
):
    """Tail ``input_dir`` (parquet transcript turns) and append matches
    per subscription to ``out_dir`` (parquet, partitioned by sub_id).
    Returns the StreamingQuery."""
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def sink(batch: DataFrame, epoch_id: int) -> None:
        rows = batch.dropDuplicates(["conv_id", "turn_idx"])
        out = match_subscriptions(rows, subscriptions, drop_older_than)
        (
            out.write.mode("append")
            .partitionBy("sub_id")
            .parquet(out_dir)
        )

    writer = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
