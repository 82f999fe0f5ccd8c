"""Per-conversation analytics over multi-turn transcripts.

The reference's aggregate-counts family is inbox-shaped — group docs by
a pivot and walk each group newest-first (``AggregateCounts.java:93-384``
"inbox group-by-latest"); a conversation IS the natural inbox of this
engine's payload, so these operators apply the same group-and-walk
shapes with ``conv_id`` as the stream key:

- :func:`conversation_stats` — one row per conversation with turn/role
  mix, tool-call rate, token volume, wall duration, and an SFT-validity
  flag (starts with ``user``, contiguous ``turn_idx``). The validity
  check mirrors the reference's partition sanity fences
  (``MiruPartitionedActivity`` BEGIN/END markers,
  ``miru-api/.../activity/MiruPartitionedActivity.java:12-23``): a
  stream is usable iff its id space is dense from 0.
- :func:`role_transitions` — Markov transition counts between
  consecutive turn roles (the sequential twin of gatherFeatures'
  co-occurrence permutations, ``MiruAggregateUtil.java:77-442`` — there
  features co-occur in one doc, here they *succeed* across turns).
- :func:`context_windows` — per assistant turn, the previous ``k``
  turns rendered as a single prompt-context string: the
  training-example assembly step of an SFT pipeline.

Scale notes (100 TB): every operator here shuffles ONCE on ``conv_id``
(or runs a window partitioned by it). Conversations are bounded
(``max_turns`` is a schema-level invariant, 24 in the fixture), so
window partitions are O(max_turns) rows — no skew, no global window,
no driver loop. ``role_transitions`` reduces to ≤ |roles|² rows
map-side before the final tiny groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from miru_spark.tokenize import tokens_col


def conversation_stats(turns: DataFrame) -> DataFrame:
    """One row per conversation: turn counts by role, tool-call count,
    token volume, wall-clock duration, and SFT validity.

    ``is_valid`` = the conversation opens with a ``user`` turn AND its
    ``turn_idx`` space is dense 0..n-1 (no dropped/duplicated turns) —
    the precondition for replaying it as a training example.

    Plan: ONE hash aggregation on ``conv_id`` (partial aggregation
    map-side; uniform key distribution since conversations are bounded).
    """
    return (
        turns.select(
            "conv_id",
            "turn_idx",
            "role",
            "tool",
            "ts",
            F.size(tokens_col("text")).alias("_len"),
        )
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
                "n_assistant"
            ),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias(
                "n_tool_calls"
            ),
            F.sum("_len").alias("total_tokens"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("duration_s"),
            (
                (F.min_by("role", "turn_idx") == F.lit("user"))
                & (F.min("turn_idx") == F.lit(0))
                & (F.max("turn_idx") + F.lit(1) == F.count(F.lit(1)))
                & (F.count_distinct(F.col("turn_idx")) == F.count(F.lit(1)))
            ).alias("is_valid"),
        )
    )


def role_transitions(turns: DataFrame) -> DataFrame:
    """(from_role, to_role, n) counts over consecutive turns of each
    conversation — the role-flow Markov matrix.

    Plan: window lag partitioned by ``conv_id`` (bounded partitions,
    one shuffle) → groupBy over ≤ |roles|² keys (partial agg collapses
    each map partition to a handful of rows before the exchange).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        turns.select("conv_id", "turn_idx", "role")
        .withColumn("from_role", F.lag("role").over(w))
        .where(F.col("from_role").isNotNull())
        .groupBy("from_role", F.col("role").alias("to_role"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def context_windows(
    turns: DataFrame,
    k: int = 3,
    sep: str = "\n",
    target_role: str = "assistant",
) -> DataFrame:
    """Per ``target_role`` turn: the previous ``k`` turns rendered as
    one ``role: text`` context string plus the turn's own text as the
    training target — SFT example assembly.

    Returns (conv_id, turn_idx, context, target); ``context`` is NULL
    for a conversation-opening target (empty frame), matching SQL
    windowed ``string_agg`` semantics.

    Plan: ONE window partitioned by ``conv_id`` with a bounded
    ``rowsBetween(-k, -1)`` frame — the frame is assembled per bounded
    partition, never a global sort. The rendered context string is
    built JVM-side (``concat_ws`` over ``collect_list``), no Python.
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-k, -1)
    )
    rendered = F.concat_ws(": ", F.col("role"), F.col("text"))
    ctx = F.collect_list(rendered).over(w)
    return (
        turns.select("conv_id", "turn_idx", "role", "text")
        .withColumn(
            "context",
            F.when(F.size(ctx) > 0, F.array_join(ctx, sep)).otherwise(
                F.lit(None).cast("string")
            ),
        )
        .where(F.col("role") == target_role)
        .select("conv_id", "turn_idx", "context", F.col("text").alias("target"))
    )
