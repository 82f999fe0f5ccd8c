"""Dense doc-id ("prime order") assignment.

The reference gives every document a dense int id equal to its
insertion/time position inside a partition ("prime ordering",
enterstudio/miru README.md:6; ids handed out by the writer cursor,
``miru-writer/.../AmzaPartitionIdProvider.java:118-138``). Scoring,
latest/first semantics and the (score desc, docint desc) tie-break all
depend on that ordering.

Here the stable identity is ``(conv_id, turn_idx)`` and ``docint`` is the
dense rank of that pair under lexicographic ordering. A naive global
``row_number() OVER (ORDER BY conv_id, turn_idx)`` collapses to a single
partition — fine for tests, fatal at 10^12 turns. The dense rank
decomposes into::

    docint = (#turns of all conversations with conv_id' < conv_id)
             + rank of turn_idx within the conversation

(on contiguous transcripts — turn_idx = 0..n-1, the usual invariant —
the within-conv rank equals ``turn_idx``; computing the rank keeps ids
dense and collision-free when turns have been filtered or expunged)

so the global sort is only over the *conversations* table (1000-10000×
smaller than turns), and the per-turn work is an equi-join on conv_id —
shuffle on a high-cardinality key, no global sort of turns. This is the
same trick as the reference's per-partition id cursor, computed
declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# DuckDB twin used by oracle_sql() strings; {src} is the transcripts relation.
DUCKDB_DOCINT = """
SELECT t.*,
       (COALESCE(o.off, 0)
        + ROW_NUMBER() OVER (PARTITION BY t.conv_id ORDER BY t.turn_idx)
        - 1)::BIGINT AS docint
FROM {src} t
JOIN (
    SELECT conv_id,
           SUM(n) OVER (ORDER BY conv_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off
    FROM (SELECT conv_id, COUNT(*) AS n FROM {src} GROUP BY conv_id)
) o USING (conv_id)
"""


def with_docint(turns: DataFrame) -> DataFrame:
    """Add a dense ``docint`` column = rank of (conv_id, turn_idx).

    Deterministic and parallelism-independent, with NO unpartitioned
    window at any size: a two-level prefix sum. Range-partition the
    convs table by conv_id, per-partition local prefix (a window WITH a
    partition spec — pure JVM), then add per-partition base offsets
    (one tiny collect of P partition totals, cumulated driver-side,
    broadcast back). The docint values are independent of where the
    range boundaries fall, so sampling-based range partitioning cannot
    perturb them; the ranged convs relation is persisted across its two
    uses so the sampled partitioning is computed once (eviction replays
    the same lineage, which is safe). The global-sort fraction of the
    job is the convs relation — 3-4 orders of magnitude smaller than
    turns — and even that is spread over P tasks.
    """
    spark = turns.sparkSession
    convs = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sort_array(F.collect_list("turn_idx")).alias("_tix"),
    )
    p = max(spark.sparkContext.defaultParallelism, 2)
    local = (
        convs.repartitionByRange(p, "conv_id")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("conv_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    totals = local.groupBy("_pid").agg(F.sum("_n").alias("_t")).collect()
    acc = 0
    bases = []
    for r in sorted(totals, key=lambda r: r["_pid"]):
        bases.append((int(r["_pid"]), acc))
        acc += int(r["_t"])
    base_df = F.broadcast(
        spark.createDataFrame(bases or [(0, 0)], "_pid int, _base long")
    )
    offsets = (
        local.withColumn("_loff", F.coalesce(F.sum("_n").over(w), F.lit(0)))
        .join(base_df, "_pid")
        .select(
            "conv_id", (F.col("_loff") + F.col("_base")).alias("_off"), "_tix"
        )
    )
    # Within-conv rank instead of raw turn_idx: identical on contiguous
    # transcripts (turn_idx = 0..n-1), and collision-free when turns
    # have been filtered/expunged (gappy turn_idx would otherwise spill
    # past the conversation's counted offset into the next conv's id
    # range). The rank is looked up in the conv's SORTED turn_idx array
    # (carried on the tiny conv-level relation from the same agg) — a
    # per-row array_position, NOT a window: the former
    # row_number() OVER (PARTITION BY conv_id) shuffled EVERY turn row,
    # text included, purely to rank ~12 ints per group (round-5 paired
    # harness attributed ~4 s of the 8-core build wall to it). With the
    # conv relation under the broadcast threshold the turns side of
    # this join is completely exchange-free; above it, Catalyst falls
    # back to the same conv_id hash shuffle the window needed anyway —
    # never worse. Duplicate (conv_id, turn_idx) keys — a violation of
    # the store's key invariant, arbitrated upstream by
    # watermark/repair — would map to one docint here rather than two.
    return (
        turns.join(offsets, "conv_id")
        .withColumn(
            "docint",
            (
                F.col("_off")
                + F.expr("array_position(_tix, turn_idx)")
                - F.lit(1)
            ).cast("long"),
        )
        .drop("_off", "_tix")
    )
