"""Sequence packing for training-batch construction.

A 100 TB training pipeline ends by packing tokenized documents into
fixed-budget sequences. Two deterministic strategies:

- :func:`pack_chunks` — GPT-style concat-and-chunk: documents are laid
  out in a stable global order and the token stream is cut every
  ``budget`` tokens; documents may span a cut. Per doc the operator
  emits its global token offset and the first/last sequence it lands
  in. The global offset is a distributed two-level prefix sum (the
  same shape as ``miru_spark.docids.with_docint``): range-partition by
  the order key, per-partition window WITH a partition spec (pure
  JVM), then P partition totals collected once, cumulated driver-side
  and broadcast back — no unpartitioned window at any size.

- :func:`pack_greedy` — no document ever splits: within each group
  (e.g. a shard or a conversation) documents are visited in order and
  appended to the current pack until the budget would overflow, which
  starts a new pack. The recurrence is inherently sequential, so it
  runs per group under ``applyInPandas`` — groups are the parallelism
  unit, the per-group loop is vectorized-adjacent numpy. Deterministic
  given (group, order).

There is no packing operator in the reference (it predates LLM
pipelines); the nearest analog is the batched index-merge layout
(``MiruDeltaIndex`` append batching). The shapes here follow the
brief's training-data-pipeline mandate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    part_cols: list[str] | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: (id, n_tokens, start, seq_id, seq_off,
    seq_last) where ``start`` is the document's offset in the token
    stream ordered by ``id_col`` and ``seq_id = start div budget``.

    ``part_cols`` (e.g. ``["split"]``) resets the stream per partition
    value — each split packs independently from offset 0, which is what
    a train/val/test layout needs. The partition columns pass through to
    the output.

    Scale note: the prefix sum is over the full doc relation, which is
    unavoidable for chunk packing (every doc needs its global offset),
    but it is two-level — the only global step is a collect of
    per-(physical-partition, part-value) totals: P × |part values| rows.
    """
    spark = docs.sparkSession
    parts = list(part_cols or [])
    base = docs.select(
        *[F.col(c).cast("string").alias(c) for c in parts],
        F.col(id_col).alias("id"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
    )
    p = max(spark.sparkContext.defaultParallelism, 2)
    local = (
        base.repartitionByRange(p, *parts, "id")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    w = (
        Window.partitionBy("_pid", *parts)
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    totals = (
        local.groupBy("_pid", *parts).agg(F.sum("n_tokens").alias("_t")).collect()
    )
    # cumulate totals per part-value across pids (driver-side: one tiny
    # row per (pid, part) — the range partitioner keeps a part's pids
    # contiguous, but correctness only needs the pid order)
    acc: dict[tuple, int] = {}
    bases = []
    for r in sorted(totals, key=lambda r: (tuple(r[c] for c in parts), r["_pid"])):
        key = tuple(r[c] for c in parts)
        bases.append((*key, int(r["_pid"]), acc.get(key, 0)))
        acc[key] = acc.get(key, 0) + int(r["_t"])
    schema = (
        ", ".join(f"{c} string" for c in parts)
        + (", " if parts else "")
        + "_pid int, _base long"
    )
    base_df = F.broadcast(
        spark.createDataFrame(
            bases or [tuple([""] * len(parts)) + (0, 0)], schema
        )
    )
    out = (
        local.withColumn("_loff", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .join(base_df, ["_pid", *parts])
        .withColumn("start", (F.col("_loff") + F.col("_base")).cast("long"))
        .withColumn("seq_id", F.expr(f"start div {int(budget)}"))
        .withColumn("seq_off", (F.col("start") % int(budget)).cast("int"))
        .withColumn(
            "seq_last",
            F.when(
                F.col("n_tokens") > 0,
                F.expr(f"(start + n_tokens - 1) div {int(budget)}"),
            ).otherwise(F.col("seq_id")),
        )
        .select(*parts, "id", F.col("n_tokens").cast("int").alias("n_tokens"),
                "start", "seq_id", "seq_off", "seq_last")
    )
    return out


def pack_greedy(
    docs: DataFrame,
    budget: int,
    group_col: str,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """No-split greedy packing per group: (group, id, n_tokens, pack_idx,
    pack_off). Documents are visited in ``id_col`` order within each
    group; a doc that would overflow the current pack starts a new one.
    Docs longer than ``budget`` get a pack of their own (callers clip or
    re-chunk those upstream). ``pack_idx`` numbers packs within the
    group from 0; ``pack_off`` is the doc's token offset inside its pack.
    """
    out_schema = (
        f"group string, id long, n_tokens int, pack_idx long, pack_off int"
    )
    b = int(budget)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort")
        packs, offs = [], []
        cur, used = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if used > 0 and used + n > b:
                cur += 1
                used = 0
            offs.append(used)
            packs.append(cur)
            used += n
        return pd.DataFrame(
            {
                "group": pdf["group"],
                "id": pdf["id"],
                "n_tokens": pdf["n_tokens"].astype("int32"),
                "pack_idx": packs,
                "pack_off": offs,
            }
        )

    base = docs.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(id_col).cast("long").alias("id"),
        F.col(n_tokens_col).cast("int").alias("n_tokens"),
    )
    return base.groupBy("group").applyInPandas(pack, out_schema)
