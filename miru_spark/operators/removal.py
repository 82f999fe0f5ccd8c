"""Soft-delete (removal index) + versioned repair (upsert).

Reference semantics (enterstudio/miru):

- REMOVE: a doc id enters the **removal index**, a bitmap masked out of
  every query answer (``MiruRemovalIndex``; applied via the index mask
  at ``MiruAggregateUtil.java:1140`` / ``MiruBitmaps.buildIndexMask``).
  Spark-native: a tombstone table anti-joined into the query plan —
  see ``InvertedIndex.tombstones`` and the mask application in
  ``query/bm25.py``.
- REPAIR: a versioned re-send of a document replaces the older version
  (``MiruIndexer.set/remove``, MiruIndexer.java:128-162; dedupe via
  ``LabTimeIndex.contains``). Spark-native: union + window keep-latest
  (the MERGE-INTO emulation for plain parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tombstones_from_keys(index, keys: DataFrame) -> DataFrame:
    """(conv_id, turn_idx) keys → docint tombstone set."""
    return index.docs.join(keys, ["conv_id", "turn_idx"], "left_semi").select(
        "docint"
    )


def apply_repairs(
    turns: DataFrame, repairs: DataFrame, version_col: str = "ts"
) -> DataFrame:
    """Versioned upsert: newer (conv_id, turn_idx) rows win.

    ``repairs`` has the transcript schema; the highest ``version_col``
    per doc key survives (ties broken toward the repair batch).
    """
    tagged = turns.withColumn("_src", F.lit(0)).unionByName(
        repairs.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.desc(version_col), F.desc("_src")
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
