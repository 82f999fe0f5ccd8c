"""Removal mask + versioned repair (reference REMOVE/REPAIR types,
MiruPartitionedActivity.java:10-62; MiruIndexer.set/remove:128-162)."""

from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.operators.removal import apply_repairs, tombstones_from_keys
from miru_spark.query.bm25 import search


def test_removal_masks_answers(spark, small_turns):
    idx = InvertedIndex.build(small_turns)
    base = search(idx, "w00000 OR w00001", k=20).toPandas()
    victim = int(base.iloc[0]["docint"])
    tomb = spark.createDataFrame([(victim,)], "docint long")
    masked = search(idx.with_tombstones(tomb), "w00000 OR w00001", k=20).toPandas()
    assert victim in set(base["docint"])
    assert victim not in set(masked["docint"])
    # surviving docs keep pre-delete scores (stats unchanged until rebuild)
    common = set(base["docint"]) & set(masked["docint"])
    bs = base.set_index("docint")["score"]
    ms = masked.set_index("docint")["score"]
    assert all(abs(bs[d] - ms[d]) < 1e-12 for d in common)
    idx.unpersist()


def test_tombstones_from_keys(spark, small_turns):
    idx = InvertedIndex.build(small_turns)
    keys = spark.createDataFrame(
        [("conv00000000", 0)], "conv_id string, turn_idx int"
    )
    t = tombstones_from_keys(idx, keys).collect()
    assert len(t) == 1
    idx.unpersist()


def test_apply_repairs_keeps_latest(spark):
    turns = spark.createDataFrame(
        [("c0", 0, "user", "old text", None, "2024-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    repairs = spark.createDataFrame(
        [("c0", 0, "user", "new text", None, "2024-01-02 00:00:00"),
         ("c1", 0, "user", "added", None, "2024-01-02 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in apply_repairs(turns, repairs).collect()}
    assert out == {("c0", 0): "new text", ("c1", 0): "added"}


def test_apply_repairs_tie_prefers_repair(spark):
    same_ts = "2024-01-01 00:00:00"
    turns = spark.createDataFrame(
        [("c0", 0, "user", "old", None, same_ts)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    repairs = spark.createDataFrame(
        [("c0", 0, "user", "repaired", None, same_ts)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = apply_repairs(turns, repairs).collect()
    assert len(rows) == 1 and rows[0]["text"] == "repaired"


def test_removal_masks_block_and_phrase_paths(spark, small_turns, tmp_path):
    """Tombstones are masked out of EVERY serving path — including block
    segments (AND + WAND OR) and phrase search."""
    from miru_spark.query.blockmax import search_blocks_and, search_blocks_or
    from miru_spark.query.phrase import search_phrase

    idx = InvertedIndex.build_persisted(
        small_turns, str(tmp_path / "seg"), positions=True, blocks=True
    )
    base_and = search_blocks_and(idx, ["w00001", "w00004"], k=20).toPandas()
    victim = int(base_and.iloc[0]["docint"])
    tomb = spark.createDataFrame([(victim,)], "docint long")
    masked = idx.with_tombstones(tomb)

    m_and = search_blocks_and(masked, ["w00001", "w00004"], k=20).toPandas()
    assert victim not in set(m_and["docint"])
    base_or = search_blocks_or(idx, ["w00001", "w00004"], k=20, probe_blocks=1)
    m_or = search_blocks_or(masked, ["w00001", "w00004"], k=20, probe_blocks=1)
    assert victim in set(base_or.toPandas()["docint"])
    assert victim not in set(m_or.toPandas()["docint"])
    # block path still rank-identical to the flat engine under the mask
    exp = search(masked, "w00001 AND w00004", k=20).toPandas()
    assert list(m_and["docint"]) == list(exp["docint"])

    # phrase path: tombstone a doc matching the phrase
    ph = search_phrase(idx, "w00000 w00000", k=20).toPandas()
    if len(ph):
        pv = int(ph.iloc[0]["docint"])
        ptomb = spark.createDataFrame([(pv,)], "docint long")
        mp = search_phrase(idx.with_tombstones(ptomb), "w00000 w00000", k=20).toPandas()
        assert pv not in set(mp["docint"])
