"""Cross-cluster sync (indexing/sync.py): forward cursor, incremental
rounds, idempotent re-delivery, merge-safe."""

from __future__ import annotations

import pandas as pd

from miru_spark.indexing.incremental import SegmentStore
from miru_spark.indexing.sync import SyncSender
from miru_spark.query.bm25 import search


def _scores(idx, q="w00001 AND w00004"):
    pdf = search(idx, q, k=10).toPandas()
    return sorted(round(s, 6) for s in pdf["score"])


def test_sync_forward_and_incremental(spark, tiny_turns, tmp_path):
    src = SegmentStore(spark, str(tmp_path / "src"), n_shards=2)
    dest = SegmentStore(spark, str(tmp_path / "dest"), n_shards=3)

    chunk1 = tiny_turns.where("conv_id < 'conv00000050'")
    chunk2 = tiny_turns.where("conv_id >= 'conv00000050'")

    src.build(chunk1)
    sender = SyncSender(src, dest)
    r1 = sender.sync()
    assert r1["units"] > 0 and r1["rows"] == chunk1.count()
    assert dest.load().n_docs == chunk1.count()

    # cursor current -> no-op round
    assert sender.sync() == {"units": 0, "rows": 0}

    # new source delta -> only the delta ships
    src.append(chunk2)
    r2 = sender.sync()
    assert r2["rows"] == chunk2.count()
    didx = dest.load()
    assert didx.n_docs == tiny_turns.count()
    # destination serves rank-identical answers to the source
    assert _scores(didx) == _scores(src.load())


def test_sync_after_source_merge_no_duplicates(spark, tiny_turns, tmp_path):
    """A source-side merge replaces already-shipped deltas with a
    merged_ unit; re-shipping it must not duplicate destination docs
    (watermark dedupe — the reference's destination-dedupes contract)."""
    src = SegmentStore(spark, str(tmp_path / "src"), n_shards=2)
    dest = SegmentStore(spark, str(tmp_path / "dest"), n_shards=2)

    chunk1 = tiny_turns.where("conv_id < 'conv00000030'")
    chunk2 = tiny_turns.where(
        "conv_id >= 'conv00000030' and conv_id < 'conv00000060'"
    )
    src.build(chunk1)
    sender = SyncSender(src, dest)
    sender.sync()
    src.append(chunk2)
    sender.sync()
    n_before = dest.load().n_docs

    for s in range(2):
        src.merge_shard(s)
    r = sender.sync()  # merged units are "new" cursor keys -> re-shipped
    assert r["units"] > 0
    assert dest.load().n_docs == n_before  # watermark dropped replays

    # crash-replay shape: wipe the cursor entirely, re-ship everything
    import os

    os.remove(sender.progress_path)
    sender.sync()
    assert dest.load().n_docs == n_before


def test_sync_preserves_turn_payload(spark, tiny_turns, tmp_path):
    """Per-row invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering across the sync."""
    src = SegmentStore(spark, str(tmp_path / "src"), n_shards=2)
    dest = SegmentStore(spark, str(tmp_path / "dest"), n_shards=2)
    src.build(tiny_turns)
    SyncSender(src, dest).sync()

    cols = ["conv_id", "turn_idx", "text"]
    a = (
        src.load().docs.select(*cols).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    b = (
        dest.load().docs.select(*cols).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
