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


def test_reverse_backfill_newest_first(spark, tiny_turns, tmp_path):
    """Reverse cursor (MiruSyncSender forward+reverse progress pair):
    a sender created against a source with history backfills the
    pre-existing units newest-first while forward rounds ship only new
    data; the final destination equals the source."""
    src = SegmentStore(spark, str(tmp_path / "src"), n_shards=2)
    dest = SegmentStore(spark, str(tmp_path / "dest"), n_shards=3)

    old1 = tiny_turns.where("conv_id < 'conv00000030'")
    old2 = tiny_turns.where(
        "conv_id >= 'conv00000030' and conv_id < 'conv00000060'"
    )
    new = tiny_turns.where("conv_id >= 'conv00000060'")

    src.build(old1)
    src.append(old2)  # two generations of history before the sender exists
    sender = SyncSender(src, dest)
    n_q = sender.init_reverse()
    assert n_q == len(src.live_units())
    assert sender.init_reverse() == n_q  # idempotent

    # forward is current: history belongs to the reverse walker
    assert sender.sync() == {"units": 0, "rows": 0}
    src.append(new)
    assert sender.sync()["rows"] == new.count()  # forward ships ONLY new

    # newest history first: the first reverse rounds ship the delta_1
    # units (old2's conv range), then the delta_0 units (old1's)
    n_after_forward = dest.load().n_docs
    r1 = sender.sync_reverse(batch=2)
    assert r1["units"] == 2 and r1["rows"] == old2.count()
    r2 = sender.sync_reverse(batch=2)
    assert r2["rows"] == old1.count()
    assert sender.sync_reverse() == {"units": 0, "rows": 0}  # queue drained
    assert sender.reverse_pending() == []

    didx = dest.load()
    assert didx.n_docs == n_after_forward + old1.count() + old2.count()
    assert didx.n_docs == tiny_turns.count()
    # no duplicate keys, rank-identical serving
    dups = (
        didx.docs.groupBy("conv_id", "turn_idx").count().where("count > 1").count()
    )
    assert dups == 0
    assert _scores(didx) == _scores(src.load())


def test_reverse_backfill_replay_is_idempotent(spark, tiny_turns, tmp_path):
    """Crash replay: re-shipping an already-backfilled unit (cursor
    lost after the repair landed) arbitrates every row to
    already-present — no duplicates, same final state."""
    import json

    src = SegmentStore(spark, str(tmp_path / "src"), n_shards=2)
    dest = SegmentStore(spark, str(tmp_path / "dest"), n_shards=2)
    old = tiny_turns.where("conv_id < 'conv00000040'")
    new = tiny_turns.where("conv_id >= 'conv00000040'")
    src.build(old)
    sender = SyncSender(src, dest)
    sender.init_reverse()
    src.append(new)
    sender.sync()
    sender.sync_reverse(batch=1)

    # crash window: the repair landed but the cursor write was lost —
    # put the shipped unit back at the head of the queue and re-run
    with open(sender.progress_path) as f:
        p = json.load(f)
    shipped_rel = [u for u in p["units"]]
    replay = [u for u in shipped_rel if u.endswith("delta_0000")][:1]
    p["units"] = [u for u in p["units"] if u not in replay]
    p["reverse_pending"] = replay + p["reverse_pending"]
    with open(sender.progress_path, "w") as f:
        json.dump(p, f)

    n_before = dest.load().n_docs
    r = sender.sync_reverse(batch=1)
    assert r["units"] == 1 and r["rows"] == 0  # all rows already held
    while sender.reverse_pending():
        sender.sync_reverse(batch=4)
    didx = dest.load()
    assert didx.n_docs == tiny_turns.count()
    dups = (
        didx.docs.groupBy("conv_id", "turn_idx").count().where("count > 1").count()
    )
    assert dups == 0
    assert n_before <= didx.n_docs


def test_reverse_backfill_survives_source_compaction(
    spark, tiny_turns, tmp_path
):
    """A source merge that compacts QUEUED reverse units away must not
    lose their rows: the walker substitutes the covering merged_ unit
    and ships it through the anti-join + repair path (a plain forward
    append would watermark-drop the historical keys permanently)."""
    src = SegmentStore(spark, str(tmp_path / "src"), n_shards=2)
    dest = SegmentStore(spark, str(tmp_path / "dest"), n_shards=2)
    old = tiny_turns.where("conv_id < 'conv00000040'")
    new = tiny_turns.where("conv_id >= 'conv00000040'")

    src.build(old)
    sender = SyncSender(src, dest)
    assert sender.init_reverse() > 0
    src.append(new)
    assert sender.sync()["rows"] == new.count()  # forward ships new data
    # the destination watermark now covers every key range — a plain
    # append of the historical rows would drop them all
    for s in range(2):
        src.merge_shard(s)  # queued delta_0 units are no longer live

    # queue entries now surface as their covering merged_ units
    pending = sender.reverse_pending()
    assert pending and all("merged_" in r for r in pending)
    while sender.reverse_pending():
        sender.sync_reverse(batch=4)

    didx = dest.load()
    assert didx.n_docs == src.load().n_docs == tiny_turns.count()
    dups = (
        didx.docs.groupBy("conv_id", "turn_idx").count().where("count > 1").count()
    )
    assert dups == 0
    assert _scores(didx) == _scores(src.load())


def test_reverse_queue_closes_on_drain(spark, tiny_turns, tmp_path):
    """Once the walk completes the queue is persisted as None (closed),
    so a later init_reverse can open a NEW backfill instead of being a
    permanent no-op."""
    import json

    src = SegmentStore(spark, str(tmp_path / "src"), n_shards=2)
    dest = SegmentStore(spark, str(tmp_path / "dest"), n_shards=2)
    old = tiny_turns.where("conv_id < 'conv00000030'")
    src.build(old)
    sender = SyncSender(src, dest)
    sender.init_reverse()
    while sender.reverse_pending():
        sender.sync_reverse(batch=4)
    with open(sender.progress_path) as f:
        assert json.load(f)["reverse_pending"] is None

    # a new (never-shipped) source unit can seed a fresh backfill queue
    src.append(tiny_turns.where("conv_id >= 'conv00000030'"))
    n_q = sender.init_reverse()
    assert n_q > 0
    while sender.reverse_pending():
        sender.sync_reverse(batch=4)
    assert dest.load().n_docs == tiny_turns.count()


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
