"""Physical expunge of tombstoned docs from the SegmentStore."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.indexing.incremental import SegmentStore, SnapshotExpiredError
from miru_spark.operators.removal import tombstones_from_keys
from miru_spark.query.bm25 import search


@pytest.fixture(scope="module")
def stores(spark, tiny_turns):
    store = SegmentStore(
        spark, tempfile.mkdtemp(prefix="miru_test_expunge_"), n_shards=2
    )
    store.build(tiny_turns)
    pre_snapshot = store.snapshot_id()
    drop_keys = tiny_turns.where(F.col("turn_idx") == 2).select(
        "conv_id", "turn_idx"
    )
    store.expunge(tombstones_from_keys(store.load(), drop_keys))
    kept = tiny_turns.where(F.col("turn_idx") != 2).cache()
    kept.count()
    fresh = InvertedIndex.build(kept)
    yield store, fresh, kept, pre_snapshot
    fresh.unpersist()
    kept.unpersist()


def test_expunge_matches_fresh_build(stores):
    store, fresh, kept, _ = stores
    idx = store.load()

    # corpus scalars reflect the physical removal exactly
    assert idx.n_docs == fresh.n_docs == kept.count()
    assert abs(idx.avg_doclen - fresh.avg_doclen) < 1e-9

    # per-term df/cf identical to a fresh build of the reduced corpus
    got = {
        r["term"]: (r["df"], r["cf"]) for r in idx.terms.collect()
    }
    exp = {
        r["term"]: (r["df"], r["cf"]) for r in fresh.terms.collect()
    }
    assert got == exp

    # serving: rank- and score-identical (id spaces differ, so compare
    # by (conv_id, turn_idx))
    got_rows = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 6))
        for r in search(idx, "w00001 OR w00002", k=10).collect()
    ]
    exp_rows = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 6))
        for r in search(fresh, "w00001 OR w00002", k=10).collect()
    ]
    assert got_rows == exp_rows

    # no expunged doc can ever surface
    assert idx.docs.where(F.col("turn_idx") == 2).count() == 0


def test_expunge_expires_old_snapshots(stores):
    store, _, _, pre_snapshot = stores
    with pytest.raises(SnapshotExpiredError):
        store.load(as_of=pre_snapshot)


def test_append_after_expunge(spark, stores, tiny_turns):
    store, _, kept, _ = stores
    from miru_spark.transcripts import generate_transcripts

    n_before = store.load().n_docs
    extra = generate_transcripts(spark, n_convs=120, max_turns=16, seed=42)
    extra_new = extra.join(
        tiny_turns.select("conv_id").distinct(), "conv_id", "left_anti"
    )
    n_extra = extra_new.count()
    assert n_extra > 0
    store.append(extra)  # watermark skips everything already indexed
    idx = store.load()
    assert idx.n_docs == n_before + n_extra
    # appended docs are searchable alongside the expunged base
    assert idx.docs.where(F.col("turn_idx") == 2).count() > 0  # new convs only


def test_expunge_crash_between_rename_and_manifest_recovers(
    spark, tiny_turns, tiny_pdf, tmp_path
):
    """Crash window: expunge renames the merged unit into place, then
    dies before writing the manifest reset entry. The docs are already
    physically gone, so a re-run of the expunge with a RECOMPUTED drop
    set (tombstones over the post-crash store) is empty and routes to no
    shard — recovery must not depend on it. ``recover()`` (auto-invoked
    by load/append) finishes the manifest from the merged unit itself,
    and ``append`` never reuses the merged unit's delta index."""
    # one shard: the injected crash kills the whole expunge at the first
    # shard's manifest write, which with one shard leaves the canonical
    # crash state (merged committed everywhere, zero manifest entries)
    store = SegmentStore(spark, str(tmp_path / "crash"), n_shards=1)
    store.build(tiny_turns)
    drop_keys = tiny_turns.where(F.col("turn_idx") == 2).select(
        "conv_id", "turn_idx"
    )
    drop = tombstones_from_keys(store.load(), drop_keys)
    kept_n = tiny_turns.where(F.col("turn_idx") != 2).count()

    # inject the crash: die on the manifest append inside the expunge
    orig_append_manifest = store._append_manifest

    def boom(entry):
        if entry.get("expunged"):
            raise RuntimeError("injected crash after rename")
        orig_append_manifest(entry)

    store._append_manifest = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        store.expunge(drop)
    store._append_manifest = orig_append_manifest

    # post-crash, pre-recovery: manifest has NO reset entry (stale,
    # over-counted totals) while the merged unit IS committed on disk
    assert not any(e.get("expunged") for e in store.manifest())
    assert store._max_disk_unit(0) == 1  # merged_0001 committed on disk

    # load() auto-recovers: totals match the physical corpus (BM25
    # avgdl/idf correct), not the stale pre-expunge counts — and the
    # recomputed drop set is empty (docs already gone), proving the
    # old "re-run the expunge" story could never have fixed this
    idx = store.load()
    assert tombstones_from_keys(idx, drop_keys).count() == 0
    assert idx.n_docs == kept_n == idx.docs.count()
    man = store.manifest()
    assert any(e.get("expunged") for e in man)

    # append after recovery: new rows get a fresh delta index and are
    # visible to serving (no merged-unit shadowing)
    from miru_spark.transcripts import generate_transcripts

    extra = generate_transcripts(spark, n_convs=140, max_turns=16, seed=7)
    extra_new = extra.join(
        tiny_turns.select("conv_id").distinct(), "conv_id", "left_anti"
    )
    n_extra = extra_new.count()
    assert n_extra > 0
    # append the disjoint-convs set (all above the watermark), so the
    # expected post-append count is exact
    store.append(extra_new)
    idx2 = store.load()
    assert idx2.n_docs == kept_n + n_extra
    assert idx2.docs.count() == kept_n + n_extra


def test_expunge_crash_recovery_via_append_delta_guard(
    spark, tiny_turns, tmp_path
):
    """Even if recovery were skipped, append derives its delta from
    max(manifest, on-disk units)+1 so a committed-but-unmanifested
    merged unit can never shadow an appended delta."""
    store = SegmentStore(spark, str(tmp_path / "crash2"), n_shards=2)
    store.build(tiny_turns)
    st = store.shard_state()[0]
    # fabricate the crash artifact: a merged unit one above the manifest
    import shutil, os

    sdir = f"{store.path}/shard=0"
    src = os.path.join(sdir, "delta_0000")
    fake = os.path.join(sdir, f"merged_{st['delta'] + 1:04d}")
    shutil.copytree(src, fake)
    assert store._max_disk_unit(0) == st["delta"] + 1
    # the guard picks delta+2 for the next append on shard 0
    next_delta = max(st["delta"], store._max_disk_unit(0)) + 1
    assert next_delta == st["delta"] + 2


def test_expunge_with_blocks_serves_block_paths(spark, tiny_turns):
    """Expunge on a blocks=True store rewrites block segments too; the
    block-max paths over the rewritten store stay rank-identical to the
    flat path on the same index."""
    from miru_spark.query.blockmax import search_blocks_and, search_blocks_or

    store = SegmentStore(
        spark,
        tempfile.mkdtemp(prefix="miru_test_expunge_blk_"),
        n_shards=2,
        blocks=True,
    )
    store.build(tiny_turns)
    drop_keys = tiny_turns.where(F.col("turn_idx") % 5 == 1).select(
        "conv_id", "turn_idx"
    )
    dropped = {
        r["docint"]
        for r in tombstones_from_keys(store.load(), drop_keys).collect()
    }
    assert dropped
    store.expunge(tombstones_from_keys(store.load(), drop_keys))
    idx = store.load()
    assert idx.blocks is not None
    # expunged docs are physically gone (flat postings AND the docs
    # row-store; the block paths below are rank-identical to flat, so
    # they cannot resurface them either)
    assert idx.postings.where(F.col("docint").isin(list(dropped))).count() == 0
    assert idx.docs.where(F.col("docint").isin(list(dropped))).count() == 0

    flat_and = [
        (r["docint"], round(r["score"], 6))
        for r in search(idx, "w00001 AND w00002", k=10).collect()
    ]
    blk_and = [
        (r["docint"], round(r["score"], 6))
        for r in search_blocks_and(idx, ["w00001", "w00002"], k=10).collect()
    ]
    assert flat_and == blk_and

    flat_or = [
        (r["docint"], round(r["score"], 6))
        for r in search(idx, "w00001 OR w00002", k=10).collect()
    ]
    blk_or = [
        (r["docint"], round(r["score"], 6))
        for r in search_blocks_or(idx, ["w00001", "w00002"], k=10).collect()
    ]
    assert flat_or == blk_or
