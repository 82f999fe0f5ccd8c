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
