"""Tiered (partial) segment merges — LogByteSizeMergePolicy-style
compaction bounding write amplification, vs the full delta→chunk merge
(reference throttles the same merge with chits, MiruMergeChits.java).

Spans: delta_{d} covers [d,d]; merged_{d} (full merge / expunge)
covers [0,d]; merged_{lo}_{hi} (tiered) covers [lo,hi]. Liveness is
span containment.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from miru_spark.indexing.incremental import (
    SegmentStore,
    SnapshotExpiredError,
)
from miru_spark.oracle import PandasIndex
from miru_spark.query.bm25 import search


def _assert_matches_oracle(idx, pdf, query, k=10):
    got = search(idx, query, k=k).toPandas()
    exp = PandasIndex(pdf).search(query, k=k)
    gset = {(r.conv_id, r.turn_idx): r.score for r in got.itertuples()}
    eset = {(r.conv_id, r.turn_idx): r.score for r in exp.itertuples()}
    assert np.allclose(
        sorted(gset.values()), sorted(eset.values()), atol=1e-6
    ), query
    for key, s in gset.items():
        if key not in eset:
            assert any(abs(s - v) < 1e-6 for v in eset.values()), (query, key)


def test_unit_span_parse():
    f = SegmentStore._unit_span
    assert f("delta_0004") == (4, 4)
    assert f("merged_0007") == (0, 7)  # legacy full merge / expunge
    assert f("merged_0002_0005") == (2, 5)  # tiered


def test_plan_merges_policy(tmp_path):
    """Pure policy logic over synthetic unit sizes (no Spark)."""
    store = SegmentStore(spark=None, path=str(tmp_path / "p"), n_shards=1)
    units = ["delta_0000", "delta_0001", "delta_0002", "delta_0003",
             "delta_0004"]
    sizes = {}
    store._live_shard_units = lambda shard: list(units)  # type: ignore
    store._unit_bytes = lambda shard, n: sizes[n]  # type: ignore
    # all same tier, mf=2: pairs merge, odd one out left alone
    sizes = dict.fromkeys(units, 1000)
    assert store.plan_merges(0, merge_factor=2, min_bytes=1) == [
        ["delta_0000", "delta_0001"],
        ["delta_0002", "delta_0003"],
    ]
    # a big unit breaks the run: only the small-tier run of >= mf merges
    sizes = {"delta_0000": 10**9, "delta_0001": 1000, "delta_0002": 1000,
             "delta_0003": 1000, "delta_0004": 10**9}
    assert store.plan_merges(0, merge_factor=3, min_bytes=1) == [
        ["delta_0001", "delta_0002", "delta_0003"]
    ]
    # runs shorter than merge_factor never merge
    assert store.plan_merges(0, merge_factor=4, min_bytes=1) == []
    # min_bytes floors the level: wildly different tiny sizes still tier 0
    sizes = {"delta_0000": 10, "delta_0001": 900, "delta_0002": 40,
             "delta_0003": 300, "delta_0004": 5}
    assert store.plan_merges(0, merge_factor=5, min_bytes=1 << 20) == [
        list(units)
    ]


def test_merge_units_validation(spark, tiny_turns, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "v"), n_shards=1)
    store.build(tiny_turns.where("conv_id < 'conv00000025'"))
    store.append(tiny_turns.where("conv_id < 'conv00000050'"))
    store.append(tiny_turns.where("conv_id < 'conv00000075'"))
    with pytest.raises(ValueError, match=">= 2 units"):
        store.merge_units(0, ["delta_0001"])
    with pytest.raises(ValueError, match="not contiguous"):
        store.merge_units(0, ["delta_0000", "delta_0002"])
    with pytest.raises(ValueError, match="not a live unit"):
        store.merge_units(0, ["delta_0002", "delta_0003"])


def test_tiered_compaction_e2e(spark, tiny_turns, tiny_pdf, tmp_path):
    """build + 3 appends -> 4 units/shard; compact(mf=2) merges pairs
    PARTIALLY (no full rewrite), search stays oracle-identical, and a
    later append continues the delta numbering."""
    store = SegmentStore(spark, str(tmp_path / "t"), n_shards=2)
    store.build(tiny_turns.where("conv_id < 'conv00000025'"))
    store.append(tiny_turns.where("conv_id < 'conv00000050'"))
    store.append(tiny_turns.where("conv_id < 'conv00000075'"))
    store.append(tiny_turns)
    before = {s: store._live_shard_units(s) for s in range(2)}
    assert all(len(v) == 4 for v in before.values())

    n = store.compact(merge_factor=2, min_bytes=1 << 20)
    assert n == 4  # two pair-merges per shard
    for s in range(2):
        live = store._live_shard_units(s)
        assert live == ["merged_0000_0001", "merged_0002_0003"]
    idx = store.load()
    assert idx.n_docs == len(tiny_pdf)
    _assert_matches_oracle(idx, tiny_pdf, "w00001 AND w00004")
    _assert_matches_oracle(idx, tiny_pdf, "w00000")

    # second round: the two tiered units merge into one (still tier 0
    # under the floored level) -- convergence, nested merged-of-merged
    n = store.compact(merge_factor=2, min_bytes=1 << 20)
    assert n == 2
    for s in range(2):
        assert store._live_shard_units(s) == ["merged_0000_0003"]
    _assert_matches_oracle(store.load(), tiny_pdf, "w00001 AND w00004")

    # append after compaction: delta numbering continues past the span
    from miru_spark.transcripts import generate_transcripts

    extra = generate_transcripts(spark, n_convs=110, max_turns=4, seed=42)
    extra = extra.where("conv_id >= 'conv00000100'")
    store.append(extra)
    for s in range(2):
        live = store._live_shard_units(s)
        assert live[0] == "merged_0000_0003"
        assert all(u.startswith("delta_") for u in live[1:])
        assert store._unit_span(live[-1])[0] >= 4
    total = len(tiny_pdf) + extra.count()
    assert store.load().n_docs == total


def test_tiered_then_full_merge(spark, tiny_turns, tiny_pdf, tmp_path):
    """A full merge_shard over a mix of tiered + delta units supersedes
    everything (legacy [0,d] span) and still matches the oracle."""
    store = SegmentStore(spark, str(tmp_path / "f"), n_shards=2)
    store.build(tiny_turns.where("conv_id < 'conv00000025'"))
    store.append(tiny_turns.where("conv_id < 'conv00000050'"))
    store.append(tiny_turns.where("conv_id < 'conv00000075'"))
    store.append(tiny_turns)
    for s in range(2):
        store.merge_units(s, ["delta_0000", "delta_0001"])
        store.merge_shard(s)
        assert store._live_shard_units(s) == ["merged_0003"]
    idx = store.load()
    assert idx.n_docs == len(tiny_pdf)
    _assert_matches_oracle(idx, tiny_pdf, "w00001 AND w00004")


def test_crash_leftover_source_is_ignored_and_cleaned(
    spark, tiny_turns, tmp_path
):
    """A source unit whose deletion was lost to a crash (rename already
    committed) is excluded from liveness and swept by the idempotent
    re-run of the same merge."""
    store = SegmentStore(spark, str(tmp_path / "c"), n_shards=1)
    store.build(tiny_turns.where("conv_id < 'conv00000050'"))
    store.append(tiny_turns)
    store.merge_units(0, ["delta_0000", "delta_0001"])
    sdir = os.path.join(store.path, "shard=0")
    # resurrect a stale source (crash-before-cleanup simulation)
    os.makedirs(os.path.join(sdir, "delta_0001"))
    assert store._live_shard_units(0) == ["merged_0000_0001"]
    n_docs = store.load().n_docs  # loads fine, stale unit invisible
    assert n_docs == tiny_turns.count()
    store.merge_units(0, ["delta_0000", "delta_0001"])  # idempotent re-run
    assert not os.path.isdir(os.path.join(sdir, "delta_0001"))


def test_retained_sources_and_vacuum(spark, tiny_turns, tmp_path):
    """retain_sources=True keeps superseded units on disk: open readers
    and pre-merge snapshots keep working across compaction, and only
    vacuum() (Iceberg expire_snapshots) makes them unreconstructable."""
    store = SegmentStore(spark, str(tmp_path / "r"), n_shards=1)
    store.build(tiny_turns.where("conv_id < 'conv00000025'"))
    snap0 = store.snapshot_id()
    n0 = store.load().n_docs
    store.append(tiny_turns.where("conv_id < 'conv00000050'"))
    store.append(tiny_turns)
    reader = store.load()  # open searcher over pre-compaction units
    n_total = reader.n_docs
    pre_postings = reader.postings.count()

    assert store.compact(
        merge_factor=2, min_bytes=1 << 30, retain_sources=True
    ) == 1
    sdir = os.path.join(store.path, "shard=0")
    assert os.path.isdir(os.path.join(sdir, "delta_0000"))  # retained
    assert store._live_shard_units(0) == ["merged_0000_0001", "delta_0002"]
    # the open reader's unit files are intact: lazy plans still execute
    assert reader.postings.count() == pre_postings
    # pre-merge snapshot reconstructs from the retained source
    assert store.load(as_of=snap0).n_docs == n0
    assert store.load().n_docs == n_total

    # vacuum expires the retained sources; only then does the old
    # snapshot die, and the live store is unaffected
    assert store.vacuum() == 2  # delta_0000, delta_0001
    assert not os.path.isdir(os.path.join(sdir, "delta_0000"))
    with pytest.raises(SnapshotExpiredError):
        store.load(as_of=snap0)
    assert store.load().n_docs == n_total


def test_snapshot_across_tiered_merges(spark, tiny_turns, tmp_path):
    """Time travel survives tiered merges whose spans sit inside the
    snapshot prefix, and expires (Iceberg expire_snapshots contract)
    only when a merge straddles the snapshot boundary."""
    store = SegmentStore(spark, str(tmp_path / "s"), n_shards=1)
    store.build(tiny_turns.where("conv_id < 'conv00000025'"))
    store.append(tiny_turns.where("conv_id < 'conv00000050'"))
    snap = store.snapshot_id()
    n_snap = store.load().n_docs
    store.append(tiny_turns.where("conv_id < 'conv00000075'"))
    store.append(tiny_turns)
    # merge strictly inside the snapshot: still reconstructable
    store.merge_units(0, ["delta_0000", "delta_0001"])
    assert store.load(as_of=snap).n_docs == n_snap
    # merge straddling the boundary: expired
    store.merge_units(0, ["merged_0000_0001", "delta_0002"])
    with pytest.raises(SnapshotExpiredError):
        store.load(as_of=snap)
