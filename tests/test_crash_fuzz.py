"""Crash-interleaving recovery fuzzer for SegmentStore.

The north rule requires the build to be "resumable from checkpoint with
per-partition lineage + metrics". The targeted crash tests
(test_incremental / test_expunge) pin individual windows; this fuzzer
sweeps ALL of them: it injects a crash immediately before every durable
commit event (a unit-dir ``os.rename``, a manifest append) across a
mixed op sequence — build → append → repair → append → expunge →
tiered compact → vacuum — then restarts with a FRESH store handle,
retries the interrupted op once (what any orchestrator / Spark job
re-submission does), runs the remaining ops, and asserts the final
served corpus is identical to the no-crash run:

- same (conv_id, turn_idx, text) served set,
- no duplicate docints (the pre-fix failure mode: a commit that renamed
  but never manifested was re-indexed by the retry under the SAME
  docint range),
- manifest doc/doclen totals equal to the served relation (BM25 global
  stats stay exact),
- identical BM25 top-k (conv_id, turn_idx, score) for reference
  queries.

Reference parity: the reference replays its WAL from the last sip
cursor after a crash (MiruSipIndex.java:20-42); here the manifest is
the cursor and the unit rename is the WAL append.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from miru_spark.indexing import incremental as inc
from miru_spark.indexing.incremental import SegmentStore
from miru_spark.operators.removal import tombstones_from_keys
from miru_spark.query.bm25 import search
from miru_spark.transcripts import generate_transcripts

QUERIES = ["w00001 AND w00004", "w00002 OR w00007"]


class InjectedCrash(Exception):
    pass


class Injector:
    """Counts durable commit events under one store root; raises
    InjectedCrash immediately BEFORE event number ``crash_at`` executes
    (1-based). ``crash_at=None`` only counts (the dry run)."""

    def __init__(self, root: str, crash_at: int | None):
        self.root = os.path.abspath(root)
        self.crash_at = crash_at
        self.n = 0
        self.armed = True

    def hit(self) -> None:
        if not self.armed:
            return
        self.n += 1
        if self.crash_at is not None and self.n == self.crash_at:
            raise InjectedCrash(f"commit event {self.n}")


@pytest.fixture()
def patched(monkeypatch):
    """Install the two commit-event hooks; yields a mutable holder the
    test points at the current Injector."""
    holder = {"inj": None}
    real_rename = os.rename

    def rename(src, dst, *a, **k):
        inj = holder["inj"]
        if inj is not None and os.path.abspath(str(src)).startswith(inj.root):
            inj.hit()
        return real_rename(src, dst, *a, **k)

    real_manifest = SegmentStore._append_manifest

    def append_manifest(self, entry):
        inj = holder["inj"]
        if inj is not None and os.path.abspath(self.path).startswith(inj.root):
            inj.hit()
        return real_manifest(self, entry)

    monkeypatch.setattr(os, "rename", rename)
    monkeypatch.setattr(inc.os, "rename", rename, raising=False)
    monkeypatch.setattr(SegmentStore, "_append_manifest", append_manifest)
    return holder


def _batches(spark):
    turns = generate_transcripts(spark, n_convs=24, max_turns=6, seed=7)
    b0 = turns.where("conv_id < 'conv00000010'")
    b1 = turns.where("conv_id >= 'conv00000010' and conv_id < 'conv00000018'")
    b2 = turns.where("conv_id >= 'conv00000018'")
    return b0, b1, b2


def _ops(spark):
    b0, b1, b2 = _batches(spark)
    repairs = b0.where("conv_id = 'conv00000003'").select(
        "conv_id",
        "turn_idx",
        "role",
        F.concat(F.col("text"), F.lit(" repaired rowtext")).alias("text"),
        "tool",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
    )

    def op_expunge(store):
        keys = (
            store.load()
            .docs.where("conv_id = 'conv00000012'")
            .select("conv_id", "turn_idx")
        )
        store.expunge(tombstones_from_keys(store.load(), keys))

    return [
        ("build", lambda st: st.build(b0)),
        ("append1", lambda st: st.append(b1)),
        ("repair", lambda st: st.repair(repairs)),
        ("append2", lambda st: st.append(b2)),
        ("expunge", op_expunge),
        ("compact", lambda st: st.compact(merge_factor=2, min_bytes=1)),
        ("vacuum", lambda st: st.vacuum()),
    ]


def _final_state(store):
    idx = store.load()
    docs = idx.docs.select(
        "docint", "conv_id", "turn_idx", "text", "doclen"
    ).toPandas()
    served = sorted(
        map(tuple, docs[["conv_id", "turn_idx", "text"]].itertuples(index=False))
    )
    # k covers every matching doc, so hit sets are boundary-tie-free and
    # (conv_id, turn_idx, score) triples must match exactly
    hits = {
        q: sorted(
            (r.conv_id, r.turn_idx, round(r.score, 6))
            for r in search(idx, q, k=1000).collect()
        )
        for q in QUERIES
    }
    return {
        "served": served,
        "n_docint_dupes": int(docs["docint"].duplicated().sum()),
        "manifest_n_docs": idx.n_docs,
        "served_n_docs": len(docs),
        "manifest_sum_doclen": int(round(idx.avg_doclen * idx.n_docs)),
        "served_sum_doclen": int(docs["doclen"].sum()),
        "hits": hits,
    }


def _run_sequence(spark, path, ops, holder, crash_at):
    """Run the op sequence with a crash injected before commit event
    ``crash_at``; on the crash, restart with a fresh store handle and
    retry the interrupted op. Returns (final_state, crashed_op or None,
    events_counted)."""
    inj = Injector(str(path), crash_at)
    holder["inj"] = inj
    store = SegmentStore(spark, str(path), n_shards=2)
    crashed_in = None
    for name, fn in ops:
        try:
            fn(store)
        except InjectedCrash:
            crashed_in = name
            inj.armed = False  # the retry runs uninjected
            store = SegmentStore(spark, str(path), n_shards=2)  # "restart"
            fn(store)
    state = _final_state(store)
    holder["inj"] = None
    return state, crashed_in, inj.n


def test_crash_at_every_commit_event_recovers(spark, tmp_path, patched):
    ops = _ops(spark)
    expected, crashed, n_events = _run_sequence(
        spark, tmp_path / "clean", ops, patched, crash_at=None
    )
    assert crashed is None and n_events >= 12, n_events
    assert expected["n_docint_dupes"] == 0
    assert expected["manifest_n_docs"] == expected["served_n_docs"]
    assert expected["manifest_sum_doclen"] == expected["served_sum_doclen"]
    # the repair and the expunge must both be visible in the clean run
    assert any("repaired rowtext" in t for _, _, t in expected["served"])
    assert all(c != "conv00000012" for c, _, _ in expected["served"])

    # every commit event if few, else an even spread including first/last
    # (cap keeps CI runtime bounded; MIRU_CRASH_FUZZ_ALL=1 lifts it for
    # the exhaustive off-line sweep)
    import os as _os

    if n_events <= 8 or _os.environ.get("MIRU_CRASH_FUZZ_ALL"):
        points = list(range(1, n_events + 1))
    else:
        points = sorted(
            {1 + round(i * (n_events - 1) / 7) for i in range(8)}
        )
    failures = []
    for k in points:
        state, crashed, _ = _run_sequence(
            spark, tmp_path / f"crash_{k:02d}", ops, patched, crash_at=k
        )
        assert crashed is not None, f"event {k} never fired"
        for field in (
            "served",
            "manifest_n_docs",
            "served_n_docs",
            "manifest_sum_doclen",
            "served_sum_doclen",
            "hits",
        ):
            if state[field] != expected[field]:
                failures.append((k, crashed, field))
        if state["n_docint_dupes"] != 0:
            failures.append((k, crashed, "docint_dupes"))
    assert not failures, failures


def test_blocks_store_append_crash_recovers(spark, tmp_path, patched):
    """The blocks=True store commits block segments inside the same
    tmp-dir rename as the flat files; a crash between the rename and
    the manifest append recovers to a block-serving index identical to
    the no-crash store (block paths rank-identical to flat)."""
    from miru_spark.query.blockmax import search_blocks_and

    b0, b1, _ = _batches(spark)

    def run(path, crash_at):
        inj = Injector(str(path), crash_at)
        patched["inj"] = inj
        store = SegmentStore(spark, str(path), n_shards=2, blocks=True)
        store.build(b0)
        crashed = False
        try:
            store.append(b1)
        except InjectedCrash:
            crashed = True
            inj.armed = False
            store = SegmentStore(spark, str(path), n_shards=2, blocks=True)
            store.append(b1)  # retry
        patched["inj"] = None
        idx = store.load()
        assert idx.blocks is not None
        flat = sorted(
            (r.docint, round(r.score, 6))
            for r in search(idx, QUERIES[0], k=1000).collect()
        )
        blk = sorted(
            (r.docint, round(r.score, 6))
            for r in search_blocks_and(
                idx, [t for t in QUERIES[0].split() if t != "AND"], k=1000
            ).collect()
        )
        return (idx.n_docs, flat, blk), crashed, inj.n

    # count commit events in a clean run, then crash right before the
    # LAST one — the append's final manifest write, the orphan window
    clean, crashed, n_events = run(tmp_path / "clean", None)
    assert not crashed and n_events >= 6
    state, crashed, _ = run(tmp_path / "crash", n_events)
    assert crashed
    assert state == clean
    assert clean[1] == clean[2]  # block path rank-identical to flat
