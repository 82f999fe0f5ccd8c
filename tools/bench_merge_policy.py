"""Compaction write-amplification harness: tiered vs full merge.

Plays the same append stream into two SegmentStores and compacts one
with the full-shard merge (``merge_shard`` after every append — the
pre-tiered engine's only option) and the other with the tiered policy
(``compact(merge_factor)``). The scale claim under test: full merges
rewrite every live posting on every compaction (O(n²) bytes over n
appends), while the tiered policy rewrites each posting O(log_mf n)
times, so total bytes written per ingested turn stays flat as the
store grows. Bytes are measured at unit-creation time by diffing the
store's unit directories after every operation — exactly the bytes a
1000-executor cluster would push to object storage.

Usage: python tools/bench_merge_policy.py [--convs 4000] [--slices 16]
       [--cores 8] [--out BENCH/merge_policy.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from miru_spark.indexing.incremental import SegmentStore  # noqa: E402
from miru_spark.session import get_spark  # noqa: E402
from miru_spark.transcripts import generate_transcripts  # noqa: E402


def unit_sizes(store: SegmentStore) -> dict[str, int]:
    """bytes per (shard, unit-name) currently on disk."""
    out = {}
    for s in range(store.n_shards):
        sdir = os.path.join(store.path, f"shard={s}")
        if not os.path.isdir(sdir):
            continue
        for n in os.listdir(sdir):
            if n.startswith(("delta_", "merged_")):
                out[f"{s}/{n}"] = store._unit_bytes(s, n)
    return out


class Meter:
    """Accumulates bytes written = size of every unit the moment it
    first appears (sources deleted later don't subtract — the write
    already happened)."""

    def __init__(self, store: SegmentStore):
        self.store = store
        self.seen: set[str] = set()
        self.bytes_written = 0
        self.merges = 0

    def tick(self) -> None:
        for k, b in unit_sizes(self.store).items():
            if k not in self.seen:
                self.seen.add(k)
                self.bytes_written += b
                if "/merged_" in k:
                    self.merges += 1


def run(spark, turns_slices, policy: str, merge_factor: int) -> dict:
    store = SegmentStore(
        spark, tempfile.mkdtemp(prefix=f"miru_mp_{policy}_"), n_shards=2
    )
    meter = Meter(store)
    t0 = time.time()
    ingested = 0
    per_step = []
    for i, sl in enumerate(turns_slices):
        if i == 0:
            store.build(sl)
        else:
            store.append(sl)
        ingested += sl.count()
        meter.tick()
        before = meter.bytes_written
        if policy == "full":
            for s in range(store.n_shards):
                store.merge_shard(s)
        elif policy == "tiered":
            store.compact(merge_factor=merge_factor)
        meter.tick()
        per_step.append(
            {
                "step": i,
                "turns": ingested,
                "merge_bytes": meter.bytes_written - before,
                "cum_bytes": meter.bytes_written,
                "live_units": len(store.live_units()),
            }
        )
    n_docs = store.load().n_docs
    return {
        "policy": policy,
        "wall_sec": round(time.time() - t0, 2),
        "turns": ingested,
        "n_docs_served": n_docs,
        "merges": meter.merges,
        "bytes_written": meter.bytes_written,
        "bytes_per_turn": round(meter.bytes_written / max(ingested, 1), 1),
        "final_live_units": len(store.live_units()),
        "per_step": per_step,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=4000)
    ap.add_argument("--slices", type=int, default=16)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--merge-factor", type=int, default=4)
    ap.add_argument("--out", default="BENCH/merge_policy.json")
    args = ap.parse_args()

    spark = get_spark(
        "bench_merge_policy",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    turns = generate_transcripts(
        spark, n_convs=args.convs, max_turns=12, seed=7
    ).cache()
    turns.count()
    step = args.convs // args.slices
    slices = [
        turns.where(
            (F.col("conv_id") >= f"conv{i * step:08d}")
            & (F.col("conv_id") < f"conv{(i + 1) * step:08d}")
        )
        for i in range(args.slices)
    ]

    results = {
        "convs": args.convs,
        "slices": args.slices,
        "merge_factor": args.merge_factor,
        "full": run(spark, slices, "full", args.merge_factor),
        "tiered": run(spark, slices, "tiered", args.merge_factor),
    }
    f, t = results["full"], results["tiered"]
    assert f["n_docs_served"] == t["n_docs_served"], "policies diverge!"
    results["write_amplification_ratio"] = round(
        f["bytes_written"] / max(t["bytes_written"], 1), 2
    )
    print(json.dumps(results, indent=1))
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
