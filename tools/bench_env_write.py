"""Engine-free WRITE-bearing sandbox scaling ceiling.

`tools/bench_env_scaling.py` measures the generic shuffle and pure-CPU
ceilings, but the index build also WRITES multi-GB sorted parquet —
and the 2.59M-turn strong-scaling run showed the 8-core level's
throughput REGRESSING with corpus size (24.9k t/s at 1.25M turns →
19.3k at 2.59M) while the 2-core level stayed flat (~8.1k both), which
points at a shared write funnel, not at the engine. This probe isolates
that: a generic `range → project → repartition(k) → sortWithinPartitions
→ write.parquet` job (no miru_spark code at all — the exact physical
shape of the segment write) at two parallelism levels in fresh JVMs,
sized to the same durations as the 2.59M-turn build levels.

Usage: python tools/bench_env_write.py [--small 2] [--big 8]
       [--rows 150000000] [--reps 2] [--out BENCH/env_write.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import sys, os, time, json, tempfile, shutil
cores, rows = int(sys.argv[1]), int(sys.argv[2])
sys.path.insert(0, {repo!r})
from miru_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("env_write", master=f"local[{{cores}}]",
                  shuffle_partitions=64)
# warmup the same shape small (JIT + committer paths)
wtmp = tempfile.mkdtemp()
(spark.range(2_000_000)
 .select((F.col("id") % 1_000_000).alias("k"), F.xxhash64("id").alias("v"))
 .repartition(64, "k").sortWithinPartitions("k", "v")
 .write.mode("overwrite").parquet(wtmp))
shutil.rmtree(wtmp, ignore_errors=True)

t0 = time.time()
tmp = tempfile.mkdtemp()
(spark.range(rows)
 .select((F.col("id") % 1_000_000).alias("k"), F.xxhash64("id").alias("v"))
 .repartition(64, "k").sortWithinPartitions("k", "v")
 .write.mode("overwrite").parquet(tmp))
dt = time.time() - t0
bytes_out = sum(
    os.path.getsize(os.path.join(tmp, f))
    for f in os.listdir(tmp)
    if f.endswith(".parquet")
)
shutil.rmtree(tmp, ignore_errors=True)
print(json.dumps({{"cores": cores, "rows": rows, "write_sec": round(dt, 3),
                   "rows_per_sec": round(rows / dt, 1),
                   "gb_out": round(bytes_out / 1e9, 3)}}))
spark.stop()
"""
import os  # noqa: E402  (used in worker string above too)


def run_level(repo: str, cores: int, rows: int) -> dict:
    code = WORKER.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(rows)],
        capture_output=True, text=True, timeout=3000,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=2)
    ap.add_argument("--big", type=int, default=8)
    ap.add_argument("--rows", type=int, default=150_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--weak",
        action="store_true",
        help="weak (Gustafson) mode: the big level writes core_factor x "
        "the rows — the engine-free ceiling for the weak-scaling build "
        "number (perfect environment => equal wall time at both levels)",
    )
    ap.add_argument("--out", default="BENCH/env_write.json")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    factor = args.big / args.small
    big_rows = int(args.rows * factor) if args.weak else args.rows

    def best(a, b):
        return a if a["rows_per_sec"] >= b["rows_per_sec"] else b

    small = big = None
    for _ in range(args.reps):
        s = run_level(repo, args.small, args.rows)
        print(json.dumps(s))
        small = s if small is None else best(small, s)
        b = run_level(repo, args.big, big_rows)
        print(json.dumps(b))
        big = b if big is None else best(big, b)
    eff = (big["rows_per_sec"] / small["rows_per_sec"]) / factor
    result = {
        "mode": "weak" if args.weak else "strong",
        "small": small,
        "big": big,
        "core_factor": factor,
        "scaling_efficiency": round(eff, 3),
        "note": "generic shuffle+sorted-parquet-write job, no engine code",
    }
    print(json.dumps(result))
    os.makedirs(os.path.dirname(os.path.join(repo, args.out)), exist_ok=True)
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
