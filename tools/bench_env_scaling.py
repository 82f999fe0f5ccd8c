"""Engine-free sandbox scaling ceiling: how well does THIS environment
scale a trivial Spark job from N to 4N cores?

No miru_spark code at all — two generic workloads per level, each in a
fresh JVM:

  * shuffle: ``spark.range(R).groupBy(id % K).count()`` — one exchange,
    the shape every index-build stage reduces to;
  * cpu: codegen'd ``sum(xxhash64(id))`` over a range — zero shuffle,
    pure whole-stage-codegen arithmetic.

Whatever efficiency these measure is the CEILING any engine job can
reach here (gVisor syscall interposition serializes I/O; a single JVM
shares one memory bus). Report alongside BENCH/scaling.json so the
engine's efficiency is judged against the environment's, not against
an ideal 1.0 this box cannot produce for ANY job.

Usage: python tools/bench_env_scaling.py [--small 2] [--big 8]
       [--rows 40000000] [--reps 2] [--out BENCH/env_scaling.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import sys, time, json
cores, rows = int(sys.argv[1]), int(sys.argv[2])
sys.path.insert(0, {repo!r})
from miru_spark.session import get_spark
spark = get_spark("env_scaling", master=f"local[{{cores}}]",
                  shuffle_partitions=32)
# warmup both shapes (JIT)
from pyspark.sql import functions as F
spark.range(2_000_000).groupBy((F.col("id") % 1000).alias("k")).count().count()
spark.range(20_000_000).agg(F.sum(F.pmod(F.xxhash64("id"), F.lit(1000)))).collect()

t0 = time.time()
n = spark.range(rows).groupBy((F.col("id") % 1_000_000).alias("k")).count().count()
t_shuffle = time.time() - t0

t0 = time.time()
spark.range(rows * 10).agg(F.sum(F.pmod(F.xxhash64("id"), F.lit(1000)))).collect()
t_cpu = time.time() - t0

print(json.dumps({{"cores": cores, "rows": rows,
                   "shuffle_sec": round(t_shuffle, 3),
                   "cpu_sec": round(t_cpu, 3), "groups": n}}))
spark.stop()
"""


def run_level(repo: str, cores: int, rows: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=repo), str(cores), str(rows)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=2)
    ap.add_argument("--big", type=int, default=8)
    ap.add_argument("--rows", type=int, default=40_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--weak", action="store_true",
                    help="weak (Gustafson) ceiling: big level processes "
                    "core_factor x the rows; ideal = equal durations, "
                    "efficiency = small_sec / big_sec")
    ap.add_argument("--out", default="BENCH/env_scaling.json")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def best(a, b):
        if a is None:
            return b
        return {
            **b,
            "shuffle_sec": min(a["shuffle_sec"], b["shuffle_sec"]),
            "cpu_sec": min(a["cpu_sec"], b["cpu_sec"]),
        }

    factor_i = args.big // args.small
    big_rows = args.rows * factor_i if args.weak else args.rows

    small = big = None
    for _ in range(args.reps):
        s = run_level(repo, args.small, args.rows)
        print(json.dumps(s))
        small = best(small, s)
        b = run_level(repo, args.big, big_rows)
        print(json.dumps(b))
        big = best(big, b)

    factor = args.big / args.small
    # strong: ideal big is factor x faster on the same rows. weak: big
    # has factor x the rows, so ideal is EQUAL durations — one formula
    # covers both because per-row throughput ratios cancel the rows.
    t_factor = 1.0 if args.weak else factor
    result = {
        "mode": "weak" if args.weak else "strong",
        "small": small,
        "big": big,
        "core_factor": factor,
        "shuffle_efficiency": round(
            small["shuffle_sec"] / big["shuffle_sec"] / t_factor, 3
        ),
        "cpu_efficiency": round(
            small["cpu_sec"] / big["cpu_sec"] / t_factor, 3
        ),
    }
    print(json.dumps(result))
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
