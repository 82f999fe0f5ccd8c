"""Two-cluster-size scaling harness (north-rule evidence).

No real multi-node cluster exists in this sandbox, so the N-vs-4N
executor criterion is evidenced by running the SAME build+query job on
the SAME deterministic input at two local parallelism levels (separate
JVMs), as documented in BASELINE.md §3:

    scaling_efficiency = (throughput_4N / throughput_N) / 4   (target ≥ 0.8)

Usage: python tools/bench_scaling.py [--turns 300000] [--small 8]
       [--big 32] [--out BENCH]
Writes one JSON line per level to stdout and BENCH/scaling.json.

``--weak`` switches to weak scaling (Gustafson): the big level gets
core_factor× the corpus AND core_factor× the shuffle partitions, and
efficiency = throughput_big / (factor × throughput_small). This is the
operating regime the north rule actually targets — at 10^12 turns a
cluster is grown WITH the data, never 4× the executors on a fixed toy
corpus — and it amortizes the per-job scheduling floor the same way a
real large job does. Strong scaling (fixed corpus, fixed partitions)
remains the default; report both.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, tempfile, shutil, time
sys.path.insert(0, {repo!r})
cores = int(sys.argv[1]); n_convs = int(sys.argv[2]); parts = int(sys.argv[3])
from miru_spark.session import get_spark
from miru_spark.transcripts import generate_transcripts
from miru_spark.index import InvertedIndex
from miru_spark.query.bm25 import search

# shuffle partitions are sized by DATA, identical at both levels: a
# 2-executor cluster still uses enough partitions to bound per-task
# volume (conflating partition count with core count makes the small
# level spill first and fakes superlinear scaling)
spark = get_spark("scaling", master=f"local[{{cores}}]", shuffle_partitions=parts)
# warmup (JIT) on a small corpus, same code paths
warm = generate_transcripts(spark, n_convs=1500, max_turns=24, seed=7).persist()
warm.count()
wd = tempfile.mkdtemp()
wi = InvertedIndex.build_persisted(warm, wd, positions=False)
search(wi, "w00001 AND w00002", k=5).collect()
warm.unpersist(); shutil.rmtree(wd, ignore_errors=True)

# fixed-cost floor: the same 5-job build on a near-empty corpus — pure
# scheduling/commit latency, independent of data volume
tiny = generate_transcripts(spark, n_convs=200, max_turns=24, seed=11).persist()
tiny.count()
floor = None
for _ in range(2):
    fd = tempfile.mkdtemp()
    t0 = time.time()
    InvertedIndex.build_persisted(tiny, fd, positions=False)
    dt = time.time() - t0
    floor = dt if floor is None else min(floor, dt)
    shutil.rmtree(fd, ignore_errors=True)
tiny.unpersist()

turns = generate_transcripts(spark, n_convs=n_convs, max_turns=24, seed=42).persist()
n = turns.count()
best = None
for _ in range(2):
    seg = tempfile.mkdtemp()
    t0 = time.time()
    idx = InvertedIndex.build_persisted(turns, seg, positions=False)
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
    qt0 = time.time()
    for q in ["w00001 AND w00004", "w00002 OR w00007", "w0001*"]:
        search(idx, q, k=10).collect()
    q_sec = time.time() - qt0
    shutil.rmtree(seg, ignore_errors=True)
print(json.dumps({{"cores": cores, "turns": n, "build_sec": round(best, 3),
                   "floor_sec": round(floor, 3),
                   "turns_per_sec": round(n / best, 1),
                   "query3_sec": round(q_sec, 3)}}))
spark.stop()
"""


def run_level(
    repo: str, cores: int, n_convs: int, parts: int,
    mem_per_core: float | None = None,
) -> dict:
    code = WORKER.format(repo=repo)
    env = dict(os.environ)
    if mem_per_core is not None:
        # cluster-faithful memory: the north rule compares N vs 4N
        # EXECUTORS, and 4N executors bring 4N x the memory with them.
        # A fixed local-mode heap instead QUARTERS per-task memory at
        # the big level (8 concurrent tasks in the same heap as 2) —
        # at large corpora that pushes only the big level into
        # spill/GC, a local-mode artifact no real cluster has.
        env["SPARK_DRIVER_MEM"] = f"{max(1, round(mem_per_core * cores))}g"
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_convs), str(parts)],
        capture_output=True,
        text=True,
        timeout=1800,
        env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=300_000)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--big", type=int, default=32)
    ap.add_argument("--parts", type=int, default=32,
                    help="shuffle partitions, fixed across levels "
                    "(data-sized, not core-sized)")
    ap.add_argument("--reps", type=int, default=2,
                    help="interleaved repetitions per level; per-level "
                    "best-of is reported (this sandbox shows ±40%% "
                    "slowdown-only noise between JVMs)")
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: big level processes core_factor x "
                    "the corpus with core_factor x the partitions; "
                    "efficiency = tp_big / (factor x tp_small)")
    ap.add_argument("--mem-per-core", type=float, default=None,
                    help="heap GB per core, applied per level (emulates "
                    "per-executor memory: 4N executors carry 4N x the "
                    "memory). Default: fixed heap from SPARK_DRIVER_MEM")
    ap.add_argument("--out", default="BENCH")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_convs = max(args.turns // 12, 1)
    factor_i = args.big // args.small
    big_convs = n_convs * factor_i if args.weak else n_convs
    big_parts = args.parts * factor_i if args.weak else args.parts

    def best(a: dict, b: dict) -> dict:
        return a if a["turns_per_sec"] >= b["turns_per_sec"] else b

    small = big = None
    for _ in range(args.reps):
        s = run_level(repo, args.small, n_convs, args.parts,
                      args.mem_per_core)
        print(json.dumps(s))
        small = s if small is None else best(small, s)
        b = run_level(repo, args.big, big_convs, big_parts,
                      args.mem_per_core)
        print(json.dumps(b))
        big = b if big is None else best(big, b)

    ratio = big["turns_per_sec"] / small["turns_per_sec"]
    factor = args.big / args.small
    eff = ratio / factor
    # Amdahl-adjusted: subtract each level's measured fixed floor (pure
    # job scheduling/commit latency from a near-empty build) — the
    # serial constant a real cluster also pays once, not per data unit
    adj_small = max(small["build_sec"] - small["floor_sec"], 0.001)
    adj_big = max(big["build_sec"] - big["floor_sec"], 0.001)
    # adjusted throughputs keep both modes on one formula: in weak mode
    # big has factor x the turns, so tp ratio / factor == adj_small/adj_big
    adj_eff = (
        (big["turns"] / adj_big) / (small["turns"] / adj_small)
    ) / factor
    result = {
        "mode": "weak" if args.weak else "strong",
        "mem_per_core_gb": args.mem_per_core,
        "shuffle_partitions": (
            {"small": args.parts, "big": big_parts} if args.weak else args.parts
        ),
        "small": small,
        "big": big,
        "speedup": round(ratio, 3),
        "core_factor": factor,
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_adjusted": round(adj_eff, 3),
        "target": 0.8,
    }
    print(json.dumps(result))
    os.makedirs(os.path.join(repo, args.out), exist_ok=True)
    name = "scaling_weak.json" if args.weak else "scaling.json"
    with open(os.path.join(repo, args.out, name), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
