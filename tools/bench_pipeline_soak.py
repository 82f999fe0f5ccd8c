"""Scale soak of the five-stage training-data pipeline.

Generates an N-doc synthetic corpus (default 5M — ~16x the sf0.1
catalog run), injects controlled duplicate load (2% exact re-sends +
2% one-token-mutated near-dups so the dedup stages do real work), runs
``prepare_training_data`` end-to-end with per-stage wall-times, and
records shuffle read/write + spill totals scraped from the local Spark
UI REST API. Output: one JSON line + BENCH/pipeline_soak.json.

    python tools/bench_pipeline_soak.py [--docs 5000000] [--cpus 32]

This is the evidence run for the dedup family's scale claims: the
shingle df cap, the posexplode+lead gram build, and the O(log d)
component rounds all get their first test above catalog scale here.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request


def _rest_totals(ui_port: int = 4040) -> dict:
    """Sum shuffle/spill bytes across all completed stages via the
    app's own UI REST API (no listeners, no event logs)."""
    try:
        base = f"http://localhost:{ui_port}/api/v1/applications"
        apps = json.load(urllib.request.urlopen(base, timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=30)
        )
    except Exception as e:  # UI disabled / port taken — soak still valid
        return {"error": f"spark UI REST unavailable: {e}"}
    tot = {
        "shuffle_read_bytes": 0,
        "shuffle_write_bytes": 0,
        "memory_spill_bytes": 0,
        "disk_spill_bytes": 0,
        "input_bytes": 0,
        "n_stages": 0,
    }
    spillers = []
    for st in stages:
        if st.get("status") != "COMPLETE":
            continue
        tot["n_stages"] += 1
        tot["shuffle_read_bytes"] += st.get("shuffleReadBytes", 0)
        tot["shuffle_write_bytes"] += st.get("shuffleWriteBytes", 0)
        tot["memory_spill_bytes"] += st.get("memoryBytesSpilled", 0)
        tot["disk_spill_bytes"] += st.get("diskBytesSpilled", 0)
        tot["input_bytes"] += st.get("inputBytes", 0)
        sp = st.get("memoryBytesSpilled", 0) + st.get("diskBytesSpilled", 0)
        if sp > 0:
            spillers.append(
                {
                    "stage": st.get("stageId"),
                    "name": (st.get("name") or "")[:80],
                    "mem_spill_mb": round(st.get("memoryBytesSpilled", 0) / 1e6),
                    "disk_spill_mb": round(st.get("diskBytesSpilled", 0) / 1e6),
                    "shuffle_read_mb": round(st.get("shuffleReadBytes", 0) / 1e6),
                    "n_tasks": st.get("numCompleteTasks"),
                }
            )
    spillers.sort(key=lambda s: -(s["mem_spill_mb"] + s["disk_spill_mb"]))
    tot["top_spill_stages"] = spillers[:10]
    return tot


def _generate_documents(spark, n_docs: int, seed: int = 11):
    """Deterministic heavy-tail document corpus.

    Real web corpora have multi-million-type tail vocabularies — shingle
    rarity, not doc count, is what keeps the shared-shingle pair join
    linear. The catalog's transcript generator draws from a 10k-word
    Zipf vocab (right for BM25 term-stat tests, pathologically dense for
    near-dup candidate generation: at 25k docs its shingle buckets
    already make the pair join quadratic-ish). Here each token is
    ``t<idx>`` with idx = floor(V·u^3) over V=3M — a Zipf-like skew with
    a realistic tail, all splitmix64(counter) functions (no RNG state,
    scales to any n_docs by Spark range partitioning).
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from miru_spark.transcripts import _splitmix64

    V = 3_000_000

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({"doc_id": [], "text": []})
                continue
            ids = pdf["id"].to_numpy(np.uint64)
            base = _splitmix64(ids * np.uint64(2_654_435_761) + np.uint64(seed))
            n_tok = (base % np.uint64(161)).astype(np.int64) + 40  # 40..200
            offs = np.zeros(len(pdf) + 1, dtype=np.int64)
            np.cumsum(n_tok, out=offs[1:])
            row_of = np.repeat(np.arange(len(pdf)), n_tok)
            j_of = np.arange(int(offs[-1]), dtype=np.uint64) - offs[row_of].astype(
                np.uint64
            )
            u = _splitmix64(
                base[row_of] * np.uint64(131) + j_of + np.uint64(7)
            ).astype(np.float64) / np.float64(2**64)
            idx = (u * u * u * V).astype(np.int64)  # zipf-ish: dense head, long tail
            texts = []
            strs = np.char.add("t", idx.astype(str))
            for r in range(len(pdf)):
                texts.append(" ".join(strs[offs[r] : offs[r + 1]]))
            yield pd.DataFrame({"doc_id": ids.astype(np.int64), "text": texts})

    return spark.range(n_docs).mapInPandas(gen, schema="doc_id long, text string")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--near-k", type=int, default=5)
    ap.add_argument(
        "--advisory-mb",
        type=int,
        default=16,
        help="AQE advisory partition size. The default 64MB sizes "
        "post-shuffle partitions for SCAN-like stages; the shingle "
        "pair join EXPANDS its input through join multiplicity, so a "
        "64MB coalesced partition balloons past executor memory and "
        "spills (round-3 soak: 16.6GB mem + 9.9GB disk spill, all in "
        "the join stage). 16MB keeps the ballooned working set "
        "in-memory.",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from miru_spark.pipeline import prepare_training_data
    from miru_spark.session import get_spark

    spark = get_spark(
        "miru_pipeline_soak",
        master=f"local[{args.cpus}]",
        # spill-aware partition sizing: ~2k docs (~1.5MB text + gram
        # explode) per shuffle partition; AQE coalesces the small ones.
        # At 1M docs the cpus*4 default left ~450MB/partition in the
        # shingle joins and spilled 220GB — see BENCH/BASELINE.md.
        shuffle_partitions=max(args.cpus * 4, args.docs // 2000),
        extra_conf={
            "spark.ui.enabled": "true",  # REST metrics scrape
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": f"{args.advisory_mb}m",
            # NB: the shuffled-hash-join choice for the pair joins lives
            # in the library itself (`.hint("shuffle_hash")` in
            # operators/dedup.py + similarity.py), not in session conf —
            # any caller's session gets the spill-free plan.
        },
    )

    root = tempfile.mkdtemp(prefix="miru_soak_")
    out = {"docs_requested": args.docs, "cpus": args.cpus, "near_k": args.near_k}
    try:
        # ---- corpus + controlled duplicate load ----
        t0 = time.time()
        base = _generate_documents(spark, args.docs)
        # 2% exact re-sends + 2% near-dups (first token swapped) under
        # fresh ids — deterministic hash-sampled
        exact_dup = base.where(F.pmod(F.xxhash64("doc_id"), 50) == 0).select(
            (F.col("doc_id") + F.lit(1 << 60)).alias("doc_id"), "text"
        )
        near_dup = base.where(F.pmod(F.xxhash64("doc_id"), 50) == 1).select(
            (F.col("doc_id") + F.lit(2 << 60)).alias("doc_id"),
            F.concat(F.lit("variant "), F.col("text")).alias("text"),
        )
        docs_dir = f"{root}/documents"
        base.unionByName(exact_dup).unionByName(near_dup).write.parquet(docs_dir)
        docs = spark.read.parquet(docs_dir)
        out["docs_generated"] = docs.count()
        out["t_generate_s"] = round(time.time() - t0, 2)
        out["input_mb"] = round(
            sum(
                os.path.getsize(os.path.join(docs_dir, f))
                for f in os.listdir(docs_dir)
            )
            / 1e6,
            1,
        )

        # ---- the pipeline, end-to-end ----
        t0 = time.time()
        packed, metrics = prepare_training_data(
            docs, budget=args.budget, near_k=args.near_k, collect_metrics=True
        )
        out["pipeline"] = metrics
        out["t_pipeline_s"] = round(time.time() - t0, 2)
        out["docs_per_sec"] = round(out["docs_generated"] / out["t_pipeline_s"], 1)
        out["spark_stage_totals"] = _rest_totals()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()

    line = json.dumps(out)
    print(line)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/pipeline_soak.json", "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
