"""Heavy-term skew harness (north-rule evidence: salted repartitioning).

Builds block segments over a synthetic posting relation with
pathological term skew — a few stopword-grade terms present in EVERY
doc — and contrasts the production salted shuffle
(``repartition(term, docint >> SPAN_BITS)``, blocks.py) against the
naive ``repartition(term)`` a skew-unaware build would use, at the
PRODUCTION constants (SPAN_BITS=20, BLOCK_BITS=13), so the docint range
must exceed several times 2^20 for the salt to have anything to do.

Two numbers per strategy:
  * max/median partition input rows (the skew itself — a straggler is
    born when max >> median);
  * wall time of the full block encode (shuffle + sort + mapInPandas).

Usage: python tools/bench_skew.py [--docs 4000000] [--hot 4]
       [--tail 8] [--cores 32] [--out BENCH/skew.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from miru_spark.indexing.blocks import SPAN_BITS, build_blocks  # noqa: E402
from miru_spark.session import get_spark  # noqa: E402


def skewed_postings(spark, n_docs: int, n_hot: int, n_tail: int):
    """(term, docint, tf, doclen): n_hot terms with df=n_docs, plus a
    cubed-uniform Zipf-ish tail of n_tail postings per doc over a 300k
    vocab (mirrors the transcript generator's floor(V*u^3) head)."""
    docs = spark.range(n_docs).select(F.col("id").alias("docint"))
    hot = docs.select(
        F.explode(
            F.array(*[F.lit(f"hot{i:02d}") for i in range(n_hot)])
        ).alias("term"),
        "docint",
        (F.pmod(F.col("docint"), F.lit(7)) + 1).cast("int").alias("tf"),
        F.lit(64).alias("doclen"),
    )
    tail = docs.select(
        "docint",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_tail - 1))
        ).alias("j"),
    )
    u = (
        F.pmod(F.xxhash64("docint", "j"), F.lit(1 << 20)).cast("double")
        / (1 << 20)
    )
    tail = tail.select(
        F.concat(
            F.lit("w"), F.floor(u * u * u * 300000).cast("string")
        ).alias("term"),
        "docint",
        F.lit(1).cast("int").alias("tf"),
        F.lit(64).alias("doclen"),
    )
    return hot.unionByName(tail)


def partition_histogram(rep):
    pdf = (
        rep.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .toPandas()
    )
    counts = sorted(int(c) for c in pdf["count"])
    return {
        "n_partitions": len(counts),
        "max_rows": counts[-1],
        "median_rows": counts[len(counts) // 2],
        "skew_ratio": round(counts[-1] / max(counts[len(counts) // 2], 1), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4_000_000)
    ap.add_argument("--hot", type=int, default=4)
    ap.add_argument("--tail", type=int, default=8)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--parts", type=int, default=64)
    ap.add_argument("--out", default="BENCH/skew.json")
    args = ap.parse_args()

    spark = get_spark(
        "skew_bench", master=f"local[{args.cores}]", shuffle_partitions=args.parts
    )
    flat = skewed_postings(spark, args.docs, args.hot, args.tail).persist()
    n_rows = flat.count()
    n_spans = (args.docs >> SPAN_BITS) + 1
    print(
        f"postings={n_rows:,} docs={args.docs:,} hot_terms={args.hot} "
        f"(df={args.docs:,} each) spans={n_spans}",
        flush=True,
    )

    results: dict = {
        "n_postings": n_rows,
        "n_docs": args.docs,
        "n_hot_terms": args.hot,
        "hot_df": args.docs,
        "n_spans": n_spans,
        "cores": args.cores,
        "shuffle_partitions": args.parts,
    }

    # --- naive: repartition by term only (what blocks.py would do
    # without the salt) — every hot term's df lands in ONE partition ---
    naive_rep = flat.repartition(args.parts, "term")
    results["unsalted"] = partition_histogram(naive_rep)

    # --- production salt: term + docint span ---
    salted_rep = flat.withColumn(
        "_span", F.shiftright(F.col("docint"), SPAN_BITS)
    ).repartition(args.parts, "term", "_span")
    results["salted"] = partition_histogram(salted_rep)

    # --- end-to-end encode wall time under each strategy (best of 2;
    # the sandbox injects slowdown-only stalls) ---
    def timed_encode(salted: bool) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            if salted:
                blocks = build_blocks(flat, avgdl=64.0, n_partitions=args.parts)
            else:
                # replicate build_blocks with the salt removed
                from miru_spark.indexing.blocks import BLOCKS_SCHEMA
                import importlib

                bmod = importlib.import_module("miru_spark.indexing.blocks")
                rep = (
                    flat.select("term", "docint", "tf", "doclen")
                    .repartition(args.parts, "term")
                    .sortWithinPartitions("term", "docint")
                )

                def encode(batches):
                    import pandas as pd

                    carry = None
                    import numpy as np

                    for pdf in batches:
                        if carry is not None and len(carry):
                            pdf = pd.concat([carry, pdf], ignore_index=True)
                        if len(pdf) == 0:
                            continue
                        terms = pdf["term"].to_numpy()
                        bids = pdf["docint"].to_numpy("int64") >> 13
                        in_last = (terms == terms[-1]) & (bids == bids[-1])
                        split = len(pdf) - int(
                            in_last[::-1].argmin()
                            if not in_last.all()
                            else len(pdf)
                        )
                        carry = pdf.iloc[split:]
                        body = pdf.iloc[:split]
                        if len(body):
                            yield bmod.encode_group_frame(body, 64.0)
                    if carry is not None and len(carry):
                        yield bmod.encode_group_frame(carry, 64.0)

                blocks = rep.mapInPandas(encode, schema=BLOCKS_SCHEMA)
            n = blocks.count()
            dt = time.time() - t0
            print(f"  encode salted={salted}: {dt:.1f}s ({n:,} blocks)", flush=True)
            best = min(best, dt)
        return round(best, 2)

    results["salted"]["encode_sec"] = timed_encode(True)
    results["unsalted"]["encode_sec"] = timed_encode(False)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
