"""spark-submit entrypoint: the five-stage training-data pipeline.

    spark-submit --py-files miru_spark.zip jobs/prepare_training_data.py \
        --input /data/documents --output /data/prepared \
        --budget 2048 [--quality-min 0.47] [--rep-max 0.5] \
        [--jaccard 0.5] [--salt v1] \
        [--bench /data/eval_docs --contam-ngram 13]

Reads a documents parquet (doc_id, text, ...), runs quality/repetition
gates → exact dedup → near-dup components → [optional benchmark
decontamination when --bench is given] → hashed split → per-split
chunk packing (miru_spark/pipeline.py), writes the packed layout
partitioned by split, and prints one JSON metrics line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet dir")
    ap.add_argument("--output", required=True, help="output dir (parquet)")
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--quality-min", type=float, default=0.47)
    ap.add_argument("--rep-max", type=float, default=0.5)
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--near-k", type=int, default=5,
                    help="near-dup shingle size (5 for real corpora; the "
                         "small-scale oracle twin uses 3)")
    ap.add_argument("--salt", default="v1")
    ap.add_argument("--bench", default=None,
                    help="eval-set parquet; survivors sharing an n-gram "
                         "with it are dropped (decontamination stage)")
    ap.add_argument("--contam-ngram", type=int, default=13)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from miru_spark.pipeline import prepare_training_data
    from miru_spark.session import get_spark

    spark = get_spark("miru_prepare", master=args.master)
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.bench) if args.bench else None
    packed, metrics = prepare_training_data(
        docs,
        budget=args.budget,
        quality_min=args.quality_min,
        rep_max=args.rep_max,
        jaccard=args.jaccard,
        near_k=args.near_k,
        bench=bench,
        contam_ngram=args.contam_ngram,
        salt=args.salt,
        collect_metrics=True,
    )
    packed.write.mode("overwrite").partitionBy("split").parquet(args.output)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
