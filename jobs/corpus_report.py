"""spark-submit entrypoint: one-pass corpus analytics report.

    spark-submit --py-files miru_spark.zip jobs/corpus_report.py \
        --input /data/documents --output /data/report \
        [--top-v 1000] [--histogram] [--master local[8]]

The standing report a data team schedules over a training corpus:

- ``summary`` — doc count, token totals, quality/OOV means
- ``length_histogram`` — power-of-two token-length buckets
- ``vocab`` — top-V vocabulary with the cumulative coverage curve
- ``languages`` — marker-based language mix
- ``quality_deciles`` — composite-quality decile edges

Each section is written as parquet under ``--output/<section>`` and a
one-line JSON summary is printed. All sections are single-aggregation
plans (see PLANS.md) — the whole report is a constant number of corpus
scans regardless of corpus size.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet dir")
    ap.add_argument("--output", required=True, help="report output dir")
    ap.add_argument("--top-v", type=int, default=1000)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from miru_spark.operators.textstats import (
        lang_id,
        length_histogram,
        oov_rate,
        quality_scores,
        vocab_coverage,
    )
    from miru_spark.session import get_spark

    spark = get_spark("miru_corpus_report", master=args.master)
    docs = spark.read.parquet(args.input).persist()

    hist = length_histogram(docs)
    hist.write.mode("overwrite").parquet(f"{args.output}/length_histogram")

    vocab = vocab_coverage(docs, top_v=args.top_v)
    vocab.write.mode("overwrite").parquet(f"{args.output}/vocab")

    langs = (
        lang_id(docs)
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("lang_pred"))
    )
    langs.write.mode("overwrite").parquet(f"{args.output}/languages")

    q = quality_scores(docs).persist()
    deciles = q.agg(
        *[
            F.expr(f"percentile_approx(quality, {i / 10})").alias(f"p{i * 10}")
            for i in range(1, 10)
        ]
    )
    deciles.write.mode("overwrite").parquet(f"{args.output}/quality_deciles")

    oov = oov_rate(docs, top_v=args.top_v)
    summary = (
        q.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .crossJoin(oov.agg(F.round(F.avg("oov_rate"), 4).alias("avg_oov_rate")))
    )
    summary.write.mode("overwrite").parquet(f"{args.output}/summary")

    row = summary.first().asDict()
    row["vocab_rows"] = vocab.count()
    print(json.dumps(row))
    q.unpersist()
    docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
