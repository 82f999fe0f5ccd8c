"""spark-submit entrypoint: build (or resume) the index over a
transcripts table.

    spark-submit --py-files miru_spark.zip jobs/build_index.py \
        --input /data/transcripts --output /data/index \
        --shards 64 --blocks [--positions] [--append]

On a cluster, package the library with ``python tools/make_zip.py`` and
pass the zip via --py-files; locally the repo root on PYTHONPATH works.
The job is resumable: re-running after a failure re-builds only shards
missing from the manifest (see miru_spark/indexing/incremental.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet dir of transcript turns")
    ap.add_argument("--output", required=True, help="segment store directory")
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--blocks", action="store_true", help="also build block segments")
    ap.add_argument("--append", action="store_true", help="sip-append new rows only")
    ap.add_argument("--merge", action="store_true", help="compact deltas after append")
    ap.add_argument(
        "--format",
        default="auto",
        choices=["auto", "iceberg", "parquet"],
        help="segment table format for --flat builds: auto detects the "
        "Iceberg jars/catalog and falls back to parquet (miru_spark/io.py)",
    )
    ap.add_argument(
        "--flat",
        action="store_true",
        help="single-segment build via InvertedIndex.build_persisted "
        "(format-pluggable) instead of the sharded resumable store "
        "(whose rename-commit units are filesystem-parquet; on Iceberg "
        "the equivalent commit primitive is a snapshot transaction)",
    )
    ap.add_argument(
        "--analyzer",
        default="standard",
        help="per-locale analyzer for --flat builds (analyzers.py: "
        "standard|whitespace|en|en_stop|cjk)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from miru_spark.index import InvertedIndex
    from miru_spark.indexing.incremental import SegmentStore
    from miru_spark.io import resolve_format
    from miru_spark.session import get_spark

    spark = get_spark("miru_build", master=args.master)
    turns = spark.read.parquet(args.input)
    t0 = time.time()
    if args.flat:
        idx = InvertedIndex.build_persisted(
            turns,
            args.output,
            positions=args.positions,
            blocks=args.blocks,
            table_format=args.format,
            analyzer=args.analyzer,
        )
        out = {
            "n_docs": idx.n_docs,
            "avg_doclen": round(idx.avg_doclen, 2),
            "format": resolve_format(spark, args.format),
            "elapsed_sec": round(time.time() - t0, 1),
        }
        print(json.dumps(out))
        spark.stop()
        return
    store = SegmentStore(
        spark,
        args.output,
        n_shards=args.shards,
        positions=args.positions,
        blocks=args.blocks,
    )
    if args.append:
        store.append(turns)
    else:
        store.build(turns)
    if args.merge:
        for s in range(args.shards):
            store.merge_shard(s)
    idx = store.load()
    out = {
        "n_docs": idx.n_docs,
        "avg_doclen": round(idx.avg_doclen, 2),
        "units": len(store.live_units()),
        "format": "parquet",
        "elapsed_sec": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
