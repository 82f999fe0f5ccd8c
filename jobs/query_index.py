"""spark-submit entrypoint: run queries against a built segment store.

    spark-submit --py-files miru_spark.zip jobs/query_index.py \
        --index /data/index --query "error AND timeout" -k 10 \
        [--strategy bm25|time] [--ts-lo ...] [--ts-hi ...]
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--strategy", default="bm25", choices=["bm25", "time"])
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--ts-lo", default=None)
    ap.add_argument("--ts-hi", default=None)
    ap.add_argument(
        "--as-of",
        type=int,
        default=None,
        help="serve a store snapshot (a saved SegmentStore.snapshot_id); "
        "errors if compaction has expired it",
    )
    ap.add_argument(
        "--flat",
        action="store_true",
        help="read a single-segment InvertedIndex directory (the "
        "build_index.py --flat layout) instead of the sharded store",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from miru_spark.index import InvertedIndex
    from miru_spark.indexing.incremental import SegmentStore
    from miru_spark.query.bm25 import search
    from miru_spark.session import get_spark

    if args.flat and args.as_of is not None:
        ap.error("--as-of requires the sharded store; a --flat index has no snapshots")

    spark = get_spark("miru_query", master=args.master)
    if args.flat:
        idx = InvertedIndex.load(spark, args.index)
    else:
        idx = SegmentStore(spark, args.index, n_shards=args.shards).load(
            as_of=args.as_of
        )
    out = search(
        idx,
        args.query,
        k=args.k,
        ts_lo=args.ts_lo,
        ts_hi=args.ts_hi,
        strategy=args.strategy,
    )
    for row in out.collect():
        print(
            f"{row['score']:.6f}\t{row['docint']}\t{row['conv_id']}\t{row['turn_idx']}"
        )
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
