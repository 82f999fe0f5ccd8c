"""spark-submit entrypoint: forward-sync one segment store to another.

    spark-submit --py-files miru_spark.zip jobs/sync_store.py \
        --src /data/index_a --dest /data/index_b \
        --src-shards 16 --dest-shards 16 [--loop-seconds 60]

One invocation ships every source unit not yet recorded in the
destination's sync cursor (see miru_spark/indexing/sync.py); with
``--loop-seconds`` it keeps polling — the reference's long-running
MiruSyncSender loop.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dest", required=True)
    ap.add_argument("--src-shards", type=int, default=16)
    ap.add_argument("--dest-shards", type=int, default=16)
    ap.add_argument("--loop-seconds", type=float, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from miru_spark.indexing.incremental import SegmentStore
    from miru_spark.indexing.sync import SyncSender
    from miru_spark.session import get_spark

    spark = get_spark("miru_sync", master=args.master)
    sender = SyncSender(
        SegmentStore(spark, args.src, n_shards=args.src_shards),
        SegmentStore(spark, args.dest, n_shards=args.dest_shards),
    )
    while True:
        t0 = time.time()
        r = sender.sync()
        print(json.dumps({**r, "sec": round(time.time() - t0, 3)}))
        if args.loop_seconds is None:
            break
        time.sleep(args.loop_seconds)
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
