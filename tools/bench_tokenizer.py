"""A/B microbench: Arrow tokenizer aggregation — per-token Python loop
(the pre-round-3 implementation, inlined here as the baseline) vs the
batch-vectorized factorize+argsort grouping now in
``indexing/build.postings_flat_pandas``.

Both run over the same generated corpus in the same session and emit
identical posting rows (the equivalence pytest proves it); this tool
measures only wall time of a full positions=True postings
materialization through each UDF.

Usage: python tools/bench_tokenizer.py [--turns 150000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def old_postings_flat_pandas(base, positions=True, analyzer="standard"):
    """Verbatim shape of the pre-vectorization UDF (round-2 code):
    per-doc Python loop with a defaultdict position accumulator."""
    from collections import defaultdict
    from typing import Iterator

    import pandas as pd

    from miru_spark.analyzers import analyze_py

    want_pos = positions
    an = analyzer

    def tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_term, out_tf, out_pos, out_dl = [], [], [], [], []
            for docint, text in zip(pdf["docint"], pdf["text"]):
                if not text:
                    continue
                toks = analyze_py(text, an)
                acc: dict[str, list[int]] = defaultdict(list)
                for i, t in enumerate(toks):
                    acc[t].append(i)
                for t, ps in acc.items():
                    out_doc.append(docint)
                    out_term.append(t)
                    out_tf.append(len(ps))
                    out_dl.append(len(toks))
                    if want_pos:
                        out_pos.append(ps)
            cols = {
                "term": out_term,
                "docint": out_doc,
                "tf": out_tf,
                "doclen": out_dl,
            }
            if want_pos:
                cols["positions"] = out_pos
            yield pd.DataFrame(cols)

    schema = "term string, docint long, tf int, doclen int" + (
        ", positions array<int>" if positions else ""
    )
    return base.select("docint", "text").mapInPandas(tok, schema=schema)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=150_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from miru_spark.indexing.build import base_with_docint, postings_flat_pandas
    from miru_spark.session import get_spark
    from miru_spark.transcripts import generate_transcripts

    spark = get_spark(
        "tok_bench", master=f"local[{args.cores}]", shuffle_partitions=args.cores
    )
    base = base_with_docint(
        generate_transcripts(spark, n_convs=args.turns // 12, max_turns=24, seed=42)
    ).persist()
    n = base.count()

    def timed(make_df) -> tuple[float, int]:
        best, rows = float("inf"), 0
        for _ in range(args.reps):
            t0 = time.time()
            rows = make_df().count()
            best = min(best, time.time() - t0)
        return round(best, 2), rows

    # warmup both paths once (Arrow serializer + JIT)
    old_postings_flat_pandas(base.limit(2000)).count()
    postings_flat_pandas(base.limit(2000)).count()

    new_sec, new_rows = timed(lambda: postings_flat_pandas(base, positions=True))
    old_sec, old_rows = timed(lambda: old_postings_flat_pandas(base, positions=True))
    assert new_rows == old_rows, (new_rows, old_rows)
    print(
        json.dumps(
            {
                "turns": n,
                "postings": new_rows,
                "cores": args.cores,
                "old_loop_sec": old_sec,
                "vectorized_sec": new_sec,
                "speedup": round(old_sec / new_sec, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
