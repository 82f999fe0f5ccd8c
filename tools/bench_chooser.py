"""Plan-chooser economics bench: flat vs block path vs search_auto.

Builds a deterministic synthetic corpus WITH block segments, then times
each physical path (and the chooser) on 2/3-term AND and OR queries.
The claim under test: the chooser never loses to the worse path (its
pick tracks the measured-faster plan, modulo sandbox timing noise).

    CHOOSER_TURNS=600000 python tools/bench_chooser.py

Prints one JSON line: per query, flat/block/auto seconds + the plan
auto picked. Results are recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_turns = int(os.environ.get("CHOOSER_TURNS", "600000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from miru_spark.index import InvertedIndex
    from miru_spark.query.blockmax import search_blocks_and, search_blocks_or
    from miru_spark.query.bm25 import search
    from miru_spark.query.parser import parse_query
    from miru_spark.query.serve import choose_plan, search_auto
    from miru_spark.session import get_spark
    from miru_spark.transcripts import generate_transcripts

    spark = get_spark(
        "miru_chooser", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    seg = tempfile.mkdtemp(prefix="miru_chooser_")
    turns = generate_transcripts(
        spark, n_convs=max(n_turns // 12, 1), max_turns=24, seed=42
    ).persist()
    turns.count()
    idx = InvertedIndex.build_persisted(turns, seg, blocks=True)
    idx.terms = idx.terms.cache()
    idx.terms.count()
    turns.unpersist()

    cases = [
        ("and2", "w00000 AND w00001", "and", ["w00000", "w00001"]),
        ("and3", "w00000 AND w00001 AND w00002", "and",
         ["w00000", "w00001", "w00002"]),
        ("or2", "w00000 OR w00001", "or", ["w00000", "w00001"]),
        ("or3", "w00000 OR w00001 OR w00002", "or",
         ["w00000", "w00001", "w00002"]),
    ]

    def t(fn):
        best = float("inf")
        for _ in range(2):  # best-of-2: JIT/sandbox noise
            t0 = time.time()
            fn().collect()
            best = min(best, time.time() - t0)
        return round(best, 3)

    out = {}
    for name, q, mode, terms in cases:
        flat = t(lambda: search(idx, q, k=10))
        if mode == "and":
            blk = t(lambda: search_blocks_and(idx, terms, k=10))
        else:
            blk = t(lambda: search_blocks_or(idx, terms, k=10))
        auto = t(lambda: search_auto(idx, q, k=10))
        plan = choose_plan(idx, parse_query(q))
        out[name] = {
            "flat_sec": flat,
            "block_sec": blk,
            "auto_sec": auto,
            "auto_plan": plan,
            "auto_matches_faster": (
                plan.startswith("blocks") == (blk < flat)
            ),
        }
    print(json.dumps({"n_turns": n_turns, "cpus": cpus, "cases": out}))
    shutil.rmtree(seg, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
