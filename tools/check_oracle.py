"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry via Spark and its ``oracle_sql()`` twin
via DuckDB at the given sf dir, then compares row count, column names,
and order-insensitive values (floats to 6 significant digits). Usage::

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from miru_spark.session import get_spark  # noqa: E402

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.6g}")
            elif v is None:
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracle", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            df = fn(spark, sf_dir)
            print(f"{name}: rows-only check -> {df.count()} rows")
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        if scols != dcols:
            print(f"{name}: FAIL cols spark={scols} duckdb={dcols}")
            n_fail += 1
            continue
        if len(sdf) != len(ddf):
            print(f"{name}: FAIL rows spark={len(sdf)} duckdb={len(ddf)}")
            n_fail += 1
            continue
        a = normalize(sdf.to_dict("records"), scols)
        b = normalize(ddf.to_dict("records"), scols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"{name}: FAIL values ({len(diffs)}+ diffs) e.g. {diffs}")
            n_fail += 1
        else:
            print(f"{name}: PASS ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
