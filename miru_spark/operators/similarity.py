"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k for a query vector — the
  correctness baseline. One pass over the table; at 100 TB this is the
  per-partition scan you fall back to inside each probed bucket.
- ``cosine_dup_pairs``: all-pairs near-duplicates above a cosine
  threshold (embedding dedup). Exact at test scale; at real scale the
  LSH bucketing below bounds the pair join.
- ``lsh_bucket_topk``: sign-random-projection LSH — deterministic
  hyperplanes derived from splitmix64, bucket = sign-bit string; probe
  the query's bucket (plus optional multi-probe neighbors at Hamming
  distance 1), exact cosine within the probed set. Sub-linear scan at
  scale; recall measured against the brute-force baseline in tests.

All arithmetic is double-precision in index order so the DuckDB oracle
reproduces values to rounding (cosines rounded to 4dp on both sides).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    emb: DataFrame, query_id: int, k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to the row with ``query_id`` (excluded)."""
    q = F.broadcast(
        emb.where(F.col(id_col) == query_id).select(
            F.col(vec_col).alias("_qvec")
        )
    )
    return (
        emb.crossJoin(q)
        .where(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(
                _dot(F.col(vec_col), F.col("_qvec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("_qvec"))),
                4,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_dup_pairs(
    emb: DataFrame, threshold: float = 0.9, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) for pairs with cosine ≥ threshold."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb"))),
                4,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# -- LSH (sign random projection) -------------------------------------------


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic hyperplanes via splitmix64 → uniform(-1,1)."""
    from miru_spark.transcripts import _splitmix64

    idx = np.arange(dim * n_bits, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    u = _splitmix64(idx).astype(np.float64) / np.float64(2**64)
    return (u.reshape(n_bits, dim) * 2.0 - 1.0)


def lsh_bucket_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_bits: int = 6,
    n_tables: int = 8,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k via multi-table sign-LSH.

    L independent tables of b hyperplane bits each; a vector is a
    candidate if ANY table maps it to the query's bucket (± Hamming-1
    buckets when ``multiprobe``). Exact cosine is computed only inside
    the probed set, so returned scores are exact — approximation lives
    purely in candidate selection. Recall for neighbors at angle θ is
    ``1 - (1 - p(θ)^b·probe_boost)^L`` — tables multiply recall where a
    single wide code would collapse it.
    """
    first = emb.select(vec_col).first()
    dim = len(first[0])

    def bucket_col(vec, planes):
        bits = [
            F.when(_dot(vec, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i, p in enumerate(planes)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    tables = []
    for t in range(n_tables):
        H = _hyperplanes(dim, n_bits, seed + 7919 * t)
        tables.append([F.array(*[F.lit(float(v)) for v in row]) for row in H])

    df = emb
    for t, planes in enumerate(tables):
        df = df.withColumn(f"_b{t}", bucket_col(F.col(vec_col), planes))

    qrow = df.where(F.col(id_col) == query_id).first()
    qvec = F.array(*[F.lit(float(x)) for x in qrow[vec_col]])
    pred = None
    for t in range(n_tables):
        qb = qrow[f"_b{t}"]
        probes = [qb] + (
            [qb ^ (1 << i) for i in range(n_bits)] if multiprobe else []
        )
        c = F.col(f"_b{t}").isin(probes)
        pred = c if pred is None else (pred | c)

    return (
        df.where(pred)
        .where(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(
                _dot(F.col(vec_col), qvec)
                / (_norm(F.col(vec_col)) * _norm(qvec)),
                4,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
