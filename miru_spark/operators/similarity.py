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

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    # floored at 1e-6: a zero embedding (padding / failed encode) must
    # yield cosine 0 against everything, not DIVIDE_BY_ZERO under
    # Spark's default ANSI mode (the numpy twins guard the same way;
    # the DuckDB oracle twin applies the identical greatest() floor)
    return F.greatest(
        F.sqrt(
            F.aggregate(
                F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        F.lit(1e-6),
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


#: cosine_dup_pairs refuses corpora above this size unless the caller
#: passes unsafe_exact=True — the all-pairs crossJoin is O(n²) and exists
#: only as the exact correctness twin for cosine_dup_pairs_lsh.
EXACT_PAIRS_MAX_ROWS = 100_000


def cosine_dup_pairs(
    emb: DataFrame, threshold: float = 0.9, id_col: str = "vec_id",
    vec_col: str = "embedding", unsafe_exact: bool = False,
) -> DataFrame:
    """(id_a, id_b, cosine) for pairs with cosine ≥ threshold.

    NOT scale-safe: O(n²) crossJoin. This is the exact twin that proves
    ``cosine_dup_pairs_lsh``'s recall; use the LSH path on real corpora.
    Raises ValueError above EXACT_PAIRS_MAX_ROWS rows unless
    ``unsafe_exact=True``.
    """
    if not unsafe_exact:
        n = emb.count()
        if n > EXACT_PAIRS_MAX_ROWS:
            raise ValueError(
                f"cosine_dup_pairs is the O(n²) exact baseline; corpus has "
                f"{n} rows > {EXACT_PAIRS_MAX_ROWS}. Use cosine_dup_pairs_lsh, "
                f"or pass unsafe_exact=True if you really mean it."
            )
    # norms computed ONCE per vector (bit-identical to per-pair
    # recomputation — same sqrt(Σx²) per side, just not repeated n times)
    a = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
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


def _all_planes(dim: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    """(n_tables, n_bits, dim) — one independent hyperplane set per table."""
    return np.stack(
        [_hyperplanes(dim, n_bits, seed + 7919 * t) for t in range(n_tables)]
    )


def lsh_bucket_assignments(
    emb: DataFrame,
    n_bits: int = 6,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table, bucket) — the build-time LSH index relation.

    One Arrow-batched numpy matmul per batch assigns every vector its
    bucket in all L tables at once (no per-row Python, no per-table
    column churn). This is the persisted half of the ANN path: written
    once at index-build time, probed by (table, bucket) key at query
    time — query cost scales with probed-bucket size, not corpus size.
    """

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        pow2 = 1 << np.arange(n_bits, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)  # (n, dim)
            if planes is None:
                planes = _all_planes(V.shape[1], n_bits, n_tables, seed)
            # (T, n): bucket id per table
            proj = np.einsum("tbd,nd->tnb", planes, V) >= 0
            buckets = (proj * pow2).sum(axis=2)  # (T, n)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.tile(pdf[id_col].to_numpy(), n_tables),
                    "table": np.repeat(np.arange(n_tables, dtype=np.int32), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    return emb.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        assign, schema="vec_id long, table int, bucket long"
    )


def cosine_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    n_bits: int = 4,
    n_tables: int = 24,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_vecs: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via sign-LSH candidate generation — the
    scale path that replaces :func:`cosine_dup_pairs`' all-pairs
    crossJoin (the O(n²) anti-pattern).

    Shape mirrors ``dedup.minhash_lsh_pairs``: candidates are pairs that
    share a (table, bucket) cell — an equi-join, sub-quadratic when the
    buckets are selective — then EXACT cosine verifies each candidate,
    so output pairs carry exact (4dp-rounded) scores and there are no
    false positives. Recall is the only approximation; the defaults
    (b=4, L=24) give recall 1.0 against the exact pair set on the test
    corpora at threshold 0.4 (asserted in pytest AND by the driver
    oracle, which is the exact-pair SQL). At higher corpus scale raise
    ``n_bits`` ~log₂(n/target_bucket_size) to keep buckets bounded, and
    raise ``n_tables`` to hold recall; a higher ``threshold`` needs far
    fewer tables (collision prob per bit grows with cosine).
    """
    # cache: the self-join below would otherwise re-run the mapInPandas
    # bucket assignment (and re-scan the embeddings) once per side
    assign = lsh_bucket_assignments(
        emb, n_bits=n_bits, n_tables=n_tables, seed=seed,
        id_col=id_col, vec_col=vec_col,
    ).cache()
    from miru_spark.operators.dedup import _shj

    if n_vecs is None:
        n_vecs = emb.count()
    a = assign.alias("a")
    b = assign.alias("b")
    cand = (
        a.join(
            # hash build per (table, bucket) partition — sort-merge
            # sorts the bucket-ballooned sides and spills; size-gated
            # so small corpora keep the free broadcast plan
            # (dedup._shj, BENCH/BASELINE.md round-4)
            _shj(b, n_vecs),
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .distinct()
    )
    # norms once per vector, not per candidate pair (bit-identical)
    ea = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    eb = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                4,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


class LshIndex:
    """Build-time-persisted multi-table sign-LSH ANN index.

    The index IS the ``(vec_id, table, bucket)`` relation from
    :func:`lsh_bucket_assignments` plus the hash-family parameters.
    Built ONCE over the corpus; a query computes its own bucket keys
    driver-side in numpy (no Spark job, no corpus re-hash) and probes
    the stored relation by literal (table, bucket) predicates — with
    ``save()``'s table-partitioned, bucket-sorted layout those prune to
    the probed files/row-groups, so query cost is proportional to the
    probed buckets, not the corpus.

    Exact cosine runs only inside the probed candidate set, so returned
    scores are exact; approximation lives purely in candidate selection.
    Recall for neighbors at angle θ is ``1 - (1 - p(θ)^b)^L`` (boosted
    by Hamming-1 multiprobe); tables multiply recall where one wide
    code would collapse it.
    """

    def __init__(
        self,
        assignments: DataFrame,
        dim: int,
        n_bits: int,
        n_tables: int,
        seed: int,
    ):
        self.assignments = assignments
        self.dim = dim
        self.n_bits = n_bits
        self.n_tables = n_tables
        self.seed = seed

    @classmethod
    def build(
        cls,
        emb: DataFrame,
        n_bits: int = 6,
        n_tables: int = 8,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "LshIndex":
        dim = len(emb.select(vec_col).first()[0])
        assign = lsh_bucket_assignments(
            emb, n_bits=n_bits, n_tables=n_tables, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
        return cls(assign, dim, n_bits, n_tables, seed)

    def save(self, path: str) -> None:
        import json
        import os

        (
            # key the write shuffle on (table, bucket), not table alone:
            # n_tables distinct keys would cap the write at n_tables
            # tasks at any corpus size (the same ceiling fixed in
            # index.py's segment write); bucket fans it out while
            # partitionBy still groups files per table directory
            self.assignments.repartition("table", "bucket")
            .sortWithinPartitions("table", "bucket")
            .write.mode("overwrite")
            .partitionBy("table")
            .parquet(f"{path}/assignments")
        )
        meta = {
            "dim": self.dim,
            "n_bits": self.n_bits,
            "n_tables": self.n_tables,
            "seed": self.seed,
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark, path: str) -> "LshIndex":
        import json
        import os

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(
            spark.read.parquet(f"{path}/assignments"),
            int(meta["dim"]), int(meta["n_bits"]),
            int(meta["n_tables"]), int(meta["seed"]),
        )

    def _query_probes(
        self, qvec: np.ndarray, multiprobe: bool
    ) -> list[tuple[int, list[int]]]:
        """Driver-side (numpy) bucket keys for a query vector."""
        planes = _all_planes(self.dim, self.n_bits, self.n_tables, self.seed)
        pow2 = 1 << np.arange(self.n_bits, dtype=np.int64)
        out = []
        for t in range(self.n_tables):
            qb = int((((planes[t] @ qvec) >= 0) * pow2).sum())
            probes = [qb] + (
                [qb ^ (1 << i) for i in range(self.n_bits)] if multiprobe else []
            )
            out.append((t, probes))
        return out

    def topk(
        self,
        emb: DataFrame,
        query_id: int,
        k: int = 10,
        multiprobe: bool = True,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        row = emb.where(F.col(id_col) == query_id).select(vec_col).first()
        if row is None:
            raise KeyError(f"{id_col}={query_id} not found in embeddings")
        qvec = np.array(row[0], dtype=np.float64)
        pred = None
        for t, probes in self._query_probes(qvec, multiprobe):
            c = (F.col("table") == t) & F.col("bucket").isin(probes)
            pred = c if pred is None else (pred | c)
        cand = self.assignments.where(pred).select("vec_id").distinct()
        qlit = F.array(*[F.lit(float(x)) for x in qvec])
        return (
            emb.join(
                cand.withColumnRenamed("vec_id", id_col), id_col, "left_semi"
            )
            .where(F.col(id_col) != query_id)
            .select(
                F.col(id_col),
                F.round(
                    _dot(F.col(vec_col), qlit)
                    / (_norm(F.col(vec_col)) * _norm(qlit)),
                    4,
                ).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k)
        )


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
    index: LshIndex | None = None,
) -> DataFrame:
    """ANN top-k via multi-table sign-LSH (convenience wrapper).

    Pass a prebuilt ``index`` to amortize the build across queries —
    the production shape. Without one, the index relation is computed
    inline (one corpus pass), which is only sensible for one-off use.
    """
    if index is None:
        index = LshIndex.build(
            emb, n_bits=n_bits, n_tables=n_tables, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    return index.topk(
        emb, query_id, k=k, multiprobe=multiprobe,
        id_col=id_col, vec_col=vec_col,
    )


# ---------------------------------------------------------------------------
# IVF — inverted-file ANN index (coarse quantizer + probed lists)
# ---------------------------------------------------------------------------


def _train_centroids(
    X: np.ndarray, n_lists: int, iters: int, seed: int
) -> np.ndarray:
    """Spherical k-means (Lloyd's on the unit sphere) over a bounded
    training sample — pure numpy, deterministic under ``seed``.

    Standard IVF practice: the coarse quantizer trains on a sample
    (FAISS trains IVF on ~256 vectors/list), then assignment runs
    distributed over the full corpus. Empty lists reseed to the point
    farthest from its centroid so every list stays live."""
    rng = np.random.default_rng(seed)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    # a training sample smaller than n_lists clamps the list count (a
    # tiny corpus needs no finer quantizer) instead of crashing
    # rng.choice(replace=False)
    n_lists = min(n_lists, len(Xn))
    C = Xn[rng.choice(len(Xn), size=n_lists, replace=False)].copy()
    for _ in range(iters):
        sims = Xn @ C.T  # (n, n_lists) cosine since both unit-norm
        assign = sims.argmax(axis=1)
        for j in range(n_lists):
            members = Xn[assign == j]
            if len(members) == 0:
                # reseed dead list with the globally worst-fit point
                worst = sims.max(axis=1).argmin()
                C[j] = Xn[worst]
            else:
                m = members.sum(axis=0)
                C[j] = m / max(np.linalg.norm(m), 1e-12)
    return C


def _sample_train_centroids(
    emb: DataFrame,
    n_lists: int,
    sample: int,
    iters: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> np.ndarray:
    """Deterministic bounded training sample (lowest-xxhash rows — a
    TakeOrdered, no full sort materialization at scale) fed to
    :func:`_train_centroids`. Shared by IvfIndex.build and
    cluster_embeddings."""
    rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(sample)
        .collect()
    )
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    return _train_centroids(X, n_lists=n_lists, iters=iters, seed=seed)


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_sim: bool = False,
    list_col: str = "list",
) -> DataFrame:
    """(vec_id, <list_col>[, sim]) — nearest-centroid assignment, one
    Arrow-batched pass over the corpus (mapInPandas; the centroid matrix
    rides into the closure, ~n_lists*dim floats — broadcast-sized).
    ``with_sim`` appends the cosine to the winning centroid (4dp)."""
    C = centroids.astype(np.float64)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            sims = Xn @ C.T
            best = sims.argmax(axis=1)
            out = {
                "vec_id": pdf[id_col].to_numpy(),
                list_col: best.astype(np.int32),
            }
            if with_sim:
                out["sim"] = np.round(sims[np.arange(len(best)), best], 4)
            yield pd.DataFrame(out)

    schema = f"vec_id long, {list_col} int" + (", sim double" if with_sim else "")
    return emb.select(id_col, vec_col).mapInPandas(assign, schema=schema)


class IvfIndex:
    """Build-time-persisted IVF ANN index — the scale path beside
    :class:`LshIndex` (the brief's "IVF or LSH-bucketed variant").

    Layout mirrors FAISS IndexIVFFlat re-expressed relationally: the
    coarse quantizer is a numpy centroid matrix (driver/broadcast
    scale), the inverted lists are ONE DataFrame ``(vec_id, list)``
    persisted partitioned by ``list`` and probed with literal list-id
    predicates — partition pruning makes a query touch only the
    ``nprobe`` probed lists, never the corpus. Exact cosine runs inside
    the probed candidate set only, so scores are exact; approximation
    lives purely in which lists are probed.
    """

    def __init__(self, assignments: DataFrame, centroids: np.ndarray, seed: int):
        self.assignments = assignments
        self.centroids = centroids
        self.seed = seed

    @classmethod
    def build(
        cls,
        emb: DataFrame,
        n_lists: int = 16,
        sample: int = 4096,
        iters: int = 15,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        C = _sample_train_centroids(
            emb, n_lists, sample, iters, seed, id_col, vec_col
        )
        return cls(ivf_assign(emb, C, id_col, vec_col), C, seed)

    def save(self, path: str) -> None:
        import json
        import os

        (
            # salt the write key for the same reason as the LSH table
            # save: n_lists alone caps write parallelism. The salt is
            # BOUNDED (8 sub-splits per list), not vec_id itself — a
            # near-unique key would scatter every list across every
            # partition and partitionBy("list") would then emit
            # partitions × lists files; bounded salt keeps files ≤ 8
            # per list while lifting the task ceiling to 8 × n_lists
            self.assignments.withColumn(
                "_salt", F.pmod(F.xxhash64("vec_id"), F.lit(8)).cast("int")
            )
            .repartition("list", "_salt")
            .drop("_salt")
            .sortWithinPartitions("list", "vec_id")
            .write.mode("overwrite")
            .partitionBy("list")
            .parquet(f"{path}/assignments")
        )
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {"seed": self.seed, "centroids": self.centroids.tolist()}, f
            )

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        import json
        import os

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(
            spark.read.parquet(f"{path}/assignments"),
            np.array(meta["centroids"], dtype=np.float64),
            int(meta["seed"]),
        )

    def probe_lists(self, qvec: np.ndarray, nprobe: int) -> list[int]:
        """Driver-side: the nprobe nearest coarse centroids (no job)."""
        q = qvec / max(np.linalg.norm(qvec), 1e-12)
        sims = self.centroids @ q
        return [int(i) for i in np.argsort(-sims)[:nprobe]]

    def topk(
        self,
        emb: DataFrame,
        query_id: int,
        k: int = 10,
        nprobe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        row = emb.where(F.col(id_col) == query_id).select(vec_col).first()
        if row is None:
            raise KeyError(f"{id_col}={query_id} not found in embeddings")
        qvec = np.array(row[0], dtype=np.float64)
        probes = self.probe_lists(qvec, nprobe)
        cand = (
            self.assignments.where(F.col("list").isin(probes))
            .select("vec_id")
            .distinct()
        )
        qlit = F.array(*[F.lit(float(x)) for x in qvec])
        return (
            emb.join(cand.withColumnRenamed("vec_id", id_col), id_col, "left_semi")
            .where(F.col(id_col) != query_id)
            .select(
                F.col(id_col),
                F.round(
                    _dot(F.col(vec_col), qlit)
                    / (_norm(F.col(vec_col)) * _norm(qlit)),
                    4,
                ).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k)
        )


def cluster_embeddings(
    emb: DataFrame,
    n_clusters: int = 16,
    sample: int = 4096,
    iters: int = 15,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, sim) — spherical k-means corpus clustering.

    Semantic corpus segmentation for training-data pipelines: topic
    balancing, per-cluster sampling quotas, cluster-aware near-dedup.
    Reuses the IVF coarse-quantizer recipe (:func:`_train_centroids`):
    centroids train driver-side on a bounded deterministic sample
    (lowest-xxhash rows — FAISS trains IVF on ~256 vectors/list), then
    assignment runs distributed in ONE Arrow-batched pass with the
    centroid matrix riding the closure (n_clusters·dim floats). ``sim``
    is the cosine to the assigned centroid, rounded 4dp — the
    confidence/outlier signal.
    """
    C = _sample_train_centroids(
        emb, n_clusters, sample, iters, seed, id_col, vec_col
    )
    return ivf_assign(
        emb, C, id_col, vec_col, with_sim=True, list_col="cluster"
    )
