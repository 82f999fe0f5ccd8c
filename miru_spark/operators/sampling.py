"""Deterministic sampling / splitting for training-data pipelines.

Standard LLM-pipeline operations the reference has no analog for (its
closest notion is per-tenant partition routing,
``MiruPartitioner.java``): carving a corpus into train/val/test and
down-sampling strata (languages, sources, quality bands) to a target
mix. Both must be

- **deterministic**: re-running the pipeline, on any cluster layout,
  assigns every document to the same split — so they key on a content
  hash of the document id, never on RNG or partition index
  (``rand()``/``sampleBy`` give different rows per run/plan);
- **stable under corpus growth**: adding documents never moves an
  existing document between splits (each doc's bucket depends only on
  its own id + salt);
- **cheap at 100 TB**: one projection + filter, no shuffle at all —
  the predicate pushes down to the scan.

Bucketing: ``md5_long(id ‖ '#' ‖ salt) mod 10_000`` — the same
cross-engine 60-bit md5 prefix every dedup operator uses, so the
DuckDB oracle reproduces assignments bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from miru_spark.operators.hashing import md5_long

BUCKETS = 10_000


def _bucket(id_col: Column, salt: str) -> Column:
    return F.pmod(md5_long(F.concat(id_col.cast("string"), F.lit("#" + salt))), F.lit(BUCKETS))


def duckdb_bucket(x: str, salt: str) -> str:
    """DuckDB twin of :func:`_bucket` for oracle SQL."""
    from miru_spark.operators.hashing import DUCKDB_MD5_LONG

    h = DUCKDB_MD5_LONG.format(x=f"({x})::VARCHAR || '#{salt}'")
    return f"(({h}) % {BUCKETS} + {BUCKETS}) % {BUCKETS}"


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every row a named split by hashed-id bucket.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any
    remainder falls into the last split). Split boundaries are
    cumulative bucket thresholds in the listed order, so a doc's split
    depends only on (id, salt, weights) — never on data layout.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = _bucket(F.col(id_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = b < int(round(cum * BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    split = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return docs.withColumn("split", split)


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bucket bound) pairs, for oracle SQL."""
    out, cum = [], 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        out.append((name, int(round(cum * BUCKETS))))
    out.append((names[-1], BUCKETS))
    return out


def weighted_sample(
    docs: DataFrame,
    prob_col: Column | str,
    salt: str = "v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row with ITS OWN probability — deterministic per-doc
    Bernoulli keyed on the hashed id, probability from ``prob_col`` (a
    column or any expression in [0,1], e.g. a quality score or an
    importance weight). The data-mixing primitive behind
    quality-weighted resampling: re-runs keep exactly the same rows,
    adding docs never flips existing ones, and the predicate is a pure
    projection+filter (no shuffle, pushdown-friendly) like the other
    samplers here."""
    b = _bucket(F.col(id_col), salt)
    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    # explicit round before the int cast: Spark's cast truncates while
    # DuckDB's rounds, and float error on p*10000 sits exactly on that
    # edge for 4-dp probabilities
    return docs.where(b < F.round(p * BUCKETS, 0).cast("int"))


def mixture_thresholds(
    totals: dict[str, int], weights: dict[str, float], budget_tokens: int
) -> dict[str, int]:
    """Per-stratum keep-threshold (exclusive bucket bound) for a target
    token mixture: rate_s = min(1, w_s · budget / tokens_s), half-up to
    a bucket count. Pure arithmetic on the collected per-stratum totals
    so the DuckDB oracle (LEAST + ROUND on the same doubles) reproduces
    the thresholds bit-for-bit."""
    import math

    out: dict[str, int] = {}
    for s, wt in weights.items():
        st = totals.get(s)
        if not st:
            continue
        rate = min(1.0, wt * budget_tokens / st)
        # half-up (floor(x+.5)) == Spark F.round == DuckDB ROUND; Python's
        # built-in round() is banker's and would drift on exact halves
        out[s] = int(math.floor(rate * BUCKETS + 0.5))
    return out


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    strata_col: str = "source",
    token_col: str = "n_tokens",
    salt: str = "v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample to a target token MIXTURE: keep a deterministic fraction of
    each stratum (source/domain) so the surviving token mass approaches
    ``weights[s] · budget_tokens`` per stratum — the data-mixing step
    that turns raw crawl proportions into a training recipe (strata not
    listed in ``weights`` are dropped).

    Two jobs at any scale: ONE tiny aggregation (n_strata rows collected
    to the driver — same constant-size collect as the WAND floor) to
    learn per-stratum token totals, then a pure projection+filter pass
    keyed on the hashed doc id — no shuffle on the corpus, predicate
    pushes to the scan, growth-stable like every sampler here. A stratum
    with fewer tokens than its target keeps everything (rate clamps
    at 1)."""
    totals = {
        r[0]: r[1]
        for r in docs.groupBy(strata_col).agg(F.sum(token_col)).collect()
        if r[0] is not None and r[1] is not None
    }
    thresholds = mixture_thresholds(totals, weights, budget_tokens)
    if not thresholds:
        return docs.where(F.lit(False))
    b = _bucket(F.col(id_col), salt)
    thr: Column | None = None
    for s, t in thresholds.items():
        cond = F.col(strata_col) == s
        thr = F.when(cond, F.lit(t)) if thr is None else thr.when(cond, F.lit(t))
    return docs.where(b < thr.otherwise(F.lit(0)))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    default_rate: float = 0.0,
    salt: str = "v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    ``rates`` maps stratum value → keep fraction; strata not listed
    keep ``default_rate``. The classic mix-rebalancing step (boost rare
    languages, down-weight boilerplate-heavy sources). Pure
    projection+filter: no shuffle, pushdown-friendly, and each row's
    fate is independent of every other row.
    """
    b = _bucket(F.col(id_col), salt)
    rate: Column = F.lit(default_rate)
    expr = None
    for value, r in rates.items():
        cond = F.col(strata_col) == value
        expr = F.when(cond, F.lit(r)) if expr is None else expr.when(cond, F.lit(r))
    if expr is not None:
        rate = expr.otherwise(rate)
    return docs.where(b < (rate * BUCKETS).cast("int"))
