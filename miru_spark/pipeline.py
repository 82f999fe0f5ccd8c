"""End-to-end training-data preparation pipeline.

Chains the corpus-preparation operators into the job a 100 TB
pretraining pipeline actually runs, in the canonical order:

1. **Quality gate** — drop docs below a composite quality floor
   (the ``textstats.quality_feature_cols`` expressions, inline) or
   above a duplicate-n-gram repetition ceiling (the per-row
   ``textstats.gram_stats_udf`` Arrow UDF); a pure per-row filter on
   the corpus scan, no shuffle.
2. **Exact dedup** — one survivor (min id) per normalized-text
   fingerprint (``dedup.fingerprint``).
3. **Near dedup** — n-gram Jaccard candidate pairs over the exact-level
   survivors, connected components over the pair graph, keep only each
   cluster's canonical doc (``components.dedup_corpus``).
3b. **Decontamination** (optional, when a ``bench`` eval set is given)
   — drop survivors sharing any token n-gram with the benchmark
   (``textstats.decontaminate``; the benchmark gram set broadcasts, so
   the stage is one extra scan of the already-deduped survivors).
4. **Split** — deterministic hashed-id train/val/test assignment
   (``sampling.hash_split``; stable under corpus growth and layout).
5. **Pack** — concat-and-chunk sequence layout per split
   (``packing.pack_chunks(part_cols=["split"])``), each split's token
   stream starting at offset 0.

Every stage is deterministic (id-ordered, hash-keyed), so the whole
pipeline is reproducible run-to-run and oracle-checkable end-to-end —
the driver query ``pipeline_prepare`` replays ALL five stages in one
DuckDB SQL statement and hash-compares the final packed layout.

Scale shape: stages 1-3 are the operators' own scale-safe plans
(shingle equi-join with the df cap, no crossJoin, label propagation in
O(log d) rounds); stage 4 is a stateless column expression; stage 5's
only coordination is the P×|splits|-row totals collect. Nothing here
collects doc rows to the driver.

Reference analog: none (Miru predates LLM pipelines) — this is the
brief's training-data mandate composed from the §2-extension operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prepare_training_data(
    docs: DataFrame,
    budget: int = 512,
    quality_min: float = 0.3,
    rep_max: float = 0.5,
    jaccard: float = 0.5,
    near_k: int = 3,
    bench: DataFrame | None = None,
    contam_ngram: int = 13,
    weights: dict[str, float] | None = None,
    salt: str = "v1",
    id_col: str = "doc_id",
    text_col: str = "text",
    collect_metrics: bool = False,
    cache_stages: bool = True,
) -> tuple[DataFrame, dict]:
    """Run the five-stage pipeline; returns (packed, metrics).

    ``packed`` columns: (split, id, n_tokens, start, seq_id, seq_off,
    seq_last) — one row per surviving doc with its packed position.
    ``metrics`` holds per-stage doc counts when ``collect_metrics``
    (each count is one extra job; leave off inside larger plans).

    ``cache_stages`` persists each stage's survivor relation: every
    stage output is consumed by SEVERAL downstream branches (exact's
    survivors feed the pair join, the component builder AND the final
    semi-join), and without a cache each branch re-runs the whole
    upstream lineage — re-reading and re-tokenizing the corpus once per
    branch (see BENCH/BASELINE.md for the measured effect at sf0.1).
    Spark evicts blocks LRU under memory pressure, so at 100 TB the
    cache degrades to recompute instead of failing.
    """
    from miru_spark.operators.components import dedup_corpus
    from miru_spark.operators.dedup import fingerprint, ngram_jaccard_pairs
    from miru_spark.operators.packing import pack_chunks
    from miru_spark.operators.sampling import hash_split
    from miru_spark.operators.textstats import quality_gate, token_counts

    import time as _time

    metrics: dict = {}
    _t0 = _time.time()

    def _lap(key: str) -> None:
        # the count() that precedes each _lap materializes the persisted
        # stage, so the lap ≈ that stage's wall-time
        nonlocal _t0
        metrics[f"t_{key}_s"] = round(_time.time() - _t0, 2)
        _t0 = _time.time()

    if collect_metrics:
        metrics["docs_in"] = docs.count()
        _lap("read")

    # 1. quality + repetition gates — a pure per-row filter on the
    # corpus scan, zero shuffles (see textstats.quality_gate)
    filtered = quality_gate(
        docs, quality_min, rep_max, rep_n=3, text_col=text_col
    )
    if cache_stages:
        filtered = filtered.persist()
    if collect_metrics:
        metrics["docs_after_quality"] = filtered.count()
        _lap("quality")

    # 2. exact dedup: min id per fingerprint
    keep_exact = (
        fingerprint(filtered, id_col, text_col)
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    exact = filtered.join(keep_exact, id_col, "left_semi")
    if cache_stages:
        exact = exact.persist()
    if collect_metrics:
        metrics["docs_after_exact_dedup"] = exact.count()
        _lap("exact_dedup")

    # 3. near dedup: pair graph -> components -> canonical survivors
    # near_k: 3-gram shingles for the small-corpus catalog/oracle runs;
    # real web-scale corpora use 5+ (rarer shingles => smaller candidate
    # buckets under the same df cap — see tools/bench_pipeline_soak.py)
    # reuse the metrics count as the SHJ-gate corpus size (saves the
    # extra count action inside ngram_jaccard_pairs when metrics are on)
    pairs = ngram_jaccard_pairs(exact, k=near_k, threshold=jaccard,
                                id_col=id_col, text_col=text_col,
                                n_docs=metrics.get("docs_after_exact_dedup"))
    deduped = dedup_corpus(exact, pairs, id_col=id_col)
    if cache_stages:
        deduped = deduped.persist()
    if collect_metrics:
        metrics["docs_after_near_dedup"] = deduped.count()
        _lap("near_dedup")

    # 3b. benchmark decontamination over the (smaller) survivor set
    if bench is not None:
        from miru_spark.operators.textstats import decontaminate

        clean = (
            decontaminate(deduped, bench, n=contam_ngram,
                          id_col=id_col, text_col=text_col)
            .where(~F.col("contaminated"))
            .select(F.col("id").alias(id_col))
        )
        deduped = deduped.join(clean, id_col, "left_semi")
        if cache_stages:
            deduped = deduped.persist()
        if collect_metrics:
            metrics["docs_after_decontam"] = deduped.count()
            _lap("decontam")

    # 4. deterministic split, 5. per-split chunk packing
    split = hash_split(deduped, weights, salt=salt, id_col=id_col)
    toks = token_counts(split, id_col, text_col).select("id", "n_tokens")
    packed = pack_chunks(
        split.select(F.col(id_col).alias("id"), "split").join(toks, "id"),
        budget=budget,
        id_col="id",
        part_cols=["split"],
    )
    if collect_metrics:
        packed = packed.persist()
        metrics["splits"] = {
            r["split"]: r["n"]
            for r in packed.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        metrics["total_tokens"] = packed.agg(F.sum("n_tokens")).collect()[0][0]
        _lap("split_pack")
    return packed, metrics
