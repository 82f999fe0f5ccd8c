"""Block-max WAND top-k over compressed posting-block segments.

Batch adaptation of block-max WAND (Ding & Suel, SIGIR 2011 — "Faster
top-k document retrieval using block-max indexes"); the reference's
analogous prunings are the per-block atomized storage
(``LabInvertedIndex.java:268-292``) and the carry-over score floor
``minScore`` that gates heap inserts across partitions
(``miru-stream-plugins/.../fulltext/FullText.java:134-135,203-218``).

Because blocks are keyed by fixed docint *ranges*, every query term's
postings for a given doc live in the same ``block_id`` — a block can be
scored completely on its own (no cross-block doc reconciliation):

- **AND**: a doc can only match inside a ``block_id`` carried by ALL
  query terms → block-level semi-join prunes first, then each surviving
  block group decodes + intersects + scores in numpy.
- **OR (WAND)**: two phases. Phase 1 scores the P blocks with the
  highest upper bound ``ub_sum = Σ_t idf(t)·max_tfc(t, block)`` and
  takes the k-th score as floor; phase 2 scores only blocks with
  ``ub_sum > floor`` (strict: an equal-ub block cannot beat the floor
  by the (score, docint) tie-break... it can tie by score but then
  loses or wins on docint — equal-ub blocks are kept). The floor
  travels as a broadcast scalar, not driver-side per-block state, so
  the plan stays fully distributed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.indexing.codec import varint_decode
from miru_spark.query.bm25 import idf_col

SCORED_SCHEMA = "docint long, score double"


def _decode(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    gaps = varint_decode(row.docs_bin)
    docs = np.cumsum(gaps, dtype=np.uint64).astype(np.int64)
    tfs = varint_decode(row.tfs_bin).astype(np.float64)
    dls = varint_decode(row.dls_bin).astype(np.float64)
    return docs, tfs, dls


def _tfc(tfs: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    from miru_spark.indexing.blocks import B, K1

    return tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))


def _score_or_group(pdf: pd.DataFrame, avgdl: float) -> pd.DataFrame:
    """Full OR scores for all docs of one block_id."""
    all_docs = []
    all_scores = []
    for row in pdf.itertuples():
        docs, tfs, dls = _decode(row)
        all_docs.append(docs)
        all_scores.append(row.idf * _tfc(tfs, dls, avgdl))
    docs = np.concatenate(all_docs)
    scores = np.concatenate(all_scores)
    order = np.argsort(docs, kind="stable")
    docs, scores = docs[order], scores[order]
    starts = np.nonzero(np.concatenate(([True], docs[1:] != docs[:-1])))[0]
    return pd.DataFrame(
        {"docint": docs[starts], "score": np.add.reduceat(scores, starts)}
    )


def _score_and_group(pdf: pd.DataFrame, avgdl: float, n_terms: int) -> pd.DataFrame:
    """Scores for docs present under ALL query terms of one block_id."""
    decoded = [_decode(row) for row in pdf.itertuples()]
    idfs = [row.idf for row in pdf.itertuples()]
    if len(decoded) < n_terms:
        return pd.DataFrame({"docint": [], "score": []})
    common = decoded[0][0]
    for docs, _, _ in decoded[1:]:
        common = common[np.isin(common, docs, assume_unique=True)]
        if common.size == 0:
            return pd.DataFrame({"docint": [], "score": []})
    score = np.zeros(common.size, dtype=np.float64)
    for (docs, tfs, dls), idf in zip(decoded, idfs):
        pos = np.searchsorted(docs, common)
        score += idf * _tfc(tfs[pos], dls[pos], avgdl)
    return pd.DataFrame({"docint": common, "score": score})


def _qblocks(index, terms: list[str]) -> DataFrame:
    qt = F.broadcast(
        index.terms.where(F.col("term").isin(terms)).select(
            "term", idf_col(F.col("df"), index.n_docs).alias("idf")
        )
    )
    return index.blocks.where(F.col("term").isin(terms)).join(qt, "term")


def _block_ub_tfc(index) -> F.Column:
    """Drift-proof block tf-component bound: tfc(max_tf, min_dl) at the
    CURRENT corpus avgdl. Valid even when blocks were encoded under an
    older avgdl (incremental stores): tfc is increasing in tf and
    decreasing in dl, so the pair dominates every posting in the block."""
    from miru_spark.indexing.blocks import B, K1

    tf = F.col("max_tf").cast("double")
    dl = F.col("min_dl").cast("double")
    return (
        tf
        * F.lit(K1 + 1.0)
        / (tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl / F.lit(index.avg_doclen)))
    )


def _mask_tombstones(index, scored: DataFrame) -> DataFrame:
    """Removal mask (reference MiruRemovalIndex semantics): soft-deleted
    docs are masked out of EVERY serving path, including the block ones.
    Applied before any floor/top-k so WAND's pruning floor can never be
    set by a deleted doc."""
    if index.tombstones is None:
        return scored
    return scored.join(index.tombstones.select("docint"), "docint", "left_anti")


def _topk(scored: DataFrame, k: int) -> DataFrame:
    return scored.orderBy(F.desc("score"), F.desc("docint")).limit(k)


# NOTE on per-query caching (round-4 A/B finding): round 3 cached the
# block working set (`_qblocks(...).cache()`) and eagerly collected the
# top-k to release it. Interleaved A/B against the uncached round-2
# plan measured the caches as a pure LOSS — +36-43% on the sf0.1
# blockmax/WAND rows: caching the payload-bearing relation pushes the
# whole compressed block set through the block-manager serializer, the
# count that sizes the adaptive branch then pays the materialization,
# and the eager collect+createDataFrame+unpersist round-trips add fixed
# driver latency — all to save a term-pruned metadata re-scan that the
# parquet reader serves from row-group stats anyway. Both paths are
# therefore fully LAZY with NO per-query caches (nothing to leak across
# repeated queries — the round-3 storage-leak concern is moot with
# nothing persisted).


def search_blocks_and(index, terms: list[str], k: int = 10) -> DataFrame:
    """Conjunctive BM25 top-k over block segments. ``_qblocks`` appears
    twice in the plan (block-level count, payload scoring) — both are
    term-pruned scans of the blocks table, cheaper recomputed than
    cached (see the module NOTE); nothing is cached, so the plan
    stays lazy with no storage to release."""
    terms = sorted(set(terms))
    n = len(terms)
    qb = _qblocks(index, terms)
    cand = (
        qb.groupBy("block_id")
        .agg(F.count(F.lit(1)).alias("nt"))
        .where(F.col("nt") == n)
        .select("block_id")
    )
    avgdl = index.avg_doclen

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_and_group(pdf, avgdl, n)

    scored = (
        qb.join(cand, "block_id", "left_semi")
        .groupBy("block_id")
        .applyInPandas(run, schema=SCORED_SCHEMA)
    )
    return _topk(_mask_tombstones(index, scored), k)


def search_blocks_or(
    index, terms: list[str], k: int = 10, probe_blocks: int = 16
) -> DataFrame:
    """Disjunctive BM25 top-k with block-max WAND pruning.

    Adaptive: when the candidate block set is already small (≤ 8x the
    probe budget) the two-phase floor probe costs more than it saves —
    score everything in one pass instead. The pruning engages exactly
    where it matters: terms with large posting counts."""
    terms = sorted(set(terms))
    qb = _qblocks(index, terms).withColumn(
        "ub", F.col("idf") * _block_ub_tfc(index)
    )
    # ubs feeds up to three jobs (count, floor probe, survivor filter);
    # recomputing it is a term-pruned metadata scan — cheaper than a
    # cache whose materialization the first count would pay for and
    # whose release would force an eager result (see module NOTE)
    ubs = qb.groupBy("block_id").agg(F.sum("ub").alias("ub_sum"))
    avgdl = index.avg_doclen

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_or_group(pdf, avgdl)

    n_cand = ubs.count()
    if n_cand <= probe_blocks * 8:
        scored = qb.groupBy("block_id").applyInPandas(run, schema=SCORED_SCHEMA)
        return _topk(_mask_tombstones(index, scored), k)

    # phase 1: exact-score the P most-promising blocks → floor
    # (masked FIRST: a tombstoned doc must not set the pruning floor)
    probe_ids = ubs.orderBy(F.desc("ub_sum")).limit(probe_blocks)
    probe_scored = _mask_tombstones(
        index,
        qb.join(F.broadcast(probe_ids.select("block_id")), "block_id", "left_semi")
        .groupBy("block_id")
        .applyInPandas(run, schema=SCORED_SCHEMA),
    )
    top_probe = _topk(probe_scored, k).collect()
    floor = top_probe[k - 1]["score"] if len(top_probe) >= k else float("-inf")

    # phase 2: only blocks whose upper bound clears the floor
    survivors = ubs.where(F.col("ub_sum") >= F.lit(floor)).select("block_id")
    scored = (
        qb.join(survivors, "block_id", "left_semi")
        .groupBy("block_id")
        .applyInPandas(run, schema=SCORED_SCHEMA)
    )
    return _topk(_mask_tombstones(index, scored), k)
