"""Percolation — reverse search: match incoming documents against a
registry of STORED queries (Elasticsearch percolator semantics,
conjunctive form).

The reference's realtime path pushes matching activity to waiting
consumers (``miru-service/.../realtime/...`` routing via per-plugin
filters); percolation is the batch-native equivalent: given the stored
alert/subscription queries, one job labels every doc in a batch with
the queries it satisfies — the alerting stage of a streaming ingest.

Scale notes (100 TB): the stored-query registry is small (thousands of
rows) → exploded to (qid, term) and BROADCAST; the probe is one
postings scan joined against that broadcast (only postings whose term
appears in some query survive — Catalyst pushes the semi-join
predicate), one groupBy(docint, qid) partial-agg counting matched
terms, and an ALL-terms check against the broadcast query sizes. No
shuffle of the corpus beyond the single count aggregation; output is
proportional to matches, not corpus × queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex


def percolate(
    index: InvertedIndex, queries: list[tuple[str, list[str]]]
) -> DataFrame:
    """Match every indexed doc against stored conjunctive term queries.

    ``queries`` = [(qid, [term, ...]), ...]; a doc matches a qid iff it
    contains ALL the query's terms. Returns (qid, docint, conv_id,
    turn_idx) — one row per (matching doc, query) pair, tombstones
    masked like every serving path.
    """
    spark = index.postings.sparkSession
    rows = [
        (qid, term)
        for qid, terms in queries
        for term in dict.fromkeys(terms)  # dedupe, keep order
    ]
    qterms = F.broadcast(
        spark.createDataFrame(rows, "qid string, term string")
    )
    qsizes = F.broadcast(
        spark.createDataFrame(
            [(qid, len(set(terms))) for qid, terms in queries],
            "qid string, n_terms int",
        )
    )
    hits = (
        index.postings.select("term", "docint")
        .join(qterms, "term")
        .groupBy("docint", "qid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(qsizes, "qid")
        .where(F.col("_n") == F.col("n_terms"))
        .select("qid", "docint")
    )
    if index.tombstones is not None:
        hits = hits.join(
            index.tombstones.select("docint"), "docint", "left_anti"
        )
    return hits.join(
        index.docs.select("docint", "conv_id", "turn_idx"), "docint"
    ).select("qid", "docint", "conv_id", "turn_idx")
