"""InvertedIndex — the engine's per-corpus index handle.

Bundles the four tables a query needs (reference analogs in parens,
enterstudio/miru):

- ``postings`` (field index: (field,term) → bitmap + cardinalities,
  ``miru-plugin/.../index/MiruFieldIndex.java:12-43``)
- ``docs`` (activity row store: docId → stored values + time,
  ``MiruActivityIndex.java:16-45``)
- ``terms`` (global cardinality / df row,
  ``LabFieldIndex.java:474-515``)
- corpus scalars (n_docs, avg_doclen) for BM25.

``build`` is the batch indexer (``MiruIndexer.index``,
``MiruIndexer.java:47-126``); ``save``/``load`` persist term-partitioned
parquet segments (Iceberg-ready layout — the local image has no Iceberg
jars, so the writer targets plain parquet with the same partitioning;
swap ``format("iceberg")`` in on a real cluster).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from miru_spark.indexing.build import (
    corpus_stats,
    doc_stats,
    docs_with_tokens,
    postings_flat,
    term_stats,
)


@dataclass
class InvertedIndex:
    postings: DataFrame  # term, docint, tf [, positions]
    docs: DataFrame  # docint, conv_id, turn_idx, role, tool, ts, doclen
    terms: DataFrame  # term, df, cf, max_docint
    n_docs: int
    avg_doclen: float

    @classmethod
    def build(
        cls, turns: DataFrame, positions: bool = True, cache: bool = True
    ) -> "InvertedIndex":
        docs = docs_with_tokens(turns)
        doc_tbl = doc_stats(docs)
        post = postings_flat(docs, positions=positions)
        if cache:
            doc_tbl = doc_tbl.cache()
            post = post.cache()
        n, avgdl = corpus_stats(doc_tbl)
        terms = term_stats(post)
        if cache:
            terms = terms.cache()
        return cls(post, doc_tbl, terms, n, avgdl)

    def save(self, path: str, n_buckets: int = 32) -> None:
        """Persist as a segment directory.

        Postings are bucketed by term hash (``pmod(xxhash64(term), B)``)
        and sorted by (term, docint) within files — the moral equivalent
        of the reference's term-keyed LSM layout
        (``LabInvertedIndex.java:268-292``): a query for a term set
        touches only the buckets those terms hash to, and parquet
        row-group min/max stats on ``term`` prune within buckets.
        """
        from pyspark.sql import functions as F

        (
            self.postings.withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
            )
            .repartition("bucket")
            .sortWithinPartitions("term", "docint")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{path}/postings")
        )
        self.docs.write.mode("overwrite").parquet(f"{path}/docs")
        self.terms.write.mode("overwrite").parquet(f"{path}/terms")
        meta = {"n_docs": self.n_docs, "avg_doclen": self.avg_doclen}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "InvertedIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(
            spark.read.parquet(f"{path}/postings").drop("bucket"),
            spark.read.parquet(f"{path}/docs"),
            spark.read.parquet(f"{path}/terms"),
            int(meta["n_docs"]),
            float(meta["avg_doclen"]),
        )

    def unpersist(self) -> None:
        for df in (self.postings, self.docs, self.terms):
            try:
                df.unpersist()
            except Exception:
                pass
