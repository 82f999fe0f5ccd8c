"""Facet counts over the search answer set.

Search UIs pair every result page with per-field value counts of the
FULL match set ("role: assistant (412), user (301)…") — Solr/ES
faceting. The reference computes exactly this shape by gathering
distinct pivot values of the answer bitmap with cardinality deltas
(``MiruAggregateUtil.gather``, miru-plugin/.../solution/
MiruAggregateUtil.java:953-1096, batched andNot loop); Distincts and
AggregateCounts expose it as query families. Spark-first the iterative
andNot loop collapses into ONE scan + ONE shuffle:

1. answer set = :func:`miru_spark.query.bm25.scored_matches` (index-only
   postings plan — never a corpus scan);
2. one semi-join of the doc relation against the answer;
3. all facet fields unpivot in the SAME pass via ``explode(map(...))``
   (single scan regardless of facet count);
4. ``groupBy(facet, value).count()`` — map-side partial aggregation
   bounds shuffle rows by the VALUE CARDINALITY, not the answer size;
5. per-facet top-N over the aggregated (facet, value, n) rows — a
   window partitioned by facet, whose input is already one row per
   distinct value (for doc metadata facets: tens of rows), never the
   answer set.

At 100 TB the shuffle carries one row per (facet, value) per map task —
the same partial-agg bound the reference gets from per-partition bitmap
cardinalities.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.query.ast import Node
from miru_spark.query.bm25 import scored_matches


def facet_counts(
    index: InvertedIndex,
    query: str | Node,
    facet_cols: tuple[str, ...] = ("role", "tool"),
    top_n: int = 10,
    ts_lo=None,
    ts_hi=None,
) -> DataFrame:
    """Per-facet value counts of every doc matching ``query``.

    Returns (facet, value, n) — top ``top_n`` values per facet by
    (n desc, value asc), rows ordered (facet asc, n desc, value asc).
    NULL field values count as a value (SQL GROUP BY semantics), like
    Solr ``facet.missing``.
    """
    matched = scored_matches(index, query, ts_lo=ts_lo, ts_hi=ts_hi).select(
        "docint"
    )
    kv = F.explode(
        F.create_map(
            *chain.from_iterable(
                (F.lit(c), F.col(c).cast("string")) for c in facet_cols
            )
        )
    ).alias("facet", "value")
    counted = (
        index.docs.join(matched, "docint", "left_semi")
        .select(kv)
        .groupBy("facet", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # input here is one row per distinct (facet, value) — the window is
    # over the aggregated relation, bounded by value cardinality.
    # NULLS LAST matches the DuckDB oracle's default ordering.
    w = Window.partitionBy("facet").orderBy(
        F.desc("n"), F.asc_nulls_last("value")
    )
    return (
        counted.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= top_n)
        .select("facet", "value", "n")
        .orderBy("facet", F.desc("n"), F.asc_nulls_last("value"))
    )


def significant_terms(
    index: InvertedIndex,
    query: str | Node,
    top_n: int = 15,
    min_fg: int = 2,
    ts_lo=None,
    ts_hi=None,
) -> DataFrame:
    """Terms statistically overrepresented in the answer set vs the
    corpus — Elasticsearch ``significant_terms`` with the JLH score
    ``(fgPct - bgPct) · (fgPct / bgPct)``. The reference's trending
    plugin ranks the same foreground/background contrast over time
    buckets; this is the set-vs-corpus variant over the answer bitmap.

    Returns (term, fg, df, score): ``fg`` = answer docs containing the
    term, ``df`` = corpus docs, top ``top_n`` by (score desc, term asc).

    Plan: answer semi-join → ONE groupBy(term) for foreground counts →
    broadcast join against the term-stats relation (already cached,
    broadcast-sized) → score as column arithmetic → TakeOrdered. The
    answer-set size rides along as a broadcast 1-row cross join — no
    driver collect, no window.
    """
    matched = scored_matches(index, query, ts_lo=ts_lo, ts_hi=ts_hi).select(
        "docint"
    )
    fg = (
        index.postings.join(matched, "docint", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fg"))
        .where(F.col("fg") >= min_fg)
    )
    fg_total = matched.agg(F.count(F.lit(1)).alias("_fgt"))
    n_docs = float(index.n_docs)
    fg_pct = F.col("fg") / F.col("_fgt")
    bg_pct = F.col("df") / F.lit(n_docs)
    return (
        fg.join(index.terms.select("term", "df"), "term")
        .crossJoin(F.broadcast(fg_total))
        .withColumn("score", (fg_pct - bg_pct) * (fg_pct / bg_pct))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(top_n)
        .select("term", "fg", "df", "score")
    )
