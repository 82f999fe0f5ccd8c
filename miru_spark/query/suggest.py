"""Term suggestion (autocomplete): popularity-ranked dictionary terms.

The Lucene suggester family ranks completions by document frequency;
the reference exposes only raw distinct-term enumeration over prefix
ranges (``Distincts.gather``, miru-reco-plugins/.../distincts/
Distincts.java:41-159 — served here by ``distincts_prefix``). This adds
the ranked form: one scan of the tiny cached term-stats relation,
(df DESC, term ASC) deterministic order, TakeOrderedAndProject top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex


def suggest_terms(
    index: InvertedIndex, prefix: str, k: int = 10, min_df: int = 1
) -> DataFrame:
    """Top-``k`` dictionary terms starting with ``prefix``, ranked by
    document frequency (ties by term ascending). ``min_df`` drops
    long-tail typo terms the way real suggesters do."""
    return (
        index.terms.where(
            F.col("term").startswith(prefix) & (F.col("df") >= min_df)
        )
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def spell_correct(
    index: InvertedIndex,
    token: str,
    max_dist: int = 2,
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """"Did you mean": top-``k`` dictionary terms within ``max_dist``
    edits of ``token``, ranked (distance asc, df desc, term asc) — the
    Lucene DirectSpellChecker shape over the term-stats relation.

    Length banding prunes the dictionary BEFORE the levenshtein scan
    (|len(term) - len(token)| ≤ max_dist is a necessary condition), the
    same guard the fuzzy query leaves use; the scan runs over the tiny
    cached term-stats relation, never the postings."""
    n = len(token)
    cand = index.terms.where(
        (F.length("term") >= n - max_dist)
        & (F.length("term") <= n + max_dist)
        & (F.col("df") >= min_df)
    ).withColumn("dist", F.levenshtein(F.col("term"), F.lit(token)))
    return (
        cand.where(F.col("dist") <= max_dist)
        .select("term", "df", "dist")
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )
