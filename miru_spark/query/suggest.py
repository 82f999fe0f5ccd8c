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
