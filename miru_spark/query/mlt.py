"""More-like-this: find documents similar to a given document.

Lucene ``MoreLikeThis`` semantics (select the source doc's most
interesting terms by tf·idf, search them as an OR, exclude the source),
which the reference's Lucene dependency ships but its plugins never
expose — the engine serves it natively.

Two-phase plan (the same legitimate shape as the WAND floor in
``query/blockmax.py``): phase 1 collects the source doc's top-N terms —
N scalar rows from one postings lookup, never doc rows — phase 2 is the
standard fused OR search with those terms, which is index-only and
broadcast-weighted. Term selection is deterministic: (tf·idf DESC,
term ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.query.ast import Or, Term
from miru_spark.query.bm25 import idf_col, search


def interesting_terms(
    index: InvertedIndex, docint: int, top_terms: int = 10
) -> list[str]:
    """The source doc's ``top_terms`` terms by tf·idf (ties by term
    ascending) — one small postings lookup, N scalar rows collected."""
    rows = (
        index.postings.where(F.col("docint") == int(docint))
        .join(index.terms.select("term", "df"), "term")
        .withColumn(
            "w", F.col("tf") * idf_col(F.col("df").cast("double"), index.n_docs)
        )
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(top_terms)
        .select("term")
        .collect()
    )
    if not rows:
        raise ValueError(f"docint {docint} has no postings")
    return [r["term"] for r in rows]


def more_like_this(
    index: InvertedIndex, docint: int, top_terms: int = 10, k: int = 10
) -> DataFrame:
    """Top-k docs most similar to ``docint`` (itself excluded), BM25
    over its ``top_terms`` most interesting terms."""
    terms = interesting_terms(index, docint, top_terms)
    query = (
        Term(terms[0])
        if len(terms) == 1
        else Or(tuple(Term(t) for t in terms))
    )
    return search(index, query, k=k, exclude=[int(docint)])
