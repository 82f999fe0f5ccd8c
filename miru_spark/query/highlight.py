"""Snippet / highlight extraction for query hits.

Reference: ``LuceneBackedQueryParser.highlight``
(``miru-plugin/.../query/LuceneBackedQueryParser.java:56-74``) wraps
matched terms in pre/post tags via Lucene's highlighter. Here: given the
top-k result and the query's positive terms, re-tokenize only the k hit
texts (k rows — driver-scale), find the first match window, and wrap
matched tokens. Pure column expressions; the k-row input makes cost
irrelevant, but the expressions are distributed-safe regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.query.ast import Prefix, Term, positive_text_leaves
from miru_spark.query.parser import parse_query


def with_snippets(
    index: InvertedIndex,
    results: DataFrame,
    query: str,
    window: int = 8,
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """Join hit texts back to `results` (k rows) and add a ``snippet``
    column: ±``window`` tokens around the first matched token, matches
    wrapped in pre/post tags.

    The query parses through the INDEX's analyzer (like every other
    query entry point), and each display token matches by its ANALYZED
    form — on an 'en' index the query ``joins`` (term ``join``)
    highlights the surface tokens *joins*/*joining* but not *joint*,
    exactly as Lucene's highlighter re-analyzes the stored text."""
    from miru_spark.analyzers import analyze_col, surface_token_re

    leaves = positive_text_leaves(parse_query(query, index.analyzer))
    exact = sorted({l.value for l in leaves if isinstance(l, Term)})
    prefixes = sorted({l.value for l in leaves if isinstance(l, Prefix)})

    joined = results.join(
        index.docs.select("docint", "text"), "docint", "left"
    )

    toks = F.regexp_extract_all(
        F.lower(F.col("text")),
        F.lit(surface_token_re(index.analyzer)),
        F.lit(0),
    )

    def is_match(t):
        cond = F.lit(False)
        if exact:
            cond = cond | F.arrays_overlap(
                analyze_col(t, index.analyzer),
                F.array(*[F.lit(v) for v in exact]),
            )
        for p in prefixes:
            cond = cond | t.startswith(p)
        return cond

    first_pos = F.array_position(F.transform(toks, is_match), True)
    lo = F.greatest(first_pos - F.lit(window + 1), F.lit(0))
    around = F.slice(toks, lo + 1, F.lit(2 * window + 1))
    marked = F.transform(
        around,
        lambda t: F.when(is_match(t), F.concat(F.lit(pre), t, F.lit(post))).otherwise(
            t
        ),
    )
    snippet = F.when(first_pos > 0, F.array_join(marked, " ")).otherwise(
        F.array_join(F.slice(toks, 1, 2 * window + 1), " ")
    )
    return joined.withColumn("snippet", snippet).drop("text")
