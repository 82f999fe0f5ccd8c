"""Per-doc bloom filters — set-containment prefilter (reference #16).

Reference semantics: ``BloomIndex`` packs k hashed bit positions per
value into a bitmap so gatherers can ask "might this doc's field
contain value v" without fetching the stored field
(``miru-plugin/.../index/BloomIndex.java:34-120``: optimal bits/hashes,
``put`` sets hashed positions, ``mightContain`` tests them;
``MiruIndexBloom`` builds them schema-gated at index time).

Spark-first re-expression: ONE 64-bit bloom per doc over its term set,
built from the postings relation with pure JVM expressions — per
posting row a k-bit mask (``shiftleft(1, xxhash64(term, seed) % 64)``
OR-combined across k seeds), then ``groupBy(docint).agg(bit_or)``.
The bloom column rides in the doc row store; a containment probe is a
bitwise AND against the query mask — a whole-stage-codegen'd scan
predicate that prunes BEFORE any join, exactly the reference's
"cheap test before the expensive gather" role. Probes stay EXACT
because candidates are verified against the postings index (bloom =
prefilter, never the answer), so the DuckDB oracle is the plain
containment SQL.

At 100 TB the economics: the bloom column is 8 bytes/doc (vs the
multi-KB text), the prefilter is a columnar scan with no shuffle, and
only surviving candidates enter the postings semi-join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 64
N_HASHES = 2
_SEEDS = (1404000001, 1404000002)


def term_mask(term_col: str | Column) -> Column:
    """k-hash bloom mask for a term (column expression, JVM-side).

    Bit = 2^pos via pow→long (powers of two are exact in double);
    positions are taken mod 63 so the mask never touches the sign bit
    of the long."""
    c = term_col if isinstance(term_col, Column) else F.col(term_col)
    masks = []
    for seed in _SEEDS[:N_HASHES]:
        pos = F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(BLOOM_BITS - 1))
        masks.append(F.pow(F.lit(2.0), pos).cast("long"))
    return reduce(lambda a, b: a.bitwiseOR(b), masks)


def doc_term_blooms(postings: DataFrame) -> DataFrame:
    """(docint, bloom) — 64-bit bloom of each doc's term set."""
    return (
        postings.select("docint", term_mask("term").alias("_m"))
        .groupBy("docint")
        .agg(F.bit_or("_m").alias("bloom"))
    )


def might_contain(bloom_col: str | Column, term: str) -> Column:
    """Prefilter predicate: bloom admits the term (false positives
    possible, false negatives impossible)."""
    b = bloom_col if isinstance(bloom_col, Column) else F.col(bloom_col)
    qm = term_mask(F.lit(term))
    return b.bitwiseAND(qm) == qm


def contains_all(
    index,
    terms: list[str],
    blooms: DataFrame | None = None,
) -> DataFrame:
    """Docs containing ALL ``terms`` — bloom prefilter + exact verify.

    The bloom scan prunes the doc set with zero shuffles; only
    survivors enter the exact postings groupBy, so the output is
    EXACT (oracle-matchable) while the expensive path sees a fraction
    of the corpus. Pass a precomputed ``blooms`` relation (built once
    at index time via :func:`doc_term_blooms`) to amortize."""
    if blooms is None:
        blooms = doc_term_blooms(index.postings)
    pred = reduce(
        lambda a, b: a & b, (might_contain("bloom", t) for t in terms)
    )
    cand = blooms.where(pred).select("docint")
    exact = (
        index.postings.where(F.col("term").isin(list(terms)))
        .join(cand, "docint", "left_semi")
        .groupBy("docint")
        .agg(F.count_distinct("term").alias("_nt"))
        .where(F.col("_nt") == len(set(terms)))
        .select("docint")
    )
    return exact
