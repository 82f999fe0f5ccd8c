"""Rank a BOUNDED (already top-k-limited) DataFrame without WindowExec.

An unpartitioned window funnels its whole input through one partition
and logs a warning per execution; a constant partition key
(``partitionBy(lit(1))``) gets constant-folded back to the empty spec
by Catalyst, so neither is a clean way to rank the k rows that
``orderBy(...).limit(k)`` (TakeOrderedAndProject) already produced.
This helper ranks them in ONE Arrow batch instead: the input is ≤ k
rows by construction, so a single-task pandas sort is exact and free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, StructField, StructType


def rank_small(
    df: DataFrame,
    order: list[tuple[str, str]],
    rank_col: str = "rank",
) -> DataFrame:
    """Append ``rank_col`` = 1..n under ``order`` = [(col, "asc"|"desc")].

    ``df`` MUST be bounded (the result of a limit) — every row flows
    through one task. NULLs sort first on ascending keys (Spark's
    default), via pandas ``na_position``; descending keys must be
    non-null (true for the count/score keys this is used on).
    """
    import pandas as pd

    cols = [c for c, _ in order]
    asc = [d == "asc" for _, d in order]
    out_schema = StructType(
        list(df.schema.fields) + [StructField(rank_col, IntegerType(), False)]
    )
    names = df.columns

    def r(batches):
        parts = [pdf for pdf in batches if not pdf.empty]
        if not parts:
            yield pd.DataFrame(columns=names + [rank_col])
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values(
            by=cols, ascending=asc, na_position="first", kind="mergesort"
        ).reset_index(drop=True)
        pdf[rank_col] = (pdf.index + 1).astype("int32")
        yield pdf

    return df.coalesce(1).mapInPandas(r, schema=out_schema)
