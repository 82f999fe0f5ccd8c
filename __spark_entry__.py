"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over the transcripts table
derived from sf0.001 documents. ``queries()`` / ``oracle_sql()`` — the
operator catalog with DuckDB oracles (see miru_spark/driver_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from miru_spark.driver_queries import QUERIES

    return QUERIES["ft_bm25_and"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from miru_spark.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from miru_spark.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
