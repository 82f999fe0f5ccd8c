"""Table IO shim: Iceberg when available, parquet otherwise.

The north-star deployment stores transcripts and index segments in
Iceberg tables (snapshot isolation gives the free sip cursor: checkpoint
= snapshot id). This container ships no Iceberg jars, so the shim
detects availability at runtime and falls back to plain parquet with
the same partitioning — call sites are format-agnostic, and moving to a
real cluster is a session-conf change:

    spark.sql.catalog.miru = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.miru.type = hadoop
    spark.sql.catalog.miru.warehouse = <path>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured AND the jar loads."""
    try:
        if not spark.conf.get("spark.sql.catalog.miru", None):
            return False
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def resolve_format(spark: SparkSession, requested: str = "auto") -> str:
    """'auto' → iceberg when the jar+catalog are present, else parquet.
    Forcing 'iceberg' without the jars is a hard error (silent fallback
    would mislead the operator about what the cluster wrote)."""
    if requested == "parquet":
        return "parquet"
    ok = iceberg_available(spark)
    if requested == "iceberg":
        if not ok:  # pragma: no cover - no jars in sandbox
            raise RuntimeError(
                "Iceberg format requested but org.apache.iceberg jars or "
                "the spark.sql.catalog.miru catalog conf are missing; "
                "see miru_spark/io.py for the session conf"
            )
        return "iceberg"
    if requested != "auto":
        raise ValueError(f"unknown table format {requested!r}")
    return "iceberg" if ok else "parquet"


def write_table(
    df: DataFrame,
    target: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str | None = None,
) -> str:
    """Write to `miru.<target>` (Iceberg) or `<target>` path (parquet).

    ``fmt`` forces a format ("iceberg" | "parquet"); None auto-detects.
    Returns the format used."""
    spark = df.sparkSession
    if fmt is None:
        fmt = resolve_format(spark, "auto")
    if fmt == "iceberg":  # pragma: no cover - no jars in sandbox
        w = df.writeTo(f"miru.{target.replace('/', '_')}")
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return "iceberg"
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
    return "parquet"


def read_table(spark: SparkSession, target: str, fmt: str | None = None) -> DataFrame:
    if fmt is None:
        fmt = resolve_format(spark, "auto")
    if fmt == "iceberg":  # pragma: no cover
        return spark.read.table(f"miru.{target.replace('/', '_')}")
    return spark.read.parquet(target)
