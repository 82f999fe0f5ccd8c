"""Cross-engine deterministic hashing helpers.

Every dedup/fingerprint operator needs a hash that the DuckDB oracle
can reproduce bit-for-bit. md5 is the common denominator: both engines
emit identical lowercase hex, and a 15-hex-digit (60-bit) prefix
converts losslessly to BIGINT on both sides.

Spark:  conv(substring(md5(x), 1, 15), 16, 10)::long
DuckDB: ('0x' || substring(md5(x), 1, 15))::UBIGINT::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DuckDB twin templates ({x} = SQL expression)
DUCKDB_MD5_LONG = "(('0x' || substring(md5({x}), 1, 15))::UBIGINT)::BIGINT"
DUCKDB_NORM_TEXT = "regexp_replace(trim(lower({x})), '\\s+', ' ', 'g')"


def md5_long(col: Column) -> Column:
    """60-bit integer hash from the md5 hex prefix (oracle-exact)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def norm_text(col: Column) -> Column:
    """Canonical text form for fingerprinting: lower, trim, collapse
    whitespace (the dedup notion of 'same document')."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")
