"""PII scrubbing: redact emails / IPv4 addresses / phone numbers from a
text column and count what was removed.

A standard training-data hygiene stage (the C4/Dolma pipelines run the
same regex families). The reference engine has no PII stage — its authz
index (``MiruAuthzUtils.java:24-33``) gates *access* to sensitive docs;
this operator removes sensitive *content* before the corpus leaves the
boundary, the complementary control.

Patterns are deliberately restricted to the syntax subset that RE2
(DuckDB) and java.util.regex (Spark) interpret identically — character
classes, bounded repetition, ``\\b`` word boundaries; no lookarounds,
no backreferences — so the DuckDB oracle twin is exact.

Scale notes (100 TB): pure JVM ``regexp_replace``/``regexp_count``
column expressions inside whole-stage codegen — one narrow map, no
shuffle, no Python. Patterns apply in a fixed order (email → ipv4 →
phone) so overlapping matches resolve identically everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: email first (its local part may contain digit runs that the
# later patterns would otherwise nibble at)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame, col: str = "text", out: str = "scrubbed"
) -> DataFrame:
    """Adds ``out`` (the redacted text) and one ``n_<kind>`` count
    column per pattern. Counts are measured on the pre-redaction text
    of each stage, so ``n_ipv4`` never includes digits an earlier
    email redaction already consumed."""
    cur: Column = F.col(col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return df.select("*", *counts, cur.alias(out))


def pii_sql(col: str, out: str = "scrubbed") -> str:
    """The DuckDB twin of :func:`scrub_pii` as a SELECT-list fragment:
    count columns + the redacted column, same patterns, same order."""
    cur = col
    parts = []
    for name, pat, token in PII_PATTERNS:
        p = pat.replace("'", "''")
        parts.append(f"len(regexp_extract_all({cur}, '{p}')) AS n_{name}")
        cur = f"regexp_replace({cur}, '{p}', '{token}', 'g')"
    parts.append(f"{cur} AS {out}")
    return ",\n       ".join(parts)
