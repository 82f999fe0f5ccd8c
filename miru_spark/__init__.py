"""miru_spark — a PySpark-native inverted-index + BM25 top-k engine.

A from-scratch reimplementation of the query / data-processing
capabilities of enterstudio/miru (a multi-tenant time-ordered inverted
bitmap index, reference at /root/reference) expressed as idiomatic
Spark DataFrame jobs:

- documents = conversation-transcript turns ``(conv_id, turn_idx, role,
  text, tool, ts)`` in stable "prime order" (reference README.md:6);
- the inverted index is an explicit postings table ``(term, docint,
  tf, positions)`` built by tokenize → posexplode → groupBy (all
  JVM-side), compacted into delta-gap + varint-encoded blocks with
  per-block max-score metadata for block-max WAND;
- queries (AND / OR / NOT / prefix / time-range — the semantics of
  MiruAggregateUtil.filter, reference
  miru-plugin/.../solution/MiruAggregateUtil.java:1098-1202) are
  DataFrame joins over the postings table, never row scans;
- top-k scoring is BM25 (upgraded from the reference's TF-IDF,
  miru-stream-plugins/.../fulltext/FullText.java:99-220) with the
  reference's (score desc, docint desc) result ordering
  (FullTextAnswer.java:64-90).
"""

__version__ = "0.1.0"

from miru_spark.session import get_spark  # noqa: F401
