"""Driver-facing query catalog: Spark callables + DuckDB oracle SQL.

Every operator the engine claims (SURVEY.md §2) gets a pair here:
``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLE_SQL[name]``,
an ANSI-SQL equivalent DuckDB runs over the same parquet tables. The
driver compares row count + schema + order-insensitive value hash, so
column names/types are aliased identically on both sides and float
scores are rounded to 4 decimals on both sides.

The fulltext queries run over a transcripts table derived
*deterministically* from the driver's ``documents`` parquet
(miru_spark.transcripts.transcripts_from_documents) so the oracle can
rebuild the identical corpus in pure SQL — no side-channel data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miru_spark.index import InvertedIndex
from miru_spark.query.bm25 import search
from miru_spark.tokenize import tokens_col
from miru_spark.transcripts import DUCKDB_TRANSCRIPTS, transcripts_from_documents

# ---------------------------------------------------------------------------
# shared DuckDB CTE prelude: transcripts -> docint -> postings -> stats
# ---------------------------------------------------------------------------

_TOK = "regexp_extract_all(lower(text), '[a-z0-9'']+')"

SQL_PRELUDE = f"""
WITH t AS ({DUCKDB_TRANSCRIPTS}),
d AS (
  SELECT t.*, (COALESCE(o.off, 0) + t.turn_idx)::BIGINT AS docint
  FROM t
  JOIN (
    SELECT conv_id,
           SUM(n) OVER (ORDER BY conv_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off
    FROM (SELECT conv_id, COUNT(*) AS n FROM t GROUP BY conv_id)
  ) o USING (conv_id)
),
dl AS (
  SELECT docint, conv_id, turn_idx, role, tool, ts, authz,
         len({_TOK})::INT AS doclen
  FROM d
),
tok AS (
  SELECT docint, unnest({_TOK}) AS term FROM d
),
post AS (
  SELECT term, docint, COUNT(*)::INT AS tf FROM tok GROUP BY 1, 2
),
stats AS (
  SELECT term, COUNT(*)::BIGINT AS df, SUM(tf)::BIGINT AS cf,
         MAX(docint)::BIGINT AS max_docint
  FROM post GROUP BY 1
),
corpus AS (
  SELECT COUNT(*)::BIGINT AS n_docs, AVG(doclen) AS avgdl FROM dl
)
"""

_BM25 = (
    "ln(1 + (c.n_docs - s.df + 0.5) / (s.df + 0.5)) * p.tf * 2.2"
    " / (p.tf + 1.2 * (0.25 + 0.75 * dl.doclen / c.avgdl))"
)

# cross-engine exact cosine over 64-dim lists (same left-to-right
# summation order as the Spark zip_with/aggregate fold)
_COS_SQL = (
    "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"
    " / (greatest(sqrt(list_sum(list_transform(range(1, 65),"
    " i -> {a}[i] * {a}[i]))), 1e-6)"
    " * greatest(sqrt(list_sum(list_transform(range(1, 65),"
    " i -> {b}[i] * {b}[i]))), 1e-6))"
)


def _bm25_sql(match_sql: str, score_pred: str, k: int, offset: int = 0) -> str:
    """Top-k BM25 oracle: ``match_sql`` yields matching docints,
    ``score_pred`` selects scoring postings rows (term predicate).
    ``offset`` skips the first N rows of the same total order — the
    oracle twin of the engine's keyset pagination (``search(after=...)``)."""
    off = f" OFFSET {offset}" if offset else ""
    return f"""{SQL_PRELUDE},
m AS ({match_sql}),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE {score_pred} AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, m.docint,
       ROUND(COALESCE(ct.score, 0), 4) AS score
FROM m
LEFT JOIN contrib ct USING (docint)
JOIN dl ON dl.docint = m.docint
ORDER BY COALESCE(ct.score, 0) DESC, m.docint DESC
LIMIT {k}{off}
"""


# per-process index cache so the driver's per-query calls share one build
_INDEX_CACHE: dict[str, InvertedIndex] = {}


def _index_for(
    spark: SparkSession, sf_dir: str, positions: bool = False
) -> InvertedIndex:
    key = f"{id(spark)}:{sf_dir}:{positions}"
    if key not in _INDEX_CACHE:
        idx = InvertedIndex.build(
            transcripts_from_documents(spark, sf_dir), positions=positions
        )
        # serving handle: postings appear 2-3x per query plan (match set,
        # scoring, stats) — cache them at oracle/bench corpus scale;
        # terms feed the per-query broadcast, cache those too
        idx.postings = idx.postings.cache()
        idx.terms = idx.terms.cache()
        _INDEX_CACHE[key] = idx
    return _INDEX_CACHE[key]


def _ft(query: str, k: int = 10, strategy: str = "bm25"):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = search(_index_for(spark, sf_dir), query, k=k, strategy=strategy)
        return out.withColumn("score", F.round("score", 4))

    return run


def _sql_in(terms: list[str]) -> str:
    inner = ", ".join(f"'{t}'" for t in terms)
    return f"({inner})"


# ---------------------------------------------------------------------------
# catalog
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, fn, sql: str | None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLE_SQL[name] = sql


# -- fulltext / BM25 family (SURVEY.md §2.6; FullText.java) ------------------

_register(
    "ft_bm25_and",
    _ft("spark AND join", k=10),
    _bm25_sql(
        "SELECT docint FROM post WHERE term IN ('spark','join') "
        "GROUP BY docint HAVING COUNT(DISTINCT term) = 2",
        "p.term IN ('spark','join')",
        10,
    ),
)

_register(
    "ft_bm25_or",
    _ft("hash OR merge", k=10),
    _bm25_sql(
        "SELECT DISTINCT docint FROM post WHERE term IN ('hash','merge')",
        "p.term IN ('hash','merge')",
        10,
    ),
)

_register(
    "ft_bm25_not",
    _ft("window AND NOT join", k=10),
    _bm25_sql(
        "SELECT docint FROM post WHERE term = 'window' "
        "EXCEPT SELECT docint FROM post WHERE term = 'join'",
        "p.term = 'window'",
        10,
    ),
)

_register(
    "ft_bm25_prefix",
    _ft("sca*", k=10),
    _bm25_sql(
        "SELECT DISTINCT docint FROM post WHERE term LIKE 'sca%'",
        "p.term LIKE 'sca%'",
        10,
    ),
)

_register(
    "ft_bm25_field",
    _ft("role:assistant AND batch", k=10),
    _bm25_sql(
        "SELECT p.docint FROM post p JOIN dl ON dl.docint = p.docint "
        "WHERE p.term = 'batch' AND dl.role = 'assistant'",
        "p.term = 'batch'",
        10,
    ),
)

_register(
    "ft_time_topk",
    _ft("spark", k=10, strategy="time"),
    f"""{SQL_PRELUDE}
SELECT dl.conv_id, dl.turn_idx, p.docint, ROUND(0.0, 4) AS score
FROM (SELECT DISTINCT docint FROM post WHERE term = 'spark') p
JOIN dl ON dl.docint = p.docint
ORDER BY p.docint DESC
LIMIT 10
""",
)


_register(
    "ft_bm25_range",
    _ft("spark AND turn_idx:[1 TO 2]", k=10),
    _bm25_sql(
        "SELECT p.docint FROM post p JOIN dl ON dl.docint = p.docint "
        "WHERE p.term = 'spark' AND dl.turn_idx BETWEEN 1 AND 2",
        "p.term = 'spark'",
        10,
    ),
)

_register(
    "ft_bm25_authz",
    _ft("batch AND authz:g3,g5", k=10),
    _bm25_sql(
        "SELECT p.docint FROM post p JOIN dl ON dl.docint = p.docint "
        "WHERE p.term = 'batch' AND (list_contains(dl.authz, 'g3') "
        "OR list_contains(dl.authz, 'g5'))",
        "p.term = 'batch'",
        10,
    ),
)


_register(
    # pure-NOT query: the inclusiveFilter seed path (reference
    # MiruAggregateUtil.java — a NOT with no positive sibling seeds the
    # answer from the full index mask, here the docs relation). Scores
    # are zero (no positive term), order = docint desc.
    "ft_bm25_purenot",
    _ft("NOT spark", k=10),
    f"""{SQL_PRELUDE}
SELECT dl.conv_id, dl.turn_idx, dl.docint, ROUND(0.0, 4) AS score
FROM dl
WHERE dl.docint NOT IN (SELECT docint FROM post WHERE term = 'spark')
ORDER BY dl.docint DESC
LIMIT 10
""",
)


def _q_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resumable top-k paging: page 1's lowest score + docints become the
    keyset cursor for page 2 (reference FullTextReport.lowestScore
    carried into FullText.java:134 as the next scoring floor). The
    cursor is k scalar values collected driver-side — the same
    constant-size collect the WAND floor uses — and page 2 prunes on the
    score floor before its sort. Oracle = same total order, OFFSET k."""
    idx = _index_for(spark, sf_dir)
    p1 = search(idx, "hash OR merge", k=10).select("docint", "score").collect()
    out = search(
        idx,
        "hash OR merge",
        k=10,
        after=p1[-1]["score"],
        exclude=[r["docint"] for r in p1],
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_page2",
    _q_page2,
    _bm25_sql(
        "SELECT DISTINCT docint FROM post WHERE term IN ('hash','merge')",
        "p.term IN ('hash','merge')",
        10,
        offset=10,
    ),
)


def _q_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-collapsed top-k (query/collapse.py): one best-scoring turn
    per conversation, top-k conversations — Lucene/Solr collapse, the
    scored upgrade of the reference's group-by-latest representative walk
    (AggregateCounts.java:93-384). One groupBy(conv) struct-max + a
    TakeOrdered heap; no window over the full answer set."""
    from miru_spark.query.collapse import search_collapse

    idx = _index_for(spark, sf_dir)
    out = search_collapse(idx, "hash OR merge", k=10, group_col="conv_id")
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_collapse",
    _q_collapse,
    f"""{SQL_PRELUDE},
m AS (SELECT DISTINCT docint FROM post WHERE term IN ('hash','merge')),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('hash','merge') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
),
scored AS (
  SELECT m.docint, COALESCE(ct.score, 0) AS s
  FROM m LEFT JOIN contrib ct USING (docint)
),
ranked AS (
  SELECT dl.conv_id, dl.turn_idx, sc.docint, sc.s,
         ROW_NUMBER() OVER (PARTITION BY dl.conv_id
                            ORDER BY sc.s DESC, sc.docint DESC) AS rn
  FROM scored sc JOIN dl ON dl.docint = sc.docint
)
SELECT conv_id, turn_idx, docint, ROUND(s, 4) AS score
FROM ranked WHERE rn = 1
-- order on the UNROUNDED score (the output alias would be the rounded
-- one and could flip near-tie representatives vs the engine)
ORDER BY s DESC, docint DESC
LIMIT 10
""",
)


def _q_synonym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time synonym expansion (ast.expand_synonyms): 'scan AND
    big' with scan≡filter becomes (scan OR filter) AND big — Lucene
    SynonymGraph as BooleanQuery rewrite, each synonym scoring as its
    own term."""
    idx = _index_for(spark, sf_dir)
    out = search(
        idx, "scan AND big", k=10, synonyms={"scan": ["filter"]}
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_synonym",
    _q_synonym,
    _bm25_sql(
        "SELECT docint FROM post WHERE term IN ('scan','filter') "
        "INTERSECT SELECT docint FROM post WHERE term = 'big'",
        "p.term IN ('scan','filter','big')",
        10,
    ),
)


def _q_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-N (query/collapse.py search_grouped): the 5 best
    conversations for the query, each expanded to its top-2 turns —
    Lucene grouping / Solr group.limit."""
    from miru_spark.query.collapse import search_grouped

    idx = _index_for(spark, sf_dir)
    out = search_grouped(idx, "hash OR merge", k_groups=5, per_group=2)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_grouped_topn",
    _q_grouped,
    f"""{SQL_PRELUDE},
m AS (SELECT DISTINCT docint FROM post WHERE term IN ('hash','merge')),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('hash','merge') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
),
members AS (
  SELECT dl.conv_id, dl.turn_idx, m.docint, COALESCE(ct.score, 0) AS s
  FROM m
  LEFT JOIN contrib ct USING (docint)
  JOIN dl ON dl.docint = m.docint
),
grp_best AS (
  SELECT conv_id, s, docint,
         ROW_NUMBER() OVER (PARTITION BY conv_id
                            ORDER BY s DESC, docint DESC) AS rn
  FROM members
),
grp AS (
  SELECT conv_id,
         ROW_NUMBER() OVER (ORDER BY s DESC, docint DESC) AS grp_rank
  FROM grp_best WHERE rn = 1
  ORDER BY grp_rank LIMIT 5
),
ranked AS (
  SELECT mb.conv_id, mb.turn_idx, mb.docint, mb.s, g.grp_rank,
         ROW_NUMBER() OVER (PARTITION BY mb.conv_id
                            ORDER BY mb.s DESC, mb.docint DESC) AS doc_rank
  FROM members mb JOIN grp g USING (conv_id)
)
SELECT conv_id, turn_idx, docint, ROUND(s, 4) AS score,
       grp_rank::INT AS grp_rank, doc_rank::INT AS doc_rank
FROM ranked WHERE doc_rank <= 2
ORDER BY grp_rank, doc_rank
""",
)


def _q_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector search (query/hybrid.py): BM25 top-50
    candidate pool reranked by cosine to a query embedding (vec_id 0),
    blended 50/50. The candidate key is the turn's original doc_id
    (conv_id/turn_idx decomposition), joined broadcast against the
    embeddings table."""
    from miru_spark.query.hybrid import search_hybrid

    idx = _index_for(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    key = (
        F.substring(F.col("conv_id"), 5, 8).cast("bigint") * 4
        + F.col("turn_idx").cast("bigint")
    )
    out = search_hybrid(
        idx,
        "spark OR merge",
        emb,
        qv,
        key_expr=key,
        k=10,
        candidates=50,
        alpha=0.5,
    )
    return (
        out.withColumn("bm25", F.round("bm25", 4))
        .withColumn("cosine", F.round("cosine", 4))
        .withColumn("hybrid", F.round("hybrid", 4))
    )


_register(
    "ft_hybrid_rerank",
    _q_hybrid,
    f"""{SQL_PRELUDE},
m AS (SELECT DISTINCT docint FROM post WHERE term IN ('spark','merge')),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('spark','merge') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
),
pool AS (
  SELECT dl.conv_id, dl.turn_idx, m.docint, COALESCE(ct.score, 0) AS s,
         substr(dl.conv_id, 5, 8)::BIGINT * 4 + dl.turn_idx AS key
  FROM m
  LEFT JOIN contrib ct USING (docint)
  JOIN dl ON dl.docint = m.docint
  ORDER BY COALESCE(ct.score, 0) DESC, m.docint DESC
  LIMIT 50
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
rer AS (
  SELECT pool.*,
         COALESCE({{cos}}, 0.0) AS cos
  FROM pool
  LEFT JOIN embeddings e ON e.vec_id = pool.key
  CROSS JOIN q
)
SELECT conv_id, turn_idx, docint, ROUND(s, 4) AS bm25, ROUND(cos, 4) AS cosine,
       ROUND(0.5 * s + 0.5 * cos, 4) AS hybrid
FROM rer
ORDER BY 0.5 * s + 0.5 * cos DESC, docint DESC
LIMIT 10
""".replace(
        "{cos}", _COS_SQL.format(a="(e.embedding::DOUBLE[])", b="qv")
    ),
)


def _q_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion (query/hybrid.py search_rrf): BM25 top-50
    fused with cosine top-50 (query embedding = vec_id 0) by
    Σ 1/(60+rank) — the calibration-free hybrid ranking. Both retrievals
    distributed; the 50-row rank lists collect driver-side (WAND-floor
    pattern) and re-broadcast for the metadata join."""
    from miru_spark.query.hybrid import search_rrf

    idx = _index_for(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    key = (
        F.substring(F.col("conv_id"), 5, 8).cast("bigint") * 4
        + F.col("turn_idx").cast("bigint")
    )
    out = search_rrf(
        idx, "spark OR merge", emb, query_id=0, key_expr=key,
        k=10, candidates=50,
    )
    return out.withColumn("rrf", F.round("rrf", 4))


_register(
    "ft_rrf_fusion",
    _q_rrf,
    f"""{SQL_PRELUDE},
m AS (SELECT DISTINCT docint FROM post WHERE term IN ('spark','merge')),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('spark','merge') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
),
bmpool AS (
  SELECT substr(dl.conv_id, 5, 8)::BIGINT * 4 + dl.turn_idx AS key,
         ROW_NUMBER() OVER (ORDER BY COALESCE(ct.score, 0) DESC,
                            m.docint DESC) AS br
  FROM m
  LEFT JOIN contrib ct USING (docint)
  JOIN dl ON dl.docint = m.docint
  ORDER BY br LIMIT 50
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
vecpool AS (
  SELECT vec_id AS key,
         ROW_NUMBER() OVER (
           ORDER BY ROUND({{cos}}, 4) DESC, vec_id ASC) AS vr
  FROM embeddings e CROSS JOIN q WHERE vec_id != 0
  ORDER BY vr LIMIT 50
),
fused AS (
  SELECT COALESCE(b.key, v.key) AS key, b.br, v.vr,
         COALESCE(1.0 / (60 + b.br), 0) + COALESCE(1.0 / (60 + v.vr), 0) AS rrf
  FROM bmpool b FULL OUTER JOIN vecpool v ON b.key = v.key
)
SELECT dl.conv_id, dl.turn_idx, dl.docint, ROUND(f.rrf, 4) AS rrf,
       f.br::INT AS bm_rank, f.vr::INT AS vec_rank
FROM fused f
JOIN dl ON substr(dl.conv_id, 5, 8)::BIGINT * 4 + dl.turn_idx = f.key
ORDER BY f.rrf DESC, dl.docint DESC
LIMIT 10
""".replace(
        "{cos}", _COS_SQL.format(a="(e.embedding::DOUBLE[])", b="qv")
    ),
)


def _q_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-k (query/hybrid.py search_mmr): greedy
    Carbonell-Goldstein reranking of the BM25 pool, penalizing
    similarity to already-picked docs. Rows-only (iterative greedy has
    no SQL twin); pytest carries the pure-python reference."""
    from miru_spark.query.hybrid import search_mmr

    idx = _index_for(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    key = (
        F.substring(F.col("conv_id"), 5, 8).cast("bigint") * 4
        + F.col("turn_idx").cast("bigint")
    )
    out = search_mmr(
        idx, "spark OR merge", emb, qv, key_expr=key, k=10, candidates=50
    )
    return out.withColumn("rel", F.round("rel", 4)).withColumn(
        "mmr", F.round("mmr", 4)
    )


_register("ft_mmr_diverse", _q_mmr, None)


def _q_tsrange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range mask (reference MiruBitmaps.buildTimeRangeMask,
    miru-plugin/.../bitmap/MiruBitmaps.java:141): BM25 top-k restricted
    to a ts window — a BETWEEN semi-join the oracle mirrors exactly."""
    idx = _index_for(spark, sf_dir)
    out = search(
        idx,
        "spark OR merge",
        k=10,
        ts_lo="2024-01-01 01:00:00",
        ts_hi="2024-01-01 06:00:00",
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_tsrange",
    _q_tsrange,
    _bm25_sql(
        "SELECT DISTINCT p.docint FROM post p JOIN dl ON dl.docint = p.docint "
        "WHERE p.term IN ('merge','spark') AND dl.ts BETWEEN "
        "TIMESTAMP '2024-01-01 01:00:00' AND TIMESTAMP '2024-01-01 06:00:00'",
        "p.term IN ('merge','spark')",
        10,
    ),
)


# incremental-store serving handle: build → append → merge → load once
# per corpus (the north rule's resumability path exercised end-to-end)
_INCR_CACHE: dict[str, InvertedIndex] = {}


def _incremental_index_for(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    import tempfile

    from miru_spark.indexing.incremental import SegmentStore

    key = f"{id(spark)}:{sf_dir}"
    if key not in _INCR_CACHE:
        turns = transcripts_from_documents(spark, sf_dir)
        store = SegmentStore(
            spark, tempfile.mkdtemp(prefix="miru_incr_"), n_shards=2
        )
        # resumable lifecycle: base build on the first convs, sip-append
        # the full stream (watermarks skip what's indexed), compact
        store.build(turns.where(F.col("conv_id") < "conv00000050"))
        store.append(turns)
        for s in range(store.n_shards):
            store.merge_shard(s)
        idx = store.load()
        idx.postings = idx.postings.cache()
        idx.terms = idx.terms.cache()
        _INCR_CACHE[key] = idx
    return _INCR_CACHE[key]


def _q_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over the sharded resumable SegmentStore (build → append →
    merge → load). Watermark semantics make the merged store's corpus
    identical to a full build, so the oracle is the plain full-corpus
    SQL; docint is omitted from the output because the sharded id space
    (shard<<40 | local) is intentionally different from the oracle's
    global dense ids — (conv_id, turn_idx, score) is id-space-neutral.
    The top-10 set is unique at this corpus (no score ties at the
    boundary), so set-hash equality is exact."""
    idx = _incremental_index_for(spark, sf_dir)
    out = search(idx, "spark AND join", k=10)
    return out.select(
        "conv_id", "turn_idx", F.round("score", 4).alias("score")
    )


_register(
    "ft_bm25_incremental",
    _q_incremental,
    f"""{SQL_PRELUDE},
m AS (
  SELECT docint FROM post WHERE term IN ('join','spark')
  GROUP BY docint HAVING COUNT(DISTINCT term) = 2
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('join','spark') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, ROUND(ct.score, 4) AS score
FROM contrib ct
JOIN dl ON dl.docint = ct.docint
ORDER BY ct.score DESC LIMIT 10
""",
)


def _q_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-cluster sync (MiruSyncSender.java:74-1152): the incremental
    store forward-syncs its units to a second store (different shard
    count = a different "cluster"), which re-indexes under its own id
    space; BM25 over the DESTINATION must equal the full-corpus oracle.
    Query terms differ from ft_bm25_incremental so this row is
    independent signal."""
    import tempfile

    from miru_spark.indexing.incremental import SegmentStore
    from miru_spark.indexing.sync import SyncSender

    key = f"{id(spark)}:{sf_dir}:sync"
    if key not in _INCR_CACHE:
        turns = transcripts_from_documents(spark, sf_dir)
        src = SegmentStore(spark, tempfile.mkdtemp(prefix="miru_syncsrc_"), n_shards=2)
        dest = SegmentStore(spark, tempfile.mkdtemp(prefix="miru_syncdst_"), n_shards=3)
        src.build(turns.where(F.col("conv_id") < "conv00000040"))
        sender = SyncSender(src, dest)
        sender.sync()
        src.append(turns)  # second source delta arrives...
        sender.sync()  # ...and a second round ships only the delta
        idx = dest.load()
        idx.postings = idx.postings.cache()
        idx.terms = idx.terms.cache()
        _INCR_CACHE[key] = idx
    out = search(_INCR_CACHE[key], "hash AND window", k=10)
    return out.select(
        "conv_id", "turn_idx", F.round("score", 4).alias("score")
    )


_register(
    "ft_bm25_sync",
    _q_sync,
    f"""{SQL_PRELUDE},
m AS (
  SELECT docint FROM post WHERE term IN ('hash','window')
  GROUP BY docint HAVING COUNT(DISTINCT term) = 2
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('hash','window') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, ROUND(ct.score, 4) AS score
FROM contrib ct
JOIN dl ON dl.docint = ct.docint
ORDER BY ct.score DESC LIMIT 10
""",
)


def _q_tiered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over a store compacted by the TIERED merge policy
    (LogByteSizeMergePolicy semantics; the reference throttles its
    delta→chunk merge the same way via chits, MiruMergeChits.java:23-64):
    build + three sip-appends leave four units per shard, then
    ``compact(merge_factor=2)`` pair-merges them PARTIALLY into
    ``merged_{lo}_{hi}`` spans — never a full-shard rewrite, so write
    amplification stays O(log n) per posting at 10^12 turns. The
    partial-merge physical layout must be invisible to serving: the
    oracle is the plain full-corpus SQL. Query terms differ from the
    other store rows so this row is independent signal."""
    import tempfile

    from miru_spark.indexing.incremental import SegmentStore

    key = f"{id(spark)}:{sf_dir}:tiered"
    if key not in _INCR_CACHE:
        turns = transcripts_from_documents(spark, sf_dir)
        store = SegmentStore(
            spark, tempfile.mkdtemp(prefix="miru_tier_"), n_shards=2
        )
        store.build(turns.where(F.col("conv_id") < "conv00000025"))
        store.append(turns.where(F.col("conv_id") < "conv00000050"))
        store.append(turns.where(F.col("conv_id") < "conv00000075"))
        store.append(turns)
        n_merges = store.compact(merge_factor=2, min_bytes=1 << 30)
        assert n_merges >= 2, "tiered compaction did not run"
        tiered_live = [
            u for u in store.live_units()
            if u.rsplit("/", 1)[-1].count("_") == 2
        ]
        assert tiered_live, "expected partial merged_{lo}_{hi} units"
        idx = store.load()
        idx.postings = idx.postings.cache()
        idx.terms = idx.terms.cache()
        _INCR_CACHE[key] = idx
    out = search(_INCR_CACHE[key], "scan AND vector", k=10)
    return out.select(
        "conv_id", "turn_idx", F.round("score", 4).alias("score")
    )


_register(
    "ft_bm25_tiered",
    _q_tiered,
    f"""{SQL_PRELUDE},
m AS (
  SELECT docint FROM post WHERE term IN ('scan','vector')
  GROUP BY docint HAVING COUNT(DISTINCT term) = 2
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('scan','vector') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, ROUND(ct.score, 4) AS score
FROM contrib ct
JOIN dl ON dl.docint = ct.docint
ORDER BY ct.score DESC LIMIT 10
""",
)


# -- index-build artifacts (SURVEY.md §2.2) ----------------------------------


def _q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index_for(spark, sf_dir)
    return idx.terms.select("term", "df", "cf", "max_docint")


_register(
    "term_stats",
    _q_term_stats,
    f"{SQL_PRELUDE} SELECT term, df, cf, max_docint FROM stats",
)


def _q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index_for(spark, sf_dir)
    return idx.postings.select("term", "docint", "tf")


_register(
    "postings_flat",
    _q_postings,
    f"{SQL_PRELUDE} SELECT term, docint, tf FROM post",
)


def _q_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index_for(spark, sf_dir)
    return spark.createDataFrame(
        [(idx.n_docs, round(idx.avg_doclen, 4))], "n_docs long, avg_doclen double"
    )


_register(
    "corpus_stats",
    _q_corpus,
    f"{SQL_PRELUDE} SELECT n_docs, ROUND(avgdl, 4) AS avg_doclen FROM corpus",
)


# -- aggregations (SURVEY.md §2.5) -------------------------------------------


def _q_aggregate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregateCounts semantics: per pivot value, distinct-doc count +
    latest & oldest doc (reference AggregateCounts.java:93-384 walks the
    answer newest-first; the window/groupBy form is the one-shuffle
    equivalent)."""
    idx = _index_for(spark, sf_dir)
    return (
        idx.docs.groupBy("role")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("docint").alias("latest_docint"),
            F.min("docint").alias("oldest_docint"),
        )
        .select("role", "n_docs", "latest_docint", "oldest_docint")
    )


_register(
    "aggregate_counts_role",
    _q_aggregate_counts,
    f"""{SQL_PRELUDE}
SELECT role, COUNT(*)::BIGINT AS n_docs, MAX(docint) AS latest_docint,
       MIN(docint) AS oldest_docint
FROM dl GROUP BY role
""",
)


def _q_aggregate_counts_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full AggregateCounts parity: the reference also gathers the
    STORED FIELDS of each pivot's newest and oldest doc
    (AggregateCounts.java:227-268 gatherActivityLookup) — max_by/min_by
    is the one-shuffle Spark equivalent of the descending lastSetBit
    walk."""
    idx = _index_for(spark, sf_dir)
    return idx.docs.groupBy("role").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max_by("conv_id", "docint").alias("latest_conv"),
        F.max_by("turn_idx", "docint").alias("latest_turn"),
        F.min_by("conv_id", "docint").alias("oldest_conv"),
    )


_register(
    "aggregate_counts_full",
    _q_aggregate_counts_full,
    f"""{SQL_PRELUDE}
SELECT role, COUNT(*)::BIGINT AS n_docs,
       arg_max(conv_id, docint) AS latest_conv,
       arg_max(turn_idx, docint) AS latest_turn,
       arg_min(conv_id, docint) AS oldest_conv
FROM dl GROUP BY role
""",
)


def _q_distincts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distincts enumeration with prefix constraint
    (reference Distincts.gather, miru-reco-plugins/.../Distincts.java:41-159)."""
    idx = _index_for(spark, sf_dir)
    return idx.terms.where(F.col("term").startswith("s")).select("term").distinct()


_register(
    "distincts_prefix",
    _q_distincts,
    f"{SQL_PRELUDE} SELECT DISTINCT term FROM stats WHERE term LIKE 's%'",
)


def _q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DistinctCount: #distinct pivot terms in the filtered answer set
    (reference DistinctCount.java:30-113) — distinct terms co-occurring
    with 'spark' docs."""
    idx = _index_for(spark, sf_dir)
    spark_docs = idx.postings.where(F.col("term") == "spark").select("docint")
    return (
        idx.postings.join(spark_docs, "docint", "left_semi")
        .agg(F.count_distinct("term").alias("n_distinct"))
    )


_register(
    "distinct_count_cooc",
    _q_distinct_count,
    f"""{SQL_PRELUDE}
SELECT COUNT(DISTINCT term)::BIGINT AS n_distinct FROM post
WHERE docint IN (SELECT docint FROM post WHERE term = 'spark')
""",
)


def _q_waveform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform/analytics: time-bucketed counts per term
    (reference Analytics.analyze, miru-analytics-plugins/.../Analytics.java:57-201)
    over the events table: count per (event_type, hour)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", "bucket", "n")
    )


_register(
    "waveform_events",
    _q_waveform,
    """
SELECT event_type, date_trunc('hour', ts) AS bucket, COUNT(*)::BIGINT AS n
FROM events GROUP BY 1, 2
""",
)


def _q_waveform_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-compressed waveform (AnalyticsAnswer wire coding): dense
    per-event-type daily count arrays, delta-coded, exploded to rows
    for the exact oracle check. operators/waveform.py."""
    from miru_spark.operators.waveform import waveform_delta

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return waveform_delta(ev, key_col="event_type", unit="day")


_register(
    "waveform_delta",
    _q_waveform_delta,
    """
WITH b AS (SELECT event_type, date_trunc('day', ts) AS d FROM events),
bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM b),
c AS (SELECT event_type, d, COUNT(*)::BIGINT AS n FROM b GROUP BY 1, 2),
di AS (
  SELECT unnest(range(0, date_diff('day', d0, d1) + 1)) AS ii, d0 FROM bounds
),
days AS (SELECT d0 + to_days(ii::INT) AS d, ii::INT AS idx FROM di),
et AS (SELECT DISTINCT event_type FROM b),
dense AS (
  SELECT et.event_type, days.idx, COALESCE(c.n, 0) AS n
  FROM et CROSS JOIN days
  LEFT JOIN c ON c.event_type = et.event_type AND c.d = days.d
)
SELECT event_type, idx,
       n - COALESCE(LAG(n) OVER (PARTITION BY event_type ORDER BY idx), 0)
         AS delta
FROM dense
""",
)


def _q_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Latest' write-time index semantics (reference MiruIndexLatest.java:31-60):
    newest event per user via window rank."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


_register(
    "latest_per_user",
    _q_latest_per_user,
    """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)


def _q_paired_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pairedLatest: 'latest' maintained per composite (a,b) term
    (reference MiruIndexPairedLatest.java; schema wiring
    MiruSchema.java:408-421) — newest event per (user_id, event_type)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


_register(
    "paired_latest",
    _q_paired_latest,
    """
SELECT user_id, event_type, event_id FROM (
  SELECT user_id, event_type, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)


def _q_first_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'First' index semantics (setIfEmpty — reference
    MiruIndexPrimaryFields.java:123-129): oldest event per user."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


_register(
    "first_per_user",
    _q_first_per_user,
    """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
""",
)


def _q_anomaly_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly/metrics sums (reference Anomaly.sum, miru-anomaly-plugins/
    .../Anomaly.java:102+ — Σ 2^bit·cardinality over valueBits planes):
    Spark needs no bit-planes, a plain windowed SUM is the operator."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.round(F.sum("value"), 2).alias("sum_value"))
        .select("event_type", "bucket", "sum_value")
    )


_register(
    "anomaly_sum",
    _q_anomaly_sum,
    """
SELECT event_type, date_trunc('hour', ts) AS bucket,
       ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
)


def _q_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending terms (reference trending/Distincts + waveform family):
    terms whose recent-half count most exceeds their prior-half count
    over the transcripts corpus; deterministic tie-break by term."""
    idx = _index_for(spark, sf_dir)
    # docints are dense 0..n-1 (prefix-sum assignment), so the median is
    # the id-range midpoint: floor((min+max)/2) == floor(quantile(0.5)).
    # min/max aggregate in constant state — Spark's exact percentile()
    # would buffer every (unique-per-row) docint in one aggregation
    # state, an executor-memory bomb at scale.
    lo, hi = idx.docs.agg(F.min("docint"), F.max("docint")).collect()[0]
    mid = (int(lo) + int(hi)) // 2
    joined = idx.postings.withColumn(
        "recent", (F.col("docint") > F.lit(mid)).cast("int")
    )
    return (
        joined.groupBy("term")
        .agg(
            F.sum(F.when(F.col("recent") == 1, 1).otherwise(0)).alias("n_recent"),
            F.sum(F.when(F.col("recent") == 0, 1).otherwise(0)).alias("n_prior"),
        )
        .withColumn(
            "lift",
            F.round((F.col("n_recent") + 1.0) / (F.col("n_prior") + 1.0), 4),
        )
        .orderBy(F.desc("lift"), F.asc("term"))
        .limit(15)
        .select("term", "n_recent", "n_prior", "lift")
    )


_register(
    "trending_terms",
    _q_trending,
    f"""{SQL_PRELUDE},
mid AS (SELECT (MIN(docint) + MAX(docint)) // 2 AS m FROM dl),
c AS (
  SELECT term,
         SUM(CASE WHEN docint > (SELECT m FROM mid) THEN 1 ELSE 0 END)::BIGINT AS n_recent,
         SUM(CASE WHEN docint <= (SELECT m FROM mid) THEN 1 ELSE 0 END)::BIGINT AS n_prior
  FROM post GROUP BY 1
)
SELECT term, n_recent, n_prior,
       ROUND((n_recent + 1.0) / (n_prior + 1.0), 4) AS lift
FROM c
ORDER BY lift DESC, term ASC
LIMIT 15
""",
)


# -- trending strategies (TrendingInjectable.java:125-187) ------------------

_TREND_N = 16

# dense per-term waveform over _TREND_N equal segments of the corpus ts
# span — exact BIGINT bucketing, same math as operators/trending.py
_TREND_SQL = f"""{{prelude}},
tb AS (SELECT MIN(epoch(ts)::BIGINT) AS t0, MAX(epoch(ts)::BIGINT) AS t1 FROM dl),
tw AS (
  SELECT p.term,
         ((epoch(dl.ts)::BIGINT - tb.t0) * {_TREND_N}) // (tb.t1 - tb.t0 + 1) AS seg
  FROM post p JOIN dl USING (docint) CROSS JOIN tb
),
segc AS (SELECT term, seg, COUNT(*)::BIGINT AS n FROM tw GROUP BY 1, 2),
dense AS (
  SELECT t.term, g.seg::INT AS seg, COALESCE(s.n, 0)::DOUBLE AS y
  FROM (SELECT DISTINCT term FROM segc) t
  CROSS JOIN (SELECT unnest(range(0, {_TREND_N})) AS seg) g
  LEFT JOIN segc s ON s.term = t.term AND s.seg = g.seg
)
"""


def _trend_waveforms(spark: SparkSession, sf_dir: str):
    from miru_spark.operators.trending import term_waveforms

    idx = _index_for(spark, sf_dir)
    return term_waveforms(idx.postings, idx.docs, n_segments=_TREND_N)


def _q_trending_strategy(strategy: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from miru_spark.operators.trending import trending

        return trending(
            _trend_waveforms(spark, sf_dir), strategy, k=15, n_segments=_TREND_N
        )

    return run


def _q_trending_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending under a constraint filter — the reference's
    TrendingQuery carries a MiruFilter the analytics waveforms are
    masked by (TrendingQuestion.java; Analytics answer ∧ constraint):
    here the waveform relation is built from the postings of user-role
    turns only, then LEADER-ranked. Proves strategy x filter
    composition on the same single-shuffle plan."""
    from miru_spark.operators.trending import term_waveforms, trending

    idx = _index_for(spark, sf_dir)
    user_docs = idx.docs.where(F.col("role") == "user")
    wf = term_waveforms(
        idx.postings.join(user_docs.select("docint"), "docint", "left_semi"),
        user_docs,
        n_segments=_TREND_N,
    )
    return trending(wf, "LEADER", k=15, n_segments=_TREND_N)


_register(
    "trending_leader",
    _q_trending_strategy("LEADER"),
    _TREND_SQL.format(prelude=SQL_PRELUDE)
    + """
SELECT term, SUM(y)::BIGINT AS score FROM dense GROUP BY 1
ORDER BY score DESC, term ASC LIMIT 15
""",
)

_register(
    "trending_highest_peak",
    _q_trending_strategy("HIGHEST_PEAK"),
    _TREND_SQL.format(prelude=SQL_PRELUDE)
    + """
SELECT term, MAX(y)::BIGINT AS score FROM dense GROUP BY 1
ORDER BY score DESC, term ASC LIMIT 15
""",
)

_register(
    "trending_regression",
    _q_trending_strategy("LINEAR_REGRESSION"),
    _TREND_SQL.format(prelude=SQL_PRELUDE)
    + f"""
SELECT term, ROUND(regr_slope(y, seg / {_TREND_N - 1}.0), 4) AS score
FROM dense GROUP BY 1
ORDER BY score DESC, term ASC LIMIT 15
""",
)

def _q_trending_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four strategies from ONE waveform pass (the reference's
    keyed score-set request shape — one analytics answer feeds every
    strategy's heap). operators/trending.py trending_multi."""
    from miru_spark.operators.trending import trending_multi

    return trending_multi(
        _trend_waveforms(spark, sf_dir), k=15, n_segments=_TREND_N
    )


_register(
    "trending_multi",
    _q_trending_multi,
    _TREND_SQL.format(prelude=SQL_PRELUDE.replace("WITH ", "WITH RECURSIVE ", 1))
    + f""",
maxes AS (SELECT term, MAX(y) AS mx FROM dense GROUP BY 1),
-- commons-math R-6 percentile (engine parity): pos = p*(n+1) on the
-- 1-indexed sorted sample, clamped to [min, max], linear interpolation
b95 AS (
  SELECT CASE
    WHEN 0.95 * (n + 1) < 1 THEN a[1]
    WHEN 0.95 * (n + 1) >= n THEN a[n]
    ELSE a[CAST(floor(0.95 * (n + 1)) AS INT)]
         + (0.95 * (n + 1) - floor(0.95 * (n + 1)))
           * (a[CAST(floor(0.95 * (n + 1)) AS INT) + 1]
              - a[CAST(floor(0.95 * (n + 1)) AS INT)])
  END AS q
  FROM (SELECT list_sort(list(mx)) AS a, COUNT(*) AS n FROM maxes)
),
dlt AS (SELECT m.term, m.mx / 6 + b.q / 100 AS d FROM maxes m CROSS JOIN b95 b),
pk AS (
  SELECT term, -1 AS i, 1e308 AS mn, -1e308 AS mx, 1 AS lf, 0 AS np FROM dlt
  UNION ALL
  SELECT p.term, p.i + 1,
         CASE WHEN p.lf = 1 AND d.y < greatest(p.mx, d.y) - t.d
              THEN d.y ELSE least(p.mn, d.y) END,
         CASE WHEN p.lf = 0 AND d.y > least(p.mn, d.y) + t.d
              THEN d.y ELSE greatest(p.mx, d.y) END,
         CASE WHEN p.lf = 1
              THEN CASE WHEN d.y < greatest(p.mx, d.y) - t.d THEN 0 ELSE 1 END
              ELSE CASE WHEN d.y > least(p.mn, d.y) + t.d THEN 1 ELSE 0 END END,
         p.np + CASE WHEN p.lf = 1 AND d.y < greatest(p.mx, d.y) - t.d
                     THEN 1 ELSE 0 END
  FROM pk p
  JOIN dense d ON d.term = p.term AND d.seg = p.i + 1
  JOIN dlt t ON t.term = p.term
),
all_scores AS (
  SELECT 'LEADER' AS strategy, term, SUM(y) AS score FROM dense GROUP BY 2
  UNION ALL
  SELECT 'HIGHEST_PEAK', term, MAX(y) FROM dense GROUP BY 2
  UNION ALL
  SELECT 'LINEAR_REGRESSION', term,
         ROUND(regr_slope(y, seg / {_TREND_N - 1}.0), 4) FROM dense GROUP BY 2
  UNION ALL
  SELECT 'PEAKS', term, np::DOUBLE FROM pk WHERE i = {_TREND_N - 1}
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY strategy ORDER BY score DESC, term ASC) AS rk
  FROM all_scores
)
SELECT strategy, term, score FROM r WHERE rk <= 15
ORDER BY strategy, score DESC, term ASC
""",
)


_register(
    "trending_filtered",
    _q_trending_filtered,
    f"""{SQL_PRELUDE},
du AS (SELECT * FROM dl WHERE role = 'user'),
tb AS (SELECT MIN(epoch(ts)::BIGINT) AS t0, MAX(epoch(ts)::BIGINT) AS t1 FROM du),
tw AS (
  SELECT p.term,
         ((epoch(du.ts)::BIGINT - tb.t0) * {_TREND_N}) // (tb.t1 - tb.t0 + 1) AS seg
  FROM post p JOIN du USING (docint) CROSS JOIN tb
),
segc AS (SELECT term, seg, COUNT(*)::BIGINT AS n FROM tw GROUP BY 1, 2)
SELECT term, SUM(n)::BIGINT AS score FROM segc GROUP BY 1
ORDER BY score DESC, term ASC LIMIT 15
""",
)


# PEAKS: Billauer peakdet automaton as a recursive CTE (state machine
# per term, one step per segment — _TREND_N steps, term-count rows each)
_register(
    "trending_peaks",
    _q_trending_strategy("PEAKS"),
    _TREND_SQL.format(prelude=SQL_PRELUDE.replace("WITH ", "WITH RECURSIVE ", 1))
    + f""",
maxes AS (SELECT term, MAX(y) AS mx FROM dense GROUP BY 1),
-- commons-math R-6 percentile (engine parity): pos = p*(n+1) on the
-- 1-indexed sorted sample, clamped to [min, max], linear interpolation
b95 AS (
  SELECT CASE
    WHEN 0.95 * (n + 1) < 1 THEN a[1]
    WHEN 0.95 * (n + 1) >= n THEN a[n]
    ELSE a[CAST(floor(0.95 * (n + 1)) AS INT)]
         + (0.95 * (n + 1) - floor(0.95 * (n + 1)))
           * (a[CAST(floor(0.95 * (n + 1)) AS INT) + 1]
              - a[CAST(floor(0.95 * (n + 1)) AS INT)])
  END AS q
  FROM (SELECT list_sort(list(mx)) AS a, COUNT(*) AS n FROM maxes)
),
dlt AS (SELECT m.term, m.mx / 6 + b.q / 100 AS d FROM maxes m CROSS JOIN b95 b),
pk AS (
  SELECT term, -1 AS i, 1e308 AS mn, -1e308 AS mx, 1 AS lf, 0 AS np FROM dlt
  UNION ALL
  SELECT p.term, p.i + 1,
         CASE WHEN p.lf = 1 AND d.y < greatest(p.mx, d.y) - t.d
              THEN d.y ELSE least(p.mn, d.y) END,
         CASE WHEN p.lf = 0 AND d.y > least(p.mn, d.y) + t.d
              THEN d.y ELSE greatest(p.mx, d.y) END,
         CASE WHEN p.lf = 1
              THEN CASE WHEN d.y < greatest(p.mx, d.y) - t.d THEN 0 ELSE 1 END
              ELSE CASE WHEN d.y > least(p.mn, d.y) + t.d THEN 1 ELSE 0 END END,
         p.np + CASE WHEN p.lf = 1 AND d.y < greatest(p.mx, d.y) - t.d
                     THEN 1 ELSE 0 END
  FROM pk p
  JOIN dense d ON d.term = p.term AND d.seg = p.i + 1
  JOIN dlt t ON t.term = p.term
)
SELECT term, np::BIGINT AS score FROM pk WHERE i = {_TREND_N - 1}
ORDER BY score DESC, term ASC LIMIT 15
""",
)


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: split each user's event stream at >30min gaps
    (lag + cumulative-flag — the standard Spark idiom; streaming twin
    would be session_window)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ; route through TIMESTAMP (session tz =
    # UTC) for the epoch-seconds cast, matching DuckDB's naive epoch()
    epoch = F.col("ts").cast("timestamp").cast("long")
    flagged = ev.withColumn(
        "new_sess",
        F.when(epoch - F.lag(epoch).over(w) > 1800, 1).otherwise(0).cast("int"),
    ).withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
        )
        .select("user_id", "session_id", "n_events", "t_start", "t_end")
    )


_register(
    "sessionize_events",
    _q_sessionize,
    """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN floor(epoch(ts)) - floor(epoch(LAG(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, session_id::BIGINT AS session_id, COUNT(*)::BIGINT AS n_events,
       MIN(ts) AS t_start, MAX(ts) AS t_end
FROM sess GROUP BY 1, 2
""",
)


def _q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (cube/rollup coverage): event counts at
    (type, day), (type), and grand-total levels."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.rollup(
            "event_type", F.to_date("ts").cast("string").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .select("event_type", "day", "n", "v")
    )


_register(
    "rollup_events",
    _q_rollup,
    """
SELECT event_type, CAST(ts AS DATE)::VARCHAR AS day, COUNT(*)::BIGINT AS n,
       ROUND(SUM(value), 2) AS v
FROM events GROUP BY ROLLUP (event_type, CAST(ts AS DATE)::VARCHAR)
""",
)


def _q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL) — the scale path for DistinctCount;
    approximate, so rows-only check (no SQL oracle can match the
    sketch), with the exact twin next to it for the driver to compare
    magnitudes."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )


_register("approx_distinct_users", _q_approx_distinct, None)


# -- relational coverage (filters/aggs/joins over TPC-H-ish tables) ----------


def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select("l_returnflag", "l_linestatus", "sum_qty", "revenue", "count_order")
    )


_register(
    "tpch_q1",
    _q_tpch_q1,
    """
SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*)::BIGINT AS count_order
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)


def _q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join + global top-k (the engine's join strategy demo)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "total_spent")
    )


_register(
    "topk_customers",
    _q_topk_orders,
    """
SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 2) AS total_spent
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey ASC
LIMIT 20
""",
)


# -- training-data pipeline: dedup / similarity / text analysis --------------

_MD5L = "(('0x' || substring(md5({x}), 1, 15))::UBIGINT)::BIGINT"
_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"

# shared shingle prelude (k=3) over documents
_SH_SQL = """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id AS id,
         unnest(CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> array_to_string(t[i:i+2], ' '))
                ELSE [] END) AS shingle
  FROM tok
),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY 1)
"""

# Hashed-shingle variant: the Spark jaccard family hashes each gram to
# its 60-bit md5 before the distinct (shuffle compression — see
# dedup.shingles(hashed=True)); the twin applies the SAME md5_long so
# both engines operate on the identical shingle domain. Minhash keeps
# the string CTE (its seeded signature hashes concat the gram text).
_SH_HASH_SQL = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
  FROM documents
),
shx AS (
  SELECT doc_id AS id,
         unnest(CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> array_to_string(t[i:i+2], ' '))
                ELSE [] END) AS g
  FROM tok
),
sh AS (SELECT DISTINCT id, {_MD5L.format(x="g")} AS shingle FROM shx),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY 1)
"""

_JACCARD_VERIFY_SQL = """
shared AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_shared
  FROM cand c
  JOIN sh sa ON sa.id = c.id_a
  JOIN sh sb ON sb.id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT s.id_a, s.id_b,
       ROUND(s.n_shared::DOUBLE / (za.n_sh + zb.n_sh - s.n_shared), 4) AS jaccard
FROM shared s
JOIN sizes za ON za.id = s.id_a
JOIN sizes zb ON zb.id = s.id_b
WHERE s.n_shared::DOUBLE / (za.n_sh + zb.n_sh - s.n_shared) >= {tau}
"""

# Jaccard(0.5) pair graph -> min-label reachability, appended to _SH_SQL
# (as WITH RECURSIVE); ends at reach(id, lbl). Shared by the
# dedup_components and dedup_survivors oracles.
_JACCARD_COMPONENT_CTES = """
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b USING (shingle) WHERE a.id < b.id
),
shared AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_shared
  FROM cand c
  JOIN sh sa ON sa.id = c.id_a
  JOIN sh sb ON sb.id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
),
pairs AS (
  SELECT s.id_a, s.id_b
  FROM shared s
  JOIN sizes za ON za.id = s.id_a
  JOIN sizes zb ON zb.id = s.id_b
  WHERE s.n_shared::DOUBLE / (za.n_sh + zb.n_sh - s.n_shared) >= 0.5
),
und AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, lbl) AS (
  SELECT src, dst FROM und
  UNION
  SELECT r.id, u.dst FROM reach r JOIN und u ON r.lbl = u.src
)
"""

# textstats.quality_scores as CTEs -> quality(doc_id, q); the single
# source of the SQL quality formula (stopword list tracks
# LANG_MARKERS['en']). Shared by quality_weighted_sample and
# dedup_survivors. CTE names are q-prefixed to compose with _SH_SQL.
_QUALITY_CTES = """
qtok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t,
         lower(text) AS low
  FROM documents
),
qm AS (
  SELECT doc_id,
         ROUND(len(list_distinct(t))::DOUBLE / greatest(len(t), 1), 4) AS ttr,
         ROUND(len(list_filter(t, x -> list_contains(
             ['the','and','is','of','to','in','that','it'], x)))::DOUBLE
             / greatest(len(t), 1), 4) AS stop_ratio,
         ROUND(length(regexp_replace(low, '[^a-z0-9'' ]', '', 'g'))::DOUBLE
             / greatest(length(low), 1), 4) AS alnum_ratio
  FROM qtok
),
quality AS (
  SELECT doc_id,
         ROUND((ttr + least(stop_ratio * 4, 1.0) + alnum_ratio) / 3.0, 4) AS q
  FROM qm
)
"""


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.operators.dedup import exact_dup_groups

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dup_groups(d)


_register(
    "dedup_exact",
    _q_dedup_exact,
    f"""
SELECT {_MD5L.format(x=_NORM)} AS fp, COUNT(*)::BIGINT AS n_docs,
       MIN(doc_id) AS keep_id
FROM documents GROUP BY 1
""",
)


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.operators.dedup import ngram_jaccard_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_jaccard_pairs(d, k=3, threshold=0.5)


_register(
    "dedup_ngram_jaccard",
    _q_ngram_jaccard,
    _SH_HASH_SQL
    + """,
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b USING (shingle) WHERE a.id < b.id
),
"""
    + _JACCARD_VERIFY_SQL.format(tau=0.5),
)


def _q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.operators.dedup import minhash_lsh_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(d, n_hashes=8, band_size=2, k=3, threshold=0.5)


_register(
    "dedup_minhash_lsh",
    _q_minhash_lsh,
    _SH_SQL
    + f""",
sig AS (
  SELECT id, seed,
         MIN({_MD5L.format(x="shingle || '#' || seed")}) AS minhash
  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) s
  GROUP BY 1, 2
),
bands AS (
  SELECT id, (seed // 2)::INT AS band,
         string_agg(minhash::VARCHAR, ',' ORDER BY seed) AS band_key
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.id < b.id
),
"""
    + _JACCARD_VERIFY_SQL.format(tau=0.5),
)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.operators.dedup import simhash

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash(d)


_register(
    "dedup_simhash",
    _q_simhash,
    f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS t
  FROM documents
),
tf AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
h AS (SELECT doc_id, c, {_MD5L.format(x="t")} AS hv FROM tf),
bits AS (
  SELECT doc_id, b.b,
         SUM(CASE WHEN (hv >> b.b) & 1 = 1 THEN c ELSE -c END) AS vote
  FROM h CROSS JOIN (SELECT unnest(range(32)) AS b) b
  GROUP BY 1, 2
)
SELECT doc_id AS id,
       COALESCE(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END), 0)::BIGINT AS simhash
FROM bits GROUP BY 1
""",
)


def _q_ngram_jaccard_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup maintenance (dedup.ngram_jaccard_pairs_delta):
    pairs touching a simulated ingest batch (doc_id % 10 == 7) — the
    per-batch query of a continuously-fed corpus; candidate join cost is
    proportional to the delta, never corpus²."""
    from miru_spark.operators.dedup import ngram_jaccard_pairs_delta

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    delta = d.where(F.col("doc_id") % 10 == 7).select(
        F.col("doc_id").alias("id")
    )
    return ngram_jaccard_pairs_delta(d, delta, k=3, threshold=0.5)


_register(
    "dedup_ngram_delta",
    _q_ngram_jaccard_delta,
    _SH_HASH_SQL
    + """,
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.id < b.id AND (a.id % 10 = 7 OR b.id % 10 = 7)
),
"""
    + _JACCARD_VERIFY_SQL.format(tau=0.5),
)


def _q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the n-gram Jaccard pair graph →
    (doc_id, canonical_id) canonicalization mapping. Oracle = DuckDB
    recursive CTE computing min reachable id over the same edge set."""
    from miru_spark.operators.components import canonical_docs
    from miru_spark.operators.dedup import ngram_jaccard_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(d, k=3, threshold=0.5)
    return canonical_docs(pairs).select("doc_id", "canonical_id")


_register(
    "dedup_components",
    _q_dedup_components,
    _SH_HASH_SQL.replace("WITH ", "WITH RECURSIVE ", 1)
    + ","
    + _JACCARD_COMPONENT_CTES
    + """
SELECT id AS doc_id, LEAST(id, MIN(lbl)) AS canonical_id
FROM reach GROUP BY id
""",
)


def _q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by hashed doc id —
    stable under corpus growth and cluster layout (operators/sampling.py)."""
    from miru_spark.operators.sampling import hash_split

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return hash_split(d, {"train": 0.9, "val": 0.05, "test": 0.05}).select(
        "doc_id", "split"
    )


def _hash_split_sql() -> str:
    from miru_spark.operators.sampling import duckdb_bucket

    b = duckdb_bucket("doc_id", "v1")
    return f"""
SELECT doc_id,
       CASE WHEN {b} < 9000 THEN 'train'
            WHEN {b} < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


_register("hash_split_docs", _q_hash_split, _hash_split_sql())


def _q_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The five-stage training-data pipeline end-to-end
    (miru_spark/pipeline.py): quality/repetition gates → exact dedup →
    near-dup components → hashed split → per-split chunk packing. The
    oracle replays ALL five stages in one DuckDB statement over the
    same parquet — a single hash row certifying the whole composition,
    not just each operator in isolation."""
    from miru_spark.pipeline import prepare_training_data

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed, _ = prepare_training_data(
        d, budget=512, quality_min=0.47, rep_max=0.5, jaccard=0.5
    )
    return packed


def _pipeline_sql(decontam: bool = False) -> str:
    from miru_spark.operators.sampling import duckdb_bucket

    b = duckdb_bucket("doc_id", "v1")
    where = "WHERE doc_id % 20 != 0" if decontam else ""
    gram5 = (
        "CASE WHEN len(t) >= 5 THEN list_transform(range(len(t) - 4), "
        "i -> array_to_string(t[i + 1:i + 5], ' ')) ELSE [] END"
    )
    if decontam:
        decontam_ctes = f"""
tg AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t FROM f3
),
dg AS (SELECT DISTINCT doc_id AS id, unnest({gram5}) AS gram FROM tg),
bt AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
  FROM documents WHERE doc_id % 20 = 0
),
bg AS (SELECT DISTINCT unnest({gram5}) AS gram FROM bt),
contam AS (SELECT DISTINCT id FROM dg JOIN bg USING (gram)),
f4 AS (
  SELECT f3.* FROM f3 WHERE f3.doc_id NOT IN (SELECT id FROM contam)
),"""
        final = "f4"
    else:
        decontam_ctes = ""
        final = "f3"
    return f"""
WITH RECURSIVE
tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t,
         lower(text) AS low
  FROM documents {where}
),
qm AS (
  SELECT doc_id,
         ROUND(len(list_distinct(t))::DOUBLE / greatest(len(t), 1), 4) AS ttr,
         ROUND(len(list_filter(t, x -> list_contains(
             ['the','and','is','of','to','in','that','it'], x)))::DOUBLE
             / greatest(len(t), 1), 4) AS stop_ratio,
         ROUND(length(regexp_replace(low, '[^a-z0-9'' ]', '', 'g'))::DOUBLE
             / greatest(length(low), 1), 4) AS alnum_ratio
  FROM tok
),
quality AS (
  SELECT doc_id,
         ROUND((ttr + least(stop_ratio * 4, 1.0) + alnum_ratio) / 3.0, 4) AS q
  FROM qm
),
g AS (
  SELECT doc_id AS id,
         list_transform(range(len(t) - 2),
                        i -> array_to_string(t[i + 1:i + 3], ' ')) AS gs
  FROM tok WHERE len(t) >= 3
),
e AS (SELECT id, unnest(gs) AS gram FROM g),
eo AS (SELECT id, gram, COUNT(*) AS occ FROM e GROUP BY 1, 2),
pdk AS (SELECT id, SUM(occ) AS n_ngrams, COUNT(*) AS n_distinct FROM eo GROUP BY 1),
rep AS (
  SELECT d.doc_id,
         CASE WHEN COALESCE(pdk.n_ngrams, 0) > 0
              THEN ROUND(1.0 - pdk.n_distinct / pdk.n_ngrams::DOUBLE, 4)
              ELSE 0.0 END AS rep_ratio
  FROM (SELECT doc_id FROM documents {where}) d
  LEFT JOIN pdk ON pdk.id = d.doc_id
),
f1 AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN quality USING (doc_id) JOIN rep USING (doc_id)
  WHERE quality.q >= 0.47 AND rep.rep_ratio <= 0.5
),
fp AS (
  SELECT doc_id, {_MD5L.format(x=_NORM)} AS fp FROM f1
),
keepx AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fp),
f2 AS (SELECT f1.* FROM f1 JOIN keepx USING (doc_id)),
t2 AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t FROM f2
),
shx AS (
  SELECT doc_id AS id,
         unnest(CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> array_to_string(t[i:i+2], ' '))
                ELSE [] END) AS g
  FROM t2
),
sh AS (SELECT DISTINCT id, {_MD5L.format(x='g')} AS shingle FROM shx),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b USING (shingle) WHERE a.id < b.id
),
shared AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_shared
  FROM cand c
  JOIN sh sa ON sa.id = c.id_a
  JOIN sh sb ON sb.id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
),
pairs AS (
  SELECT s.id_a, s.id_b
  FROM shared s
  JOIN sizes za ON za.id = s.id_a
  JOIN sizes zb ON zb.id = s.id_b
  WHERE s.n_shared::DOUBLE / (za.n_sh + zb.n_sh - s.n_shared) >= 0.5
),
und AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, lbl) AS (
  SELECT src, dst FROM und
  UNION
  SELECT r.id, u.dst FROM reach r JOIN und u ON r.lbl = u.src
),
canon AS (SELECT id, LEAST(id, MIN(lbl)) AS canonical FROM reach GROUP BY id),
f3 AS (
  SELECT f2.doc_id, f2.text FROM f2
  LEFT JOIN canon ON canon.id = f2.doc_id
  WHERE canon.id IS NULL OR canon.canonical = f2.doc_id
),{decontam_ctes}
sp AS (
  SELECT doc_id,
         CASE WHEN {b} < 9000 THEN 'train'
              WHEN {b} < 9500 THEN 'val'
              ELSE 'test' END AS split,
         len(regexp_extract_all(lower(text), '[a-z0-9'']+'))::BIGINT AS n
  FROM {final}
),
c AS (
  SELECT split, doc_id AS id, n,
         COALESCE(SUM(n) OVER (PARTITION BY split ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM sp
)
SELECT split, id, n::INT AS n_tokens, start::BIGINT AS start,
       (start // 512)::BIGINT AS seq_id,
       (start % 512)::INT AS seq_off,
       (CASE WHEN n > 0 THEN (start + n - 1) // 512
             ELSE start // 512 END)::BIGINT AS seq_last
FROM c
"""


_register("pipeline_prepare", _q_pipeline, _pipeline_sql())


def _q_contam_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-benchmark-doc contamination diagnostics: which eval docs leak
    into the training corpus (5-grams) and how many training docs carry
    them."""
    from miru_spark.operators.textstats import contamination_report

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return contamination_report(
        d.where(F.col("doc_id") % 20 != 0), d.where(F.col("doc_id") % 20 == 0), n=5
    )


_register(
    "contamination_report",
    _q_contam_report,
    """
WITH d AS (
  SELECT doc_id AS id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
  FROM documents
),
g AS (
  SELECT id, list_transform(range(len(t) - 4),
                            i -> array_to_string(t[i + 1:i + 5], ' ')) AS gs
  FROM d WHERE len(t) >= 5
),
e AS (SELECT DISTINCT id, unnest(gs) AS gram FROM g),
bg AS (SELECT id, gram FROM e WHERE id % 20 = 0),
tg AS (SELECT id AS tid, gram FROM e WHERE id % 20 != 0),
hits AS (
  SELECT bg.id, COUNT(DISTINCT bg.gram) AS n_leaked,
         COUNT(DISTINCT tg.tid) AS n_train_docs
  FROM bg JOIN tg USING (gram) GROUP BY 1
),
pb AS (SELECT id, COUNT(*) AS n_grams FROM bg GROUP BY 1)
SELECT d.id,
       COALESCE(pb.n_grams, 0)::INT AS n_grams,
       COALESCE(h.n_leaked, 0)::INT AS n_leaked,
       COALESCE(h.n_train_docs, 0)::INT AS n_train_docs,
       CASE WHEN COALESCE(pb.n_grams, 0) > 0
            THEN ROUND(COALESCE(h.n_leaked, 0) / pb.n_grams::DOUBLE, 4)
            ELSE 0.0 END AS leak_frac
FROM d LEFT JOIN pb USING (id) LEFT JOIN hits h USING (id)
WHERE d.id % 20 = 0
""",
)


def _q_pipeline_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline with the optional decontamination stage active:
    training input = docs outside the held-out eval slice
    (doc_id % 20 != 0), benchmark = the slice; survivors sharing a
    5-gram with the benchmark are dropped between near-dedup and the
    split. Oracle replays ALL SIX stages in one DuckDB statement."""
    from miru_spark.pipeline import prepare_training_data

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed, _ = prepare_training_data(
        d.where(F.col("doc_id") % 20 != 0),
        budget=512,
        quality_min=0.47,
        rep_max=0.5,
        jaccard=0.5,
        bench=d.where(F.col("doc_id") % 20 == 0),
        contam_ngram=5,
    )
    return packed


_register("pipeline_decontam", _q_pipeline_decontam, _pipeline_sql(decontam=True))


def _q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 32-token windows advancing by 24 (8
    overlap) over every document — the RAG/long-doc window primitive."""
    from miru_spark.operators.chunking import chunk_documents

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(d, size=32, overlap=8)


_register(
    "chunk_documents",
    _q_chunk_docs,
    """
WITH d AS (
  SELECT doc_id AS id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
  FROM documents
),
s AS (
  SELECT id, t, unnest(range(0, len(t), 24)) AS start
  FROM d WHERE len(t) > 0
)
SELECT id, (start // 24)::INT AS chunk_idx, start::INT AS start,
       len(t[start + 1:start + 32])::INT AS n_tokens,
       array_to_string(t[start + 1:start + 32], ' ') AS chunk_text
FROM s
""",
)


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted resampling: keep each doc with probability equal
    to its composite quality score — deterministic hash-Bernoulli, no
    shuffle."""
    from miru_spark.operators.sampling import weighted_sample
    from miru_spark.operators.textstats import quality_scores

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = quality_scores(d)
    return weighted_sample(q, "quality", id_col="id").select("id", "quality")


def _weighted_sample_sql() -> str:
    from miru_spark.operators.sampling import duckdb_bucket

    b = duckdb_bucket("doc_id", "v1")
    return f"""
WITH {_QUALITY_CTES}
SELECT doc_id AS id, q AS quality FROM quality
WHERE {b} < ROUND(q * 10000)::INT
"""


_register("quality_weighted_sample", _q_weighted_sample, _weighted_sample_sql())


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic down-sampling to rebalance the corpus
    mix (keep all zh, half of en, a quarter of everything else)."""
    from miru_spark.operators.sampling import stratified_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return stratified_sample(
        d, rates={"zh": 1.0, "en": 0.5}, strata_col="lang", default_rate=0.25
    ).select("doc_id", "lang")


def _stratified_sample_sql() -> str:
    from miru_spark.operators.sampling import duckdb_bucket

    b = duckdb_bucket("doc_id", "v1")
    return f"""
SELECT doc_id, lang
FROM documents
WHERE {b} < (CASE lang WHEN 'zh' THEN 1.0 WHEN 'en' THEN 0.5
             ELSE 0.25 END * 10000)::INT
"""


_register("stratified_sample_lang", _q_stratified_sample, _stratified_sample_sql())


def _q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mixture sampling (operators/sampling.py mixture_sample):
    down-sample sources so surviving token mass approaches the target
    recipe (src1:50%, src2:30%, src3:20% of a 2000-token budget; other
    sources dropped). One tiny per-source agg collected driver-side,
    then a shuffle-free hash-Bernoulli filter."""
    from miru_spark.operators.sampling import mixture_sample
    from miru_spark.tokenize import tokens_col

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = d.withColumn("n_tokens", F.size(tokens_col(F.col("text"))).cast("bigint"))
    kept = mixture_sample(
        d, weights={"src1": 0.5, "src2": 0.3, "src3": 0.2}, budget_tokens=2000
    )
    return kept.select("doc_id", "source", "n_tokens")


def _mixture_sample_sql() -> str:
    from miru_spark.operators.sampling import duckdb_bucket

    b = duckdb_bucket("k.doc_id", "v1")
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         len(regexp_extract_all(lower(text), '[a-z0-9'']+'))::BIGINT AS n_tokens
  FROM documents
),
tot AS (SELECT source, SUM(n_tokens)::BIGINT AS st FROM toks GROUP BY 1),
w(source, wt) AS (VALUES ('src1', 0.5), ('src2', 0.3), ('src3', 0.2)),
rates AS (
  SELECT t.source, LEAST(1.0, w.wt * 2000 / t.st) AS rate
  FROM tot t JOIN w USING (source)
)
SELECT k.doc_id, k.source, k.n_tokens
FROM toks k JOIN rates r USING (source)
WHERE {b} < ROUND(r.rate * 10000)::INT
"""


_register("mixture_sample_sources", _q_mixture_sample, _mixture_sample_sql())


def _q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of temporal join (operators/asof.py): every purchase event
    attached to the same user's latest at-or-before click — the
    two-stream generalization of the reference's time-index probe
    (LabTimeIndex.getClosestId). One shuffle (window keyed on user)."""
    from miru_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = asof_join(
        ev.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        ),
        ev.where(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts", "value"
        ),
        on="user_id",
        payload_cols=["event_id", "value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_ref").alias("click_event_id"),
        F.col("value_ref").alias("click_value"),
    )


_register(
    "asof_purchase_click",
    _q_asof,
    """
WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
     r AS (SELECT * FROM events WHERE event_type = 'click')
SELECT l.event_id, l.user_id,
       r.event_id AS click_event_id, r.value AS click_value
FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)


def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (operators/asof.py range_join): all clicks within
    the day before each purchase, per user — bucketed equi-join rewrite
    of the theta range predicate (never a cartesian plan), aggregated
    per purchase."""
    from miru_spark.operators.asof import range_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = range_join(
        ev.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        ),
        ev.where(F.col("event_type") == "click").select("user_id", "ts", "value"),
        window_seconds=86400.0,
        on="user_id",
    )
    return pairs.groupBy("event_id", "user_id").agg(
        F.count("*").alias("n_clicks"),
        F.round(F.sum("value_ref"), 4).alias("click_value_sum"),
    )


_register(
    "range_join_clicks",
    _q_range_join,
    """
WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
     r AS (SELECT * FROM events WHERE event_type = 'click')
SELECT l.event_id, l.user_id, COUNT(*)::BIGINT AS n_clicks,
       ROUND(SUM(r.value), 4) AS click_value_sum
FROM l JOIN r ON l.user_id = r.user_id
 AND r.ts >= l.ts - INTERVAL 1 DAY AND r.ts <= l.ts
GROUP BY 1, 2
""",
)


def _q_bloom_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom set-containment (BloomIndex.java:34-120 semantics): 64-bit
    per-doc bloom prefilter prunes the corpus with a bitwise scan, exact
    postings verify keeps the output oracle-exact."""
    from miru_spark.operators.bloom import contains_all

    idx = _index_for(spark, sf_dir)
    return contains_all(idx, ["spark", "join", "merge"])


_register(
    "bloom_contains_all",
    _q_bloom_contains,
    f"""{SQL_PRELUDE}
SELECT docint FROM post WHERE term IN ('join', 'merge', 'spark')
GROUP BY docint HAVING COUNT(DISTINCT term) = 3
""",
)


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS via banding with a pigeonhole guarantee
    (max_hamming < n_bands ⇒ recall 1.0 by construction) — the oracle
    is the exact all-pairs popcount, so the hash must match exactly."""
    from miru_spark.operators.dedup import simhash_dup_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_dup_pairs(d, max_hamming=2, n_bands=4)


_register(
    "dedup_simhash_pairs",
    _q_simhash_pairs,
    f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS t
  FROM documents
),
tf AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
h AS (SELECT doc_id, c, {{md5}} AS hv FROM tf),
bits AS (
  SELECT doc_id, b.b,
         SUM(CASE WHEN (hv >> b.b) & 1 = 1 THEN c ELSE -c END) AS vote
  FROM h CROSS JOIN (SELECT unnest(range(32)) AS b) b
  GROUP BY 1, 2
),
s AS (
  SELECT doc_id AS id,
         COALESCE(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END), 0)::BIGINT AS sh
  FROM bits GROUP BY 1
)
SELECT a.id AS id_a, b.id AS id_b,
       bit_count(xor(a.sh::BIT, b.sh::BIT))::INT AS hamming
FROM s a JOIN s b ON a.id < b.id
WHERE bit_count(xor(a.sh::BIT, b.sh::BIT)) <= 2
""".format(md5=_MD5L.format(x="t")),
)


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.operators.similarity import cosine_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk(e, query_id=0, k=10)


_register(
    "knn_cosine",
    _q_knn,
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id != 0)
SELECT vec_id, ROUND({_COS_SQL.format(a='v', b='qv')}, 4) AS cosine
FROM d CROSS JOIN q
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
""",
)


def _q_emb_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.operators.similarity import cosine_dup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_dup_pairs(e, threshold=0.4)


_register(
    "dedup_embedding",
    _q_emb_dups,
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({_COS_SQL.format(a='a.v', b='b.v')}, 4) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND({_COS_SQL.format(a='a.v', b='b.v')}, 4) >= 0.4
""",
)


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.operators.textstats import token_counts

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_counts(d)


_register(
    "text_token_counts",
    _q_token_counts,
    f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t, text
  FROM documents
)
SELECT doc_id AS id, len(t)::INT AS n_tokens,
       len(list_distinct(t))::INT AS n_unique_tokens,
       length({_NORM})::INT AS n_chars_norm
FROM tok
""",
)


def _q_ngram_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate-n-gram quality signals over documents."""
    from miru_spark.operators.textstats import ngram_repetition

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_repetition(d, n=3)


_register(
    "text_ngram_repetition",
    _q_ngram_rep,
    """
WITH d AS (
  SELECT doc_id AS id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
  FROM documents
),
g AS (
  SELECT id,
         list_transform(range(len(t) - 2),
                        i -> array_to_string(t[i + 1:i + 3], ' ')) AS gs
  FROM d WHERE len(t) >= 3
),
e AS (SELECT id, unnest(gs) AS gram FROM g),
gd AS (SELECT gram, COUNT(DISTINCT id) AS gdf FROM e GROUP BY 1),
pd AS (
  SELECT e.id, COUNT(*) AS n_ngrams, COUNT(DISTINCT e.gram) AS n_distinct,
         SUM(CASE WHEN gd.gdf > 1 THEN 1 ELSE 0 END) AS n_crossdup
  FROM e JOIN gd USING (gram) GROUP BY 1
)
SELECT d.id,
       COALESCE(pd.n_ngrams, 0)::INT AS n_ngrams,
       COALESCE(pd.n_distinct, 0)::INT AS n_distinct,
       CASE WHEN COALESCE(pd.n_ngrams, 0) > 0
            THEN ROUND(1.0 - pd.n_distinct / pd.n_ngrams::DOUBLE, 4)
            ELSE 0.0 END AS rep_ratio,
       CASE WHEN COALESCE(pd.n_ngrams, 0) > 0
            THEN ROUND(pd.n_crossdup / pd.n_ngrams::DOUBLE, 4)
            ELSE 0.0 END AS cross_dup_frac
FROM d LEFT JOIN pd USING (id)
""",
)


def _q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counting over documents."""
    from miru_spark.operators.textstats import bpe_token_estimate

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_token_estimate(d)


_register(
    "text_bpe_tokens",
    _q_bpe_tokens,
    """
WITH c AS (
  SELECT doc_id AS id,
         len(regexp_extract_all(text, '[^ ]+'))::INT AS n_ws_tokens,
         len(regexp_extract_all(lower(text),
             '''[a-z]{1,2}| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 '']+| +'))::INT
           AS n_bpe_pieces
  FROM documents
)
SELECT id, n_ws_tokens, n_bpe_pieces,
       CASE WHEN n_ws_tokens > 0
            THEN ROUND(n_bpe_pieces / n_ws_tokens::DOUBLE, 4)
            ELSE 0.0 END AS pieces_per_word
FROM c
""",
)


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing a 5-gram
    with a held-out eval slice (doc_id % 20 == 0). The bench gram set is
    broadcast; the check is one scan of the training gram stream."""
    from miru_spark.operators.textstats import decontaminate

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = decontaminate(
        d.where(F.col("doc_id") % 20 != 0), d.where(F.col("doc_id") % 20 == 0), n=5
    )
    return out.withColumn("contaminated", F.col("contaminated").cast("int"))


_register(
    "decontaminate_docs",
    _q_decontaminate,
    """
WITH d AS (
  SELECT doc_id AS id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
  FROM documents
),
g AS (
  SELECT id, list_transform(range(len(t) - 4),
                            i -> array_to_string(t[i + 1:i + 5], ' ')) AS gs
  FROM d WHERE len(t) >= 5
),
e AS (SELECT DISTINCT id, unnest(gs) AS gram FROM g),
bench AS (SELECT DISTINCT gram FROM e WHERE id % 20 = 0),
pd AS (
  SELECT e.id, COUNT(*) AS n_grams,
         SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM e LEFT JOIN bench b USING (gram)
  WHERE e.id % 20 != 0 GROUP BY 1
)
SELECT d.id,
       COALESCE(pd.n_grams, 0)::INT AS n_grams,
       COALESCE(pd.n_hit, 0)::INT AS n_hit,
       CASE WHEN COALESCE(pd.n_grams, 0) > 0
            THEN ROUND(pd.n_hit / pd.n_grams::DOUBLE, 4)
            ELSE 0.0 END AS contam_frac,
       CASE WHEN COALESCE(pd.n_hit, 0) > 0 THEN 1 ELSE 0 END AS contaminated
FROM d LEFT JOIN pd USING (id)
WHERE d.id % 20 != 0
""",
)


def _q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (budget 512) over the documents
    table: per doc its global token offset and first/last sequence id,
    computed with the two-level distributed prefix sum (no unpartitioned
    window). Oracle = the same layout via a plain window cumsum."""
    from miru_spark.operators.packing import pack_chunks
    from miru_spark.operators.textstats import token_counts

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = token_counts(d).select("id", "n_tokens")
    return pack_chunks(toks, budget=512, id_col="id")


_register(
    "pack_sequences",
    _q_pack_chunks,
    """
WITH d AS (
  SELECT doc_id AS id,
         len(regexp_extract_all(lower(text), '[a-z0-9'']+'))::BIGINT AS n
  FROM documents
),
c AS (
  SELECT id, n,
         COALESCE(SUM(n) OVER (ORDER BY id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM d
)
SELECT id, n::INT AS n_tokens, start::BIGINT AS start,
       (start // 512)::BIGINT AS seq_id,
       (start % 512)::INT AS seq_off,
       (CASE WHEN n > 0 THEN (start + n - 1) // 512
             ELSE start // 512 END)::BIGINT AS seq_last
FROM c
""",
)


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.operators.textstats import quality_scores

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quality_scores(d)


_register(
    "text_quality",
    _q_quality,
    """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t,
         lower(text) AS low
  FROM documents
),
m AS (
  SELECT doc_id AS id, len(t)::INT AS n_tokens,
         ROUND(len(list_distinct(t))::DOUBLE / greatest(len(t), 1), 4) AS ttr,
         ROUND(len(list_filter(t, x -> list_contains(
             ['the','and','is','of','to','in','that','it'], x)))::DOUBLE
             / greatest(len(t), 1), 4) AS stop_ratio,
         ROUND(length(regexp_replace(low, '[^a-z0-9'' ]', '', 'g'))::DOUBLE
             / greatest(length(low), 1), 4) AS alnum_ratio,
         ROUND(length(array_to_string(t, ''))::DOUBLE
             / greatest(len(t), 1), 4) AS avg_token_len
  FROM tok
)
SELECT id, n_tokens, ttr, stop_ratio, alnum_ratio, avg_token_len,
       ROUND((ttr + least(stop_ratio * 4, 1.0) + alnum_ratio) / 3.0, 4) AS quality
FROM m
""",
)


def _q_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.operators.textstats import lang_id

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lang_id(d)


_register(
    "text_lang_id",
    _q_lang,
    """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
  FROM documents
),
sc AS (
  SELECT doc_id,
    ROUND(len(list_filter(t, x -> list_contains(
      ['der','die','und','ist','nicht','das','mit','ein'], x)))::DOUBLE
      / greatest(len(t), 1), 4) AS s_de,
    ROUND(len(list_filter(t, x -> list_contains(
      ['the','and','is','of','to','in','that','it'], x)))::DOUBLE
      / greatest(len(t), 1), 4) AS s_en,
    ROUND(len(list_filter(t, x -> list_contains(
      ['el','la','que','de','los','es','una','por'], x)))::DOUBLE
      / greatest(len(t), 1), 4) AS s_es,
    ROUND(len(list_filter(t, x -> list_contains(
      ['le','la','et','les','des','est','une','dans'], x)))::DOUBLE
      / greatest(len(t), 1), 4) AS s_fr
  FROM tok
)
SELECT doc_id AS id,
  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       WHEN s_es >= s_fr THEN 'es'
       ELSE 'fr' END AS lang_pred,
  greatest(s_de, s_en, s_es, s_fr) AS lang_score
FROM sc
""",
)


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.operators.textstats import doc_fingerprints

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return doc_fingerprints(d)


_register(
    "text_fingerprint",
    _q_fingerprints,
    f"""
SELECT doc_id AS id, md5({_NORM}) AS fp_md5,
       {_MD5L.format(x=_NORM)} AS fp_long
FROM documents
""",
)


def _q_analyze_locale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-locale analysis (TermAnalyzers.java:45-133): each document
    is analyzed by the analyzer its ``lang`` maps to via
    analyzer_for_locale (en → minimal plural stemmer, fr/de/es →
    per-language minimal suffix stemmers over the accent-aware latin
    tokenizer, zh/ja/ko → CJK bigrams, else standard) and reports
    token/term counts. The stemmed rows are the hard signal: their
    n_terms differ from standard whenever inflected forms conflate."""
    from miru_spark.analyzers import analyze_col, analyzer_for_locale

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert analyzer_for_locale("fr") == "fr"  # registry drives the routing
    toks = (
        F.when(F.col("lang") == "en", analyze_col(F.col("text"), "en"))
        .when(F.col("lang") == "fr", analyze_col(F.col("text"), "fr"))
        .when(F.col("lang") == "de", analyze_col(F.col("text"), "de"))
        .when(F.col("lang") == "es", analyze_col(F.col("text"), "es"))
        .when(
            F.col("lang").isin("zh", "ja", "ko"),
            analyze_col(F.col("text"), "cjk"),
        )
        .otherwise(analyze_col(F.col("text"), "standard"))
    )
    # struct-wrap so the analysis expression is materialized once, not
    # re-evaluated per consumer (same trick as postings_flat)
    wrapped = d.select("doc_id", "lang", F.struct(toks.alias("t")).alias("_s"))
    return wrapped.select(
        F.col("doc_id").alias("id"),
        F.col("lang").alias("lang"),
        F.size("_s.t").alias("n_tokens"),
        F.size(F.array_distinct("_s.t")).alias("n_terms"),
    )


def _analyze_locale_sql() -> str:
    from miru_spark.analyzers import duckdb_analyze

    cases = "\n              ".join(
        f"WHEN lang = '{lang}' THEN {duckdb_analyze('text', lang)}"
        for lang in ("en", "fr", "de", "es")
    )
    cjk = duckdb_analyze("text", "cjk")
    std = duckdb_analyze("text", "standard")
    return f"""
SELECT doc_id AS id, lang,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_terms
FROM (
  SELECT doc_id, lang,
         CASE {cases}
              WHEN lang IN ('zh','ja','ko') THEN {cjk}
              ELSE {std} END AS t
  FROM documents
)
"""


_register("analyze_locale", _q_analyze_locale, _analyze_locale_sql())


def _q_analyze_locale_stop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopworded per-locale analysis — the reference's
    findAnalyzer(locale, useStopWords=true) path (TermAnalyzers.java:
    50-56): same routing as analyze_locale but each stemmed analyzer
    filters its post-stem locale stopword set; n_tokens shrinks by
    exactly the per-doc stopword hits, proving the filtered chain."""
    from miru_spark.analyzers import analyze_col, analyzer_for_locale

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = (
        F.when(
            F.col("lang") == "en",
            analyze_col(F.col("text"), analyzer_for_locale("en", use_stopwords=True)),
        )
        .when(
            F.col("lang") == "fr",
            analyze_col(F.col("text"), analyzer_for_locale("fr", use_stopwords=True)),
        )
        .when(
            F.col("lang") == "de",
            analyze_col(F.col("text"), analyzer_for_locale("de", use_stopwords=True)),
        )
        .when(
            F.col("lang") == "es",
            analyze_col(F.col("text"), analyzer_for_locale("es", use_stopwords=True)),
        )
        .when(
            F.col("lang").isin("zh", "ja", "ko"),
            analyze_col(F.col("text"), "cjk"),
        )
        .otherwise(analyze_col(F.col("text"), "standard"))
    )
    wrapped = d.select("doc_id", "lang", F.struct(toks.alias("t")).alias("_s"))
    return wrapped.select(
        F.col("doc_id").alias("id"),
        F.col("lang").alias("lang"),
        F.size("_s.t").alias("n_tokens"),
        F.size(F.array_distinct("_s.t")).alias("n_terms"),
    )


def _analyze_locale_stop_sql() -> str:
    from miru_spark.analyzers import duckdb_analyze

    cases = "\n              ".join(
        f"WHEN lang = '{lang}' THEN {duckdb_analyze('text', lang + '_stop')}"
        for lang in ("en", "fr", "de", "es")
    )
    cjk = duckdb_analyze("text", "cjk")
    std = duckdb_analyze("text", "standard")
    return f"""
SELECT doc_id AS id, lang,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_terms
FROM (
  SELECT doc_id, lang,
         CASE {cases}
              WHEN lang IN ('zh','ja','ko') THEN {cjk}
              ELSE {std} END AS t
  FROM documents
)
"""


_register(
    "analyze_locale_stop", _q_analyze_locale_stop, _analyze_locale_stop_sql()
)


def _q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.operators.multimodal import documents_as_binary, extract_features

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return extract_features(documents_as_binary(d))


_register(
    "multimodal_features",
    _q_multimodal,
    f"""
WITH h AS (
  SELECT doc_id AS id, octet_length(encode(text))::INT AS n_bytes,
         {_MD5L.format(x="text")} AS content_hash
  FROM documents
)
SELECT id, n_bytes, content_hash,
       (1 + (content_hash % 1920))::INT AS width,
       (1 + ((content_hash // 1920) % 1080))::INT AS height,
       'fake' AS fmt
FROM h
""",
)


def _q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL header decode: synthetic PNG/GIF/JPEG payloads (geometry a
    pure function of doc_id) parsed back by the byte-level header
    parser — the oracle recomputes the expected geometry in SQL, so a
    wrong parse (not just a wrong fake) fails the hash."""
    from miru_spark.operators.multimodal import documents_as_images, extract_features

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return extract_features(documents_as_images(d)).select(
        "id", "n_bytes", "width", "height", "fmt"
    )


_register(
    "multimodal_decode",
    _q_multimodal_decode,
    """
SELECT doc_id AS id, 64::INT AS n_bytes,
       (16 + doc_id % 640)::INT AS width,
       (16 + (doc_id * 7) % 480)::INT AS height,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'jpeg' END AS fmt
FROM documents
""",
)


def _q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RIFF/WAVE header parse: synthetic WAV payloads (all fields
    doc_id arithmetic) parsed back byte-level; the oracle recomputes
    rate/channels/bits/samples/duration in SQL, so a wrong chunk walk
    fails the hash."""
    from miru_spark.operators.multimodal import (
        documents_as_audio,
        extract_audio_features,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return extract_audio_features(documents_as_audio(d))


_register(
    "multimodal_audio",
    _q_multimodal_audio,
    """
SELECT doc_id AS id, 44::INT AS n_bytes,
       (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END)::INT
         AS sample_rate,
       (1 + doc_id % 2)::INT AS channels,
       (8 * (1 + doc_id % 2))::INT AS bits,
       (1000 + (doc_id * 37) % 50000)::BIGINT AS n_samples,
       ((1000 + (doc_id * 37) % 50000) * 1000
        // (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END)
       )::BIGINT AS duration_ms
FROM documents
""",
)


def _q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-fit resize plan over REAL decoded geometry — pure column
    arithmetic (scale = min(256/w, 256/h, 1)); the pixel resample is
    the codec-bound stub, everything up to it is exact."""
    from miru_spark.operators.multimodal import (
        documents_as_images,
        extract_features,
        resize_geometry,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return resize_geometry(
        extract_features(documents_as_images(d)), max_w=256, max_h=256
    )


_register(
    "multimodal_resize",
    _q_multimodal_resize,
    """
WITH g AS (
  SELECT doc_id AS id,
         (16 + doc_id % 640)::INT AS width,
         (16 + (doc_id * 7) % 480)::INT AS height,
         CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'jpeg' END AS fmt
  FROM documents
),
s AS (
  SELECT *, least(256.0 / width, 256.0 / height, 1.0) AS sc FROM g
)
SELECT id, width, height, fmt,
       greatest(floor(width * sc), 1)::INT AS out_w,
       greatest(floor(height * sc), 1)::INT AS out_h
FROM s
""",
)


def _q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan: one frame per second of a video column
    whose typed metadata (duration_ms, fps) derives from doc_id; the
    (id, frame_idx) relation is the exact input a codec-bound frame
    decoder consumes."""
    from miru_spark.operators.multimodal import sample_frame_indices

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    videos = d.select(
        F.col("doc_id").alias("id"),
        ((F.col("doc_id") % 7) * 1500 + 500).cast("long").alias("duration_ms"),
        F.when(F.col("doc_id") % 2 == 0, 24).otherwise(30).alias("fps"),
    )
    return sample_frame_indices(videos, every_ms=1000)


_register(
    "multimodal_frames",
    _q_multimodal_frames,
    """
WITH v AS (
  SELECT doc_id AS id,
         ((doc_id % 7) * 1500 + 500)::BIGINT AS duration_ms,
         CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 30 END AS fps
  FROM documents
)
SELECT DISTINCT id,
       floor(t.i * 1000 * fps / 1000.0)::BIGINT AS frame_idx
FROM v, unnest(range(0, (duration_ms // 1000) + 1)) AS t(i)
""",
)


# per-process ANN index cache: built once per corpus, probed per query —
# the persisted-index serving shape (at real scale LshIndex.save/load
# replaces this with table-partitioned parquet)
_LSH_CACHE: dict[str, object] = {}


def _lsh_index_for(spark: SparkSession, sf_dir: str):
    from miru_spark.operators.similarity import LshIndex

    key = f"{id(spark)}:{sf_dir}"
    if key not in _LSH_CACHE:
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        idx = LshIndex.build(e, n_bits=8, n_tables=8)
        idx.assignments = idx.assignments.cache()
        _LSH_CACHE[key] = idx
    return _LSH_CACHE[key]


def _q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN path — probes the prebuilt (vec_id, table, bucket) index by
    literal bucket keys computed driver-side; no corpus re-hash per
    query. No SQL oracle (deterministic hyperplanes live in the
    engine); recall vs brute force is asserted in pytest."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return _lsh_index_for(spark, sf_dir).topk(e, query_id=0, k=10)


_register("knn_cosine_lsh", _q_knn_lsh, None)


_IVF_CACHE: dict = {}


def _ivf_index_for(spark: SparkSession, sf_dir: str):
    from miru_spark.operators.similarity import IvfIndex

    key = f"{id(spark)}:{sf_dir}"
    if key not in _IVF_CACHE:
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        idx = IvfIndex.build(e, n_lists=16)
        idx.assignments = idx.assignments.cache()
        _IVF_CACHE[key] = idx
    return _IVF_CACHE[key]


def _q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN path — coarse-quantizer centroids trained on a bounded
    deterministic sample, corpus assigned to inverted lists once at
    build, query probes the nprobe nearest lists by literal list-id
    predicates (partition pruning at scale). No SQL oracle (centroids
    are engine-side); recall vs brute force asserted in pytest."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return _ivf_index_for(spark, sf_dir).topk(e, query_id=0, k=10, nprobe=6)


_register("knn_cosine_ivf", _q_knn_ivf, None)


def _q_emb_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for embedding dedup: LSH band-bucket candidate join +
    exact-cosine verify (no crossJoin). The oracle is the EXACT pair
    SQL — params are tuned so LSH recall is 1.0 at test scale, making
    the outputs identical (verified by hash match)."""
    from miru_spark.operators.similarity import cosine_dup_pairs_lsh

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_dup_pairs_lsh(e, threshold=0.4, n_bits=4, n_tables=24)


_register(
    "dedup_embedding_lsh",
    _q_emb_dups_lsh,
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({_COS_SQL.format(a='a.v', b='b.v')}, 4) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND({_COS_SQL.format(a='a.v', b='b.v')}, 4) >= 0.4
""",
)


def _q_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal-index semantics: docs with docint % 17 == 0 soft-deleted;
    masked out of the answer while BM25 stats stay pre-delete (the
    reference masks answers, stats change only on rebuild)."""
    idx = _index_for(spark, sf_dir)
    tomb = idx.docs.where(F.col("docint") % 17 == 0).select("docint")
    out = search(idx.with_tombstones(tomb), "spark OR join", k=10)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_removal",
    _q_removal,
    _bm25_sql(
        "SELECT DISTINCT docint FROM post WHERE term IN ('join','spark') "
        "AND docint % 17 != 0",
        "p.term IN ('join','spark')",
        10,
    ),
)


def _q_strut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strut/catwalk ML feature scoring (Strut.java:202-218,
    Catwalk.java model build): model = per-term numerator/denominator
    over the 'spark' answer set, strut-scores the 'join' candidates."""
    from miru_spark.operators.strut import catwalk_model, strut_score

    idx = _index_for(spark, sf_dir)
    answer = idx.postings.where(F.col("term") == "spark").select("docint").distinct()
    model = catwalk_model(idx, answer, min_numerator=3)
    cands = idx.postings.where(F.col("term") == "join").select("docint").distinct()
    return strut_score(idx, cands, model, k=10, round_dp=4)


_register(
    "strut_scored",
    _q_strut,
    f"""{SQL_PRELUDE},
ans AS (SELECT DISTINCT docint FROM post WHERE term = 'spark'),
num AS (
  SELECT term, COUNT(*) AS numerator FROM post
  WHERE docint IN (SELECT docint FROM ans)
  GROUP BY 1 HAVING COUNT(*) >= 3
),
model AS (
  SELECT n.term, LEAST(n.numerator::DOUBLE / s.df, 1.0) AS weight
  FROM num n JOIN stats s USING (term)
),
cand AS (SELECT DISTINCT docint FROM post WHERE term = 'join'),
scored AS (
  SELECT p.docint, SUM(m.weight) AS score
  FROM post p JOIN model m USING (term)
  WHERE p.docint IN (SELECT docint FROM cand)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, sc.docint, ROUND(sc.score, 4) AS score
FROM scored sc JOIN dl USING (docint)
ORDER BY ROUND(sc.score, 4) DESC, sc.docint DESC LIMIT 10
""",
)


def _q_strut_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strut MAX strategy (Strategy.java:6-10, Strut.java:386-393
    finalizeScore): each candidate scores as its single strongest
    model feature — same plan as strut_scored, max instead of sum."""
    from miru_spark.operators.strut import catwalk_model, strut_score

    idx = _index_for(spark, sf_dir)
    answer = idx.postings.where(F.col("term") == "spark").select("docint").distinct()
    model = catwalk_model(idx, answer, min_numerator=3)
    cands = idx.postings.where(F.col("term") == "join").select("docint").distinct()
    return strut_score(idx, cands, model, k=10, round_dp=4, strategy="max")


_register(
    "strut_scored_max",
    _q_strut_max,
    f"""{SQL_PRELUDE},
ans AS (SELECT DISTINCT docint FROM post WHERE term = 'spark'),
num AS (
  SELECT term, COUNT(*) AS numerator FROM post
  WHERE docint IN (SELECT docint FROM ans)
  GROUP BY 1 HAVING COUNT(*) >= 3
),
model AS (
  SELECT n.term, LEAST(n.numerator::DOUBLE / s.df, 1.0) AS weight
  FROM num n JOIN stats s USING (term)
),
cand AS (SELECT DISTINCT docint FROM post WHERE term = 'join'),
scored AS (
  SELECT p.docint, MAX(m.weight) AS score
  FROM post p JOIN model m USING (term)
  WHERE p.docint IN (SELECT docint FROM cand)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, sc.docint, ROUND(sc.score, 4) AS score
FROM scored sc JOIN dl USING (docint)
ORDER BY ROUND(sc.score, 4) DESC, sc.docint DESC LIMIT 10
""",
)


def _q_strut_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strut REGRESSION_WEIGHTED strategy (Strategy.java:7 '0.5*A +
    0.4*B + ...', Strut.java:378-385 + scaleScore:355-360): per-feature
    request scalars multiply each feature score before the sum. Scalars
    here are a deterministic per-term banding (0.5 short terms / 0.3
    long) so the DuckDB twin can replay them exactly."""
    from miru_spark.operators.strut import catwalk_model, strut_score

    idx = _index_for(spark, sf_dir)
    answer = idx.postings.where(F.col("term") == "spark").select("docint").distinct()
    model = catwalk_model(idx, answer, min_numerator=3).withColumn(
        "scalar", F.when(F.length("term") <= 4, F.lit(0.5)).otherwise(F.lit(0.3))
    )
    cands = idx.postings.where(F.col("term") == "join").select("docint").distinct()
    return strut_score(
        idx, cands, model, k=10, round_dp=4, strategy="regression_weighted"
    )


_register(
    "strut_scored_regression",
    _q_strut_regression,
    f"""{SQL_PRELUDE},
ans AS (SELECT DISTINCT docint FROM post WHERE term = 'spark'),
num AS (
  SELECT term, COUNT(*) AS numerator FROM post
  WHERE docint IN (SELECT docint FROM ans)
  GROUP BY 1 HAVING COUNT(*) >= 3
),
model AS (
  SELECT n.term, LEAST(n.numerator::DOUBLE / s.df, 1.0) AS weight,
         CASE WHEN length(n.term) <= 4 THEN 0.5 ELSE 0.3 END AS scalar
  FROM num n JOIN stats s USING (term)
),
cand AS (SELECT DISTINCT docint FROM post WHERE term = 'join'),
scored AS (
  SELECT p.docint, SUM(m.weight * m.scalar) AS score
  FROM post p JOIN model m USING (term)
  WHERE p.docint IN (SELECT docint FROM cand)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, sc.docint, ROUND(sc.score, 4) AS score
FROM scored sc JOIN dl USING (docint)
ORDER BY ROUND(sc.score, 4) DESC, sc.docint DESC LIMIT 10
""",
)


def _q_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highlighter (LuceneBackedQueryParser.highlight:56-74): top-k BM25
    hits with a ±8-token window around the first matched token, matches
    wrapped in <b></b>. The full windowing+marking logic has a DuckDB
    twin, so snippets are hash-checked exactly."""
    from miru_spark.query.highlight import with_snippets

    idx = _index_for(spark, sf_dir)
    res = search(idx, "spark AND join", k=10)
    out = with_snippets(idx, res, "spark AND join", window=8)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_snippets",
    _q_snippets,
    f"""{SQL_PRELUDE},
m AS (
  SELECT docint FROM post WHERE term IN ('spark','join')
  GROUP BY docint HAVING COUNT(DISTINCT term) = 2
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('spark','join') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
),
topk AS (
  SELECT dl.conv_id, dl.turn_idx, m.docint,
         ROUND(COALESCE(ct.score, 0), 4) AS score
  FROM m
  LEFT JOIN contrib ct USING (docint)
  JOIN dl ON dl.docint = m.docint
  ORDER BY COALESCE(ct.score, 0) DESC, m.docint DESC
  LIMIT 10
),
sn AS (
  SELECT topk.conv_id, topk.turn_idx, topk.docint, topk.score,
         {_TOK} AS t
  FROM topk JOIN d ON d.docint = topk.docint
),
calc AS (
  SELECT *,
    greatest(list_position(list_transform(t, x -> x IN ('spark','join')),
                           true) - 9, 0) AS lo
  FROM sn
)
SELECT conv_id, turn_idx, docint, score,
  array_to_string(
    list_transform(t[lo + 1 : lo + 17],
      x -> CASE WHEN x IN ('spark','join')
                THEN '<b>' || x || '</b>' ELSE x END),
    ' ') AS snippet
FROM calc
""",
)


# -- block-max serving paths (SURVEY §2.6; LabInvertedIndex block layout) ----

_BLOCKS_INDEX_CACHE: dict[str, InvertedIndex] = {}


def _blocks_index_for(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    """The ``_index_for`` handle with compressed block segments attached
    (indexing/blocks.py) — the serving index the plan chooser
    (query/serve.py) routes block-path queries to."""
    import dataclasses

    from miru_spark.indexing.blocks import build_blocks

    key = f"{id(spark)}:{sf_dir}"
    if key not in _BLOCKS_INDEX_CACHE:
        idx = _index_for(spark, sf_dir)
        blocks = build_blocks(
            idx.postings.select("term", "docint", "tf", "doclen"), idx.avg_doclen
        ).cache()
        _BLOCKS_INDEX_CACHE[key] = dataclasses.replace(idx, blocks=blocks)
    return _BLOCKS_INDEX_CACHE[key]


def _q_blockmax_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive BM25 served through the block-segment path: the
    block-id semi-join prunes blocks missing any query term BEFORE any
    varint decode (query/blockmax.py:search_blocks_and). Rank-identical
    to the flat engine; the oracle is the same BM25 SQL — this row is
    the hard correctness signal for the compressed block codec +
    block-max serving stack (reference: MiruFullTextNGTest.java AND
    queries over LabInvertedIndex block storage)."""
    from miru_spark.query.serve import search_auto

    idx = _blocks_index_for(spark, sf_dir)
    out = search_auto(idx, "stream AND window", k=10, and_min_postings=0)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_blockmax",
    _q_blockmax_and,
    _bm25_sql(
        "SELECT docint FROM post WHERE term IN ('stream','window') "
        "GROUP BY docint HAVING COUNT(DISTINCT term) = 2",
        "p.term IN ('stream','window')",
        10,
    ),
)


def _q_wand_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive BM25 served through block-max WAND
    (query/blockmax.py:search_blocks_or): probe the highest-upper-bound
    blocks for a score floor, then decode only blocks whose block-max
    upper bound clears it. Same answer as the flat OR scan — the oracle
    SQL proves it."""
    from miru_spark.query.serve import search_auto

    idx = _blocks_index_for(spark, sf_dir)
    out = search_auto(idx, "stream OR merge", k=10, or_wand_min_postings=0)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_wand",
    _q_wand_or,
    _bm25_sql(
        "SELECT DISTINCT docint FROM post WHERE term IN ('merge','stream')",
        "p.term IN ('merge','stream')",
        10,
    ),
)


# -- phrase / co-occurrence / collaborative filtering ------------------------


def _q_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.query.phrase import search_phrase

    idx = _index_for(spark, sf_dir, positions=True)
    out = search_phrase(idx, "the fast", k=10)
    return out.withColumn("score", F.round("score", 4))


def _q_phrase_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted phrase through the FULL query language (parser → Phrase
    node → positions-join match set → general BM25 path), composed with
    a metadata predicate — beyond the reference's bag-of-terms parser
    which strips quotes to an AND (LuceneBackedQueryParser.java:94-108)."""
    idx = _index_for(spark, sf_dir, positions=True)
    out = search(idx, '"the fast" AND role:user', k=10)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_phrase_query",
    _q_phrase_query,
    f"""{SQL_PRELUDE},
m AS (
  SELECT d.docint FROM d JOIN dl ON dl.docint = d.docint
  WHERE ' ' || array_to_string({_TOK}, ' ') || ' ' LIKE '% the fast %'
    AND dl.role = 'user'
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('fast', 'the') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, m.docint,
       ROUND(COALESCE(ct.score, 0), 4) AS score
FROM m
LEFT JOIN contrib ct USING (docint)
JOIN dl ON dl.docint = m.docint
ORDER BY COALESCE(ct.score, 0) DESC, m.docint DESC
LIMIT 10
""",
)


def _q_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard term 's?a*' (Lucene WildcardQuery semantics): resolved
    against the term dictionary with one LIKE predicate, matched terms
    score like ordinary leaves."""
    idx = _index_for(spark, sf_dir)
    out = search(idx, "s?a* AND role:user", k=10)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_wildcard",
    _q_wildcard,
    _bm25_sql(
        """SELECT DISTINCT p.docint FROM post p JOIN dl ON dl.docint = p.docint
  WHERE p.term LIKE 's_a%' AND dl.role = 'user'""",
        "p.term LIKE 's_a%'",
        10,
    ),
)


def _q_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete: popularity-ranked completions of 's' from the term
    dictionary (df DESC, term ASC) — the Lucene-suggester upgrade of
    plain distincts_prefix enumeration."""
    from miru_spark.query.suggest import suggest_terms

    idx = _index_for(spark, sf_dir)
    return suggest_terms(idx, "s", k=5)


_register(
    "term_suggest",
    _q_suggest,
    f"""{SQL_PRELUDE}
SELECT term, df FROM stats
WHERE term LIKE 's%'
ORDER BY df DESC, term ASC
LIMIT 5
""",
)


def _q_spell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Did you mean" (query/suggest.py spell_correct): dictionary terms
    within 2 edits of the typo 'kye', ranked (dist, df desc, term) —
    Lucene DirectSpellChecker over the term-stats relation with length
    banding before the levenshtein scan."""
    from miru_spark.query.suggest import spell_correct

    idx = _index_for(spark, sf_dir)
    return spell_correct(idx, "kye", max_dist=2, k=5)


_register(
    "spell_correct",
    _q_spell,
    f"""{SQL_PRELUDE}
SELECT term, df, levenshtein(term, 'kye')::INT AS dist
FROM stats
WHERE abs(length(term) - 3) <= 2 AND levenshtein(term, 'kye') <= 2
ORDER BY dist ASC, df DESC, term ASC
LIMIT 5
""",
)


def _q_mlt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this (Lucene MoreLikeThis semantics, engine-served):
    docint 100's top-5 tf-idf terms OR-searched, source excluded.
    Two-phase: 5 scalar term rows collected, then the fused OR plan."""
    from miru_spark.query.mlt import more_like_this

    idx = _index_for(spark, sf_dir)
    out = more_like_this(idx, 100, top_terms=5, k=10)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_more_like_this",
    _q_mlt,
    f"""{SQL_PRELUDE},
qt AS (
  SELECT p.term
  FROM post p JOIN stats s USING (term) CROSS JOIN corpus c
  WHERE p.docint = 100
  ORDER BY p.tf * ln(1 + (c.n_docs - s.df + 0.5) / (s.df + 0.5)) DESC,
           p.term ASC
  LIMIT 5
),
m AS (
  SELECT DISTINCT p.docint FROM post p JOIN qt USING (term)
  WHERE p.docint != 100
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN qt USING (term)
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, m.docint,
       ROUND(COALESCE(ct.score, 0), 4) AS score
FROM m
LEFT JOIN contrib ct USING (docint)
JOIN dl ON dl.docint = m.docint
ORDER BY COALESCE(ct.score, 0) DESC, m.docint DESC
LIMIT 10
""",
)


def _q_field_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field grouping 'tool:(src2 OR src1*) AND fast' (Lucene grammar):
    the group's leaves retarget at the metadata field, composing with
    text scoring as usual."""
    idx = _index_for(spark, sf_dir)
    out = search(idx, "tool:(src2 OR src1*) AND fast", k=10)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_field_group",
    _q_field_group,
    _bm25_sql(
        """SELECT p.docint FROM post p JOIN dl ON dl.docint = p.docint
  WHERE p.term = 'fast'
    AND (dl.tool = 'src2' OR dl.tool LIKE 'src1%')""",
        "p.term = 'fast'",
        10,
    ),
)


def _q_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp term '/s.a[nr]k?/' (Lucene RegexpQuery): anchored match of
    whole dictionary terms, rewritten to an exact term set before
    planning (scan+spark here)."""
    idx = _index_for(spark, sf_dir)
    out = search(idx, "/s.a[nr]k?/ AND role:user", k=10)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_regexp",
    _q_regexp,
    _bm25_sql(
        """SELECT DISTINCT p.docint FROM post p JOIN dl ON dl.docint = p.docint
  WHERE regexp_matches(p.term, '^(?:s.a[nr]k?)$') AND dl.role = 'user'""",
        "regexp_matches(p.term, '^(?:s.a[nr]k?)$')",
        10,
    ),
)


def _q_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene '^B' clause boost: 'fast^3' triples that term's BM25
    weight, reordering the OR's top-k (boosted queries route past the
    fused single-agg plan to the per-leaf-weight path)."""
    idx = _index_for(spark, sf_dir)
    out = search(idx, "the OR fast^3", k=10)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_boost",
    _q_boost,
    f"""{SQL_PRELUDE},
m AS (SELECT DISTINCT p.docint FROM post p WHERE p.term IN ('fast', 'the')),
contrib AS (
  SELECT p.docint,
         SUM({_BM25} * CASE WHEN p.term = 'fast' THEN 3 ELSE 1 END) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('fast', 'the') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, m.docint,
       ROUND(COALESCE(ct.score, 0), 4) AS score
FROM m
LEFT JOIN contrib ct USING (docint)
JOIN dl ON dl.docint = m.docint
ORDER BY COALESCE(ct.score, 0) DESC, m.docint DESC
LIMIT 10
""",
)


def _q_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy term 'part~2' (Lucene FuzzyQuery semantics): dictionary
    terms within 2 Levenshtein edits, length-banded scan of the tiny
    term-stats table; matched terms score like ordinary leaves."""
    idx = _index_for(spark, sf_dir)
    out = search(idx, "part~2 AND role:assistant", k=10)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_fuzzy",
    _q_fuzzy,
    _bm25_sql(
        """SELECT DISTINCT p.docint FROM post p JOIN dl ON dl.docint = p.docint
  WHERE levenshtein(p.term, 'part') <= 2 AND dl.role = 'assistant'""",
        "levenshtein(p.term, 'part') <= 2",
        10,
    ),
)


def _q_phrase_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered proximity ('"the fast"~2'): terms in order within a
    window of n-1+slop positions, served by the greedy position-chain
    evaluator (query/phrase.py:proximity_match_docs), composed with a
    metadata predicate through the full query language."""
    idx = _index_for(spark, sf_dir, positions=True)
    out = search(idx, '"the fast"~2 AND role:user', k=10)
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_phrase_slop",
    _q_phrase_slop,
    _bm25_sql(
        f"""SELECT d.docint FROM d JOIN dl ON dl.docint = d.docint
  WHERE dl.role = 'user' AND len(list_filter(
      list_filter(range(len({_TOK})), i -> ({_TOK})[i+1] = 'the'),
      a -> len(list_filter(range(len({_TOK})),
               b -> ({_TOK})[b+1] = 'fast' AND b > a AND b - a <= 3)) > 0)) > 0""",
        "p.term IN ('fast', 'the')",
        10,
    ),
)


_register(
    "ft_phrase",
    _q_phrase,
    f"""{SQL_PRELUDE},
m AS (
  SELECT docint FROM d
  WHERE ' ' || array_to_string({_TOK}, ' ') || ' ' LIKE '% the fast %'
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('fast', 'the') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, ct.docint, ROUND(ct.score, 4) AS score
FROM contrib ct
JOIN dl ON dl.docint = ct.docint
ORDER BY ct.score DESC, ct.docint DESC
LIMIT 10
""",
)


# positions=True store handle (phrase serving over the PERSISTED
# sharded layout, not just the in-memory index): build → append →
# merge → load once per corpus, mirroring _incremental_index_for
_PHRASE_STORE_CACHE: dict[str, InvertedIndex] = {}


def _phrase_store_index_for(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    import tempfile

    from miru_spark.indexing.incremental import SegmentStore

    key = f"{id(spark)}:{sf_dir}"
    if key not in _PHRASE_STORE_CACHE:
        turns = transcripts_from_documents(spark, sf_dir)
        store = SegmentStore(
            spark,
            tempfile.mkdtemp(prefix="miru_phr_"),
            n_shards=2,
            positions=True,
        )
        store.build(turns.where(F.col("conv_id") < "conv00000050"))
        store.append(turns)
        for s in range(store.n_shards):
            store.merge_shard(s)
        idx = store.load()
        idx.postings = idx.postings.cache()
        idx.terms = idx.terms.cache()
        _PHRASE_STORE_CACHE[key] = idx
    return _PHRASE_STORE_CACHE[key]


def _q_phrase_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase over the PERSISTED positions-bearing SegmentStore
    (build → sip-append → merge → load): positions ride the unit
    parquet like any postings column, so the delta/merge lifecycle and
    the phrase positions-join compose with zero extra machinery. Same
    corpus and phrase as ``ft_phrase``; docint omitted because the
    sharded id space (shard<<40 | local) intentionally differs from the
    oracle's global dense ids. Top-10 scores are boundary-tie-free at
    this corpus, so the (conv_id, turn_idx, score) set is exact."""
    from miru_spark.query.phrase import search_phrase

    idx = _phrase_store_index_for(spark, sf_dir)
    out = search_phrase(idx, "the fast", k=10)
    return out.select(
        "conv_id", "turn_idx", F.round("score", 4).alias("score")
    )


_register(
    "ft_phrase_store",
    _q_phrase_store,
    f"""{SQL_PRELUDE},
m AS (
  SELECT docint FROM d
  WHERE ' ' || array_to_string({_TOK}, ' ') || ' ' LIKE '% the fast %'
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('fast', 'the') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, ROUND(ct.score, 4) AS score
FROM contrib ct
JOIN dl ON dl.docint = ct.docint
ORDER BY ct.score DESC LIMIT 10
""",
)


def _q_cooc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gatherFeatures (MiruAggregateUtil.java:77-442): top counted
    (role, tool) permutations over docs matching 'spark'."""
    from miru_spark.operators.reco import cooccurrence_features

    idx = _index_for(spark, sf_dir)
    answer = (
        idx.postings.where(F.col("term") == "spark").select("docint").distinct()
    )
    return cooccurrence_features(answer, idx.docs, ["role", "tool"], top_n=10)


_register(
    "cooc_features",
    _q_cooc,
    f"""{SQL_PRELUDE},
m AS (SELECT DISTINCT docint FROM post WHERE term = 'spark'),
c AS (
  SELECT role, tool, COUNT(*)::BIGINT AS n
  FROM dl JOIN m USING (docint) GROUP BY 1, 2
)
SELECT role, tool, n,
       ROW_NUMBER() OVER (ORDER BY n DESC, role ASC,
                          tool ASC NULLS FIRST)::INT AS rank
FROM c QUALIFY rank <= 10
""",
)


def _q_collab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollaborativeFiltering.java:58-213 pipeline over events
    (item = the numeric json prop)."""
    from miru_spark.operators.reco import collaborative_filter

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    inter = ev.select(
        "user_id", F.get_json_object("props", "$.k").cast("int").alias("item")
    ).where(F.col("item").isNotNull())
    return collaborative_filter(inter, user_id=149, top_contributors=10, top_items=10)


_register(
    "collab_filter",
    _q_collab,
    """
WITH inter AS (
  SELECT user_id, (props->>'$.k')::INT AS item FROM events
  WHERE (props->>'$.k') IS NOT NULL
),
mine AS (SELECT DISTINCT item FROM inter WHERE user_id = 149),
contributors AS (
  SELECT user_id, COUNT(*)::BIGINT AS weight
  FROM inter
  WHERE user_id != 149 AND item IN (SELECT item FROM mine)
  GROUP BY 1 ORDER BY weight DESC, user_id ASC LIMIT 10
),
their AS (
  SELECT DISTINCT i.user_id, i.item, c.weight
  FROM inter i JOIN contributors c USING (user_id)
  WHERE i.item NOT IN (SELECT item FROM mine)
)
SELECT item, SUM(weight)::BIGINT AS score
FROM their GROUP BY 1
ORDER BY score DESC, item ASC
LIMIT 10
""",
)


# -- corpus analytics: keywords, LM-quality proxy, collocations --------------


def _q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf·idf keywords per document (corpus keyword extraction)."""
    from miru_spark.operators.textstats import tfidf_keywords

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_keywords(d, k=3)


_register(
    "text_tfidf_keywords",
    _q_tfidf_keywords,
    """
WITH tok AS (
  SELECT doc_id AS id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS term
  FROM documents
),
tf AS (SELECT id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
s AS (
  SELECT id, term,
         ROUND(tf * ln(n.n / df.df::DOUBLE), 4) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
r AS (
  SELECT id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY id
                            ORDER BY tfidf DESC, term ASC) AS kw_rank
  FROM s
)
SELECT id, term, tfidf, kw_rank::INT AS kw_rank FROM r WHERE kw_rank <= 3
""",
)


def _q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity proxy per document (quality filter)."""
    from miru_spark.operators.textstats import unigram_logprob

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return unigram_logprob(d)


_register(
    "text_unigram_logprob",
    _q_unigram_logprob,
    """
WITH tok AS (
  SELECT doc_id AS id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS term
  FROM documents
),
tf AS (SELECT id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
cf AS (SELECT term, SUM(tf) AS cf FROM tf GROUP BY 1),
tot AS (SELECT SUM(cf)::DOUBLE AS t FROM cf),
pd AS (
  SELECT tf.id, SUM(tf.tf)::INT AS n_tokens,
         ROUND(SUM(tf.tf * ln(cf.cf::DOUBLE / tot.t)) / SUM(tf.tf), 4)
           AS avg_logprob
  FROM tf JOIN cf USING (term) CROSS JOIN tot
  GROUP BY 1
)
SELECT d.doc_id AS id,
       COALESCE(pd.n_tokens, 0) AS n_tokens,
       COALESCE(pd.avg_logprob, 0.0) AS avg_logprob
FROM documents d LEFT JOIN pd ON pd.id = d.doc_id
""",
)


def _q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-bigram collocations by PMI (phrase mining)."""
    from miru_spark.operators.textstats import pmi_collocations

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pmi_collocations(d, min_count=5, top_n=20)


_register(
    "text_pmi_collocations",
    _q_pmi_collocations,
    """
WITH d AS (
  SELECT doc_id AS id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
  FROM documents
),
g AS (
  SELECT id,
         list_transform(range(len(t) - 1),
                        i -> array_to_string(t[i + 1:i + 2], ' ')) AS gs
  FROM d WHERE len(t) >= 2
),
ge AS (SELECT unnest(gs) AS gram FROM g),
cab AS (SELECT gram, COUNT(*) AS n FROM ge GROUP BY 1),
btot AS (SELECT SUM(n)::DOUBLE AS b FROM cab),
ue AS (SELECT unnest(t) AS w FROM d),
uni AS (SELECT w, COUNT(*) AS cw FROM ue GROUP BY 1),
ttot AS (SELECT SUM(cw)::DOUBLE AS t FROM uni),
cand AS (
  SELECT gram, n,
         string_split(gram, ' ')[1] AS a, string_split(gram, ' ')[2] AS b
  FROM cab WHERE n >= 5
)
SELECT cand.gram, cand.n::INT AS n,
       ROUND(ln((cand.n / btot.b) /
                ((ua.cw / ttot.t) * (ub.cw / ttot.t))), 4) AS pmi
FROM cand
JOIN uni ua ON ua.w = cand.a
JOIN uni ub ON ub.w = cand.b
CROSS JOIN btot CROSS JOIN ttot
ORDER BY pmi DESC, gram ASC
LIMIT 20
""",
)


def _q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor per near-dup cluster: keep the HIGHEST
    composite-quality member (ties by lowest id) instead of the blind
    lowest-id canonical. Oracle = the recursive-CTE component map joined
    to the quality CTE with an ordered-list arg-max."""
    from miru_spark.operators.components import survivor_docs
    from miru_spark.operators.dedup import ngram_jaccard_pairs
    from miru_spark.operators.textstats import quality_scores

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(d, k=3, threshold=0.5)
    q = quality_scores(d).select("id", "quality")
    return survivor_docs(pairs, q)


_register(
    "dedup_survivors",
    _q_dedup_survivors,
    _SH_HASH_SQL.replace("WITH ", "WITH RECURSIVE ", 1)
    + ","
    + _JACCARD_COMPONENT_CTES
    + ","
    + _QUALITY_CTES
    + """,
comp AS (
  SELECT id AS doc_id, LEAST(id, MIN(lbl)) AS component
  FROM reach GROUP BY id
),
jq AS (
  SELECT c.doc_id, c.component, COALESCE(quality.q, '-inf'::DOUBLE) AS q
  FROM comp c LEFT JOIN quality ON quality.doc_id = c.doc_id
),
surv AS (
  SELECT component,
         (list(doc_id ORDER BY q DESC, doc_id ASC))[1] AS survivor_id
  FROM jq GROUP BY component
)
SELECT jq.doc_id, surv.survivor_id
FROM jq JOIN surv USING (component)
""",
)


def _q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means over the embeddings table → (vec_id, cluster,
    sim). No SQL oracle by nature (iterative Lloyd's training); pytest
    asserts determinism, partition totality, and blob separation."""
    from miru_spark.operators.similarity import cluster_embeddings

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cluster_embeddings(e, n_clusters=8, sample=2048, seed=42)


_register("embedding_clusters", _q_embedding_clusters, None)


# -- facet counts over the answer set (SURVEY.md §2.5 gather distincts;
#    MiruAggregateUtil.gather, Distincts plugin) --------------------------


def _q_ft_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-field value counts of the full 'hash OR merge' match set —
    Solr-style faceting via one unpivot scan + one groupBy
    (query/facets.py)."""
    from miru_spark.query.facets import facet_counts

    return facet_counts(
        _index_for(spark, sf_dir), "hash OR merge", ("role", "tool"), top_n=10
    )


_register(
    "ft_facets",
    _q_ft_facets,
    f"""{SQL_PRELUDE},
m AS (SELECT DISTINCT docint FROM post WHERE term IN ('hash','merge')),
j AS (SELECT dl.role, dl.tool FROM dl JOIN m USING (docint)),
u AS (
  SELECT 'role' AS facet, role::VARCHAR AS value FROM j
  UNION ALL
  SELECT 'tool' AS facet, tool::VARCHAR AS value FROM j
),
g AS (SELECT facet, value, COUNT(*)::BIGINT AS n FROM u GROUP BY 1, 2),
r AS (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY facet ORDER BY n DESC, value ASC) AS rn FROM g)
SELECT facet, value, n FROM r WHERE rn <= 10
ORDER BY facet, n DESC, value
""",
)


# -- exact-substring (duplicated span) dedup — Lee et al. 2021 ------------

_SPAN_K = 5

_SPAN_OCC_SQL = f"""
WITH tokd AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS toks
  FROM documents
),
span AS (
  SELECT doc_id, unnest(range(0, greatest(len(toks) - {_SPAN_K} + 1, 0))) AS pos,
         toks
  FROM tokd
),
occ AS (
  SELECT doc_id, pos,
         array_to_string(toks[pos + 1: pos + {_SPAN_K}], ' ') AS gram
  FROM span
)"""


def _q_dedup_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top duplicated 5-token spans corpus-wide (operators/dedup.py
    duplicate_spans — the detection half of exact-substring dedup)."""
    from miru_spark.operators.dedup import duplicate_spans

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        duplicate_spans(d, k=_SPAN_K)
        .orderBy(F.desc("n_occ"), F.asc("gram"))
        .limit(50)
    )


_register(
    "dedup_dup_spans",
    _q_dedup_dup_spans,
    _SPAN_OCC_SQL
    + """
SELECT gram, COUNT(*)::BIGINT AS n_occ, COUNT(DISTINCT doc_id)::BIGINT AS n_docs
FROM occ GROUP BY 1 HAVING COUNT(*) > 1
ORDER BY n_occ DESC, gram ASC
LIMIT 50
""",
)


def _q_dedup_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup rewrite: every token covered by a duplicated
    5-token span is removed except in the span's first corpus occurrence
    (operators/dedup.py strip_duplicate_spans)."""
    from miru_spark.operators.dedup import strip_duplicate_spans

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return strip_duplicate_spans(d, k=_SPAN_K)


_register(
    "dedup_span_strip",
    _q_dedup_span_strip,
    _SPAN_OCC_SQL
    + f""",
occ2 AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY gram) AS cnt
  FROM occ
),
covered AS (
  SELECT DISTINCT doc_id, tpos FROM (
    SELECT doc_id, unnest(range(pos, pos + {_SPAN_K})) AS tpos
    FROM occ2 WHERE cnt > 1 AND rn > 1
  )
),
tok AS (
  SELECT doc_id, s.tpos AS tpos, s.tok AS tok FROM (
    SELECT doc_id,
           unnest(list_transform(toks, (x, i) ->
                  struct_pack(tok := x, tpos := i - 1))) AS s
    FROM tokd
  )
),
kept AS (
  SELECT t.doc_id, t.tpos, t.tok
  FROM tok t
  WHERE NOT EXISTS (
    SELECT 1 FROM covered c WHERE c.doc_id = t.doc_id AND c.tpos = t.tpos
  )
),
clean AS (
  SELECT doc_id, COUNT(*)::INT AS n_kept,
         string_agg(tok, ' ' ORDER BY tpos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, len(d.toks)::INT AS n_tokens,
       (len(d.toks) - COALESCE(c.n_kept, 0))::INT AS n_removed,
       COALESCE(c.clean_text, '') AS clean_text
FROM tokd d LEFT JOIN clean c USING (doc_id)
""",
)


def _q_event_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95/p99 of event value per event_type — the reference's
    RunningPercentile shape (operators/waveform.py value_percentiles)."""
    from miru_spark.operators.waveform import value_percentiles

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = value_percentiles(e, "event_type", "value")
    return out.select(
        "event_type",
        F.round("p50", 4).alias("p50"),
        F.round("p95", 4).alias("p95"),
        F.round("p99", 4).alias("p99"),
        "n",
    )


_register(
    "event_percentiles",
    _q_event_percentiles,
    """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.95), 4) AS p95,
       ROUND(quantile_cont(value, 0.99), 4) AS p99,
       COUNT(*)::BIGINT AS n
FROM events
GROUP BY event_type
""",
)


def _q_ft_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES-style significant_terms (JLH) over the 'merge' answer set
    (query/facets.py significant_terms)."""
    from miru_spark.query.facets import significant_terms

    out = significant_terms(
        _index_for(spark, sf_dir), "merge", top_n=15, min_fg=2
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_significant_terms",
    _q_ft_significant_terms,
    f"""{SQL_PRELUDE},
m AS (SELECT DISTINCT docint FROM post WHERE term = 'merge'),
fgt AS (SELECT COUNT(*)::DOUBLE AS fgt FROM m),
fg AS (
  SELECT term, COUNT(*)::BIGINT AS fg
  FROM post WHERE docint IN (SELECT docint FROM m)
  GROUP BY term HAVING COUNT(*) >= 2
),
j AS (
  SELECT fg.term, fg.fg, s.df,
         ((fg.fg / fgt.fgt) - (s.df / c.n_docs::DOUBLE))
         * ((fg.fg / fgt.fgt) / (s.df / c.n_docs::DOUBLE)) AS score
  FROM fg JOIN stats s USING (term) CROSS JOIN fgt CROSS JOIN corpus c
)
SELECT term, fg, df, ROUND(score, 4) AS score
FROM j ORDER BY score DESC, term ASC LIMIT 15
""",
)


# -- per-conversation analytics (operators/conversations.py) -----------------


def _q_conv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation turn/role/token/duration stats + SFT validity
    (operators/conversations.py conversation_stats)."""
    from miru_spark.operators.conversations import conversation_stats

    return conversation_stats(transcripts_from_documents(spark, sf_dir))


_register(
    "conv_stats",
    _q_conv_stats,
    f"""
WITH t AS ({DUCKDB_TRANSCRIPTS})
SELECT conv_id,
       COUNT(*)::BIGINT AS n_turns,
       SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS n_user,
       SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT
         AS n_assistant,
       SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_tool_calls,
       SUM(len(regexp_extract_all(lower(text), '[a-z0-9'']+')))::BIGINT
         AS total_tokens,
       date_diff('second', MIN(ts), MAX(ts))::BIGINT AS duration_s,
       (min_by(role, turn_idx) = 'user' AND MIN(turn_idx) = 0
        AND MAX(turn_idx) + 1 = COUNT(*)
        AND COUNT(DISTINCT turn_idx) = COUNT(*)) AS is_valid
FROM t
GROUP BY conv_id
""",
)


def _q_conv_role_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-transition Markov counts over consecutive turns
    (operators/conversations.py role_transitions)."""
    from miru_spark.operators.conversations import role_transitions

    return role_transitions(transcripts_from_documents(spark, sf_dir))


_register(
    "conv_role_flow",
    _q_conv_role_flow,
    f"""
WITH t AS ({DUCKDB_TRANSCRIPTS}),
x AS (
  SELECT conv_id, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS from_role
  FROM t
)
SELECT from_role, role AS to_role, COUNT(*)::BIGINT AS n
FROM x WHERE from_role IS NOT NULL
GROUP BY 1, 2
""",
)


def _q_conv_context_sft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT example assembly: previous-2-turn context per assistant turn
    (operators/conversations.py context_windows)."""
    from miru_spark.operators.conversations import context_windows

    return context_windows(
        transcripts_from_documents(spark, sf_dir), k=2, sep="\n"
    )


_register(
    "conv_context_sft",
    _q_conv_context_sft,
    f"""
WITH t AS ({DUCKDB_TRANSCRIPTS}),
x AS (
  SELECT conv_id, turn_idx, role, text,
         string_agg(role || ': ' || text, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS context
  FROM t
)
SELECT conv_id, turn_idx, context, text AS target
FROM x WHERE role = 'assistant'
""",
)


# -- PII scrubbing (operators/pii.py) -----------------------------------------


def _q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails/IPv4s/phones from deterministically PII-salted doc
    text; per-doc redaction counts + scrubbed-text digest
    (operators/pii.py scrub_pii)."""
    from miru_spark.operators.pii import scrub_pii

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    salted = F.concat(
        F.substring("text", 1, 80),
        F.when(
            did % 3 > 0,
            F.concat(F.lit(" u"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(""),
        F.lit(" 10.0."),
        (did % 200).cast("string"),
        F.lit("."),
        (did % 50).cast("string"),
        F.when(
            did % 4 == 0,
            F.concat(F.lit(" and 192.168.1."), (did % 9).cast("string")),
        ).otherwise(""),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" call 555-867-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
    )
    src = d.select(did.alias("id"), salted.alias("text"))
    return scrub_pii(src, "text").select(
        "id",
        "n_email",
        "n_ipv4",
        "n_phone",
        F.md5("scrubbed").alias("digest"),
    )


from miru_spark.operators.pii import pii_sql as _pii_sql  # noqa: E402

_register(
    "text_pii_scrub",
    _q_text_pii_scrub,
    f"""
WITH src AS (
  SELECT doc_id AS id,
         substring(text, 1, 80)
         || CASE WHEN doc_id % 3 > 0
                 THEN ' u' || doc_id::VARCHAR || '@example.com'
                 ELSE '' END
         || ' 10.0.' || (doc_id % 200)::VARCHAR || '.'
         || (doc_id % 50)::VARCHAR
         || CASE WHEN doc_id % 4 = 0
                 THEN ' and 192.168.1.' || (doc_id % 9)::VARCHAR
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call 555-867-'
                      || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                 ELSE '' END AS text
  FROM documents
),
red AS (
  SELECT id,
       {_pii_sql("text")}
  FROM src
)
SELECT id, n_email::INT AS n_email, n_ipv4::INT AS n_ipv4,
       n_phone::INT AS n_phone, md5(scrubbed) AS digest
FROM red
""",
)


# -- alternative ranking functions (query/scoring.py) -------------------------


def _q_ft_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 x exponential recency decay (query/scoring.py
    search_recency; ES function_score decay blend)."""
    from miru_spark.query.scoring import search_recency

    out = search_recency(
        _index_for(spark, sf_dir),
        "hash OR merge",
        ref_ts="2024-02-01 00:00:00",
        half_life_s=604_800.0,
        k=10,
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_recency",
    _q_ft_recency,
    f"""{SQL_PRELUDE},
m AS (SELECT DISTINCT docint FROM post WHERE term IN ('hash','merge')),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('hash','merge')
    AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
),
sc AS (
  SELECT m.docint,
         COALESCE(ct.score, 0)
         * power(0.5, greatest(date_diff('second', dl.ts,
                                TIMESTAMP '2024-02-01 00:00:00'), 0) / 604800.0)
           AS score
  FROM m
  LEFT JOIN contrib ct USING (docint)
  JOIN dl ON dl.docint = m.docint
)
SELECT dl.conv_id, dl.turn_idx, sc.docint, ROUND(sc.score, 4) AS score
FROM sc JOIN dl ON dl.docint = sc.docint
ORDER BY sc.score DESC, sc.docint DESC
LIMIT 10
""",
)


def _q_ft_lm_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood top-k (query/scoring.py
    search_lm_dirichlet; Lucene LMDirichletSimilarity semantics)."""
    from miru_spark.query.scoring import search_lm_dirichlet

    out = search_lm_dirichlet(
        _index_for(spark, sf_dir), "hash OR merge", mu=2000.0, k=10
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_lm_dirichlet",
    _q_ft_lm_dirichlet,
    f"""{SQL_PRELUDE},
tot AS (SELECT SUM(cf)::DOUBLE AS t FROM stats),
sc AS (
  SELECT p.docint,
         SUM(ln(1 + p.tf::DOUBLE * tot.t / (2000.0 * s.cf::DOUBLE))
             + ln(2000.0 / (2000.0 + dl.doclen::DOUBLE))) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN tot
  WHERE p.term IN ('hash','merge')
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, sc.docint, ROUND(sc.score, 4) AS score
FROM sc JOIN dl ON dl.docint = sc.docint
ORDER BY sc.score DESC, sc.docint DESC
LIMIT 10
""",
)


# -- percolation / reverse search (query/percolate.py) ------------------------

_PERC_QUERIES = [
    ("alert_merge_batch", ["merge", "batch"]),
    ("alert_spark_join", ["spark", "join"]),
    ("alert_hash", ["hash"]),
    ("alert_triple", ["merge", "spark", "part"]),
]


def _q_ft_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse search: label docs with the stored conjunctive queries
    they satisfy (query/percolate.py percolate)."""
    from miru_spark.query.percolate import percolate

    return percolate(_index_for(spark, sf_dir), _PERC_QUERIES)


_PERC_VALUES = ", ".join(
    f"('{qid}', '{t}')" for qid, terms in _PERC_QUERIES for t in terms
)

_register(
    "ft_percolate",
    _q_ft_percolate,
    f"""{SQL_PRELUDE},
q(qid, term) AS (VALUES {_PERC_VALUES}),
qs AS (SELECT qid, COUNT(DISTINCT term) AS n FROM q GROUP BY qid),
h AS (
  SELECT p.docint, q.qid, COUNT(DISTINCT p.term) AS c
  FROM post p JOIN q USING (term)
  GROUP BY 1, 2
)
SELECT h.qid, h.docint, dl.conv_id, dl.turn_idx
FROM h
JOIN qs USING (qid)
JOIN dl ON dl.docint = h.docint
WHERE h.c = qs.n
""",
)


# -- physical expunge of tombstoned docs (incremental.py expunge_shard) ------


def _q_expunge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over the SegmentStore AFTER physically expunging tombstoned
    docs (incremental.py expunge_shard — the compaction that reclaims
    the reference's removal index, Lucene expungeDeletes parity).
    Unlike ft_bm25_removal (query-time mask, global stats still include
    removed docs), expunge rewrites segments: df/cf/n_docs/avgdl all
    reflect the reduced corpus, so the oracle is plain BM25 over the
    physically filtered transcripts. Output is id-space-neutral
    (conv_id, turn_idx, score) like ft_bm25_incremental."""
    import tempfile

    from miru_spark.indexing.incremental import SegmentStore
    from miru_spark.operators.removal import tombstones_from_keys

    key = f"{id(spark)}:{sf_dir}:expunge"
    if key not in _INCR_CACHE:
        turns = transcripts_from_documents(spark, sf_dir)
        store = SegmentStore(
            spark, tempfile.mkdtemp(prefix="miru_expunge_"), n_shards=2
        )
        store.build(turns)
        drop_keys = turns.where(
            (F.col("turn_idx") == 3) & (F.col("conv_id") < "conv00000040")
        ).select("conv_id", "turn_idx")
        store.expunge(tombstones_from_keys(store.load(), drop_keys))
        idx = store.load()
        idx.postings = idx.postings.cache()
        idx.terms = idx.terms.cache()
        _INCR_CACHE[key] = idx
    out = search(_INCR_CACHE[key], "merge AND part", k=10)
    return out.select(
        "conv_id", "turn_idx", F.round("score", 4).alias("score")
    )


_EXPUNGED_TRANSCRIPTS = (
    f"SELECT * FROM ({DUCKDB_TRANSCRIPTS}) "
    "WHERE NOT (turn_idx = 3 AND conv_id < 'conv00000040')"
)

_register(
    "ft_bm25_expunge",
    _q_expunge,
    f"""{SQL_PRELUDE.replace(DUCKDB_TRANSCRIPTS, _EXPUNGED_TRANSCRIPTS)},
m AS (
  SELECT docint FROM post WHERE term IN ('merge','part')
  GROUP BY docint HAVING COUNT(DISTINCT term) = 2
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('merge','part') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, ROUND(ct.score, 4) AS score
FROM contrib ct
JOIN dl ON dl.docint = ct.docint
ORDER BY ct.score DESC LIMIT 10
""",
)


# -- versioned repair (upsert) over the store (incremental.py repair) --------


def _q_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over the SegmentStore AFTER a versioned REPAIR
    (MiruIndexer.java:128-162: a re-sent doc with a higher version
    replaces the stored one; stale versions are discarded). The Spark
    side applies a real repair batch (corrected text, ts+1 day) AND a
    stale batch (older ts) that must be a no-op; the oracle replays the
    upsert by rebuilding BM25 over the post-repair corpus. A pass proves
    version arbitration, physical replacement (df/cf/avgdl reflect the
    new text), and stale-discard, end-to-end through the store."""
    import tempfile

    from miru_spark.indexing.incremental import SegmentStore

    key = f"{id(spark)}:{sf_dir}:repair"
    if key not in _INCR_CACHE:
        turns = transcripts_from_documents(spark, sf_dir)
        store = SegmentStore(
            spark, tempfile.mkdtemp(prefix="miru_repair_"), n_shards=2
        )
        store.build(turns)
        pred = (F.col("turn_idx") == 1) & (F.col("conv_id") < "conv00000030")
        fresh = (
            turns.where(pred)
            .withColumn("text", F.concat(F.col("text"), F.lit(" sparkle merge merge")))
            .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
        )
        store.repair(fresh)
        stale = (
            turns.where(pred)
            .withColumn("text", F.lit("poison poison poison"))
            .withColumn("ts", F.col("ts") - F.expr("INTERVAL 1 DAY"))
        )
        store.repair(stale)  # older version: must be discarded
        idx = store.load()
        idx.postings = idx.postings.cache()
        idx.terms = idx.terms.cache()
        _INCR_CACHE[key] = idx
    out = search(_INCR_CACHE[key], "merge AND window", k=10)
    return out.select(
        "conv_id", "turn_idx", F.round("score", 4).alias("score")
    )


_REPAIRED_TRANSCRIPTS = f"""
SELECT conv_id, turn_idx, role,
       CASE WHEN turn_idx = 1 AND conv_id < 'conv00000030'
            THEN text || ' sparkle merge merge' ELSE text END AS text,
       tool,
       CASE WHEN turn_idx = 1 AND conv_id < 'conv00000030'
            THEN ts + INTERVAL 1 DAY ELSE ts END AS ts,
       authz
FROM ({DUCKDB_TRANSCRIPTS})
"""

_register(
    "ft_bm25_repair",
    _q_repair,
    f"""{SQL_PRELUDE.replace(DUCKDB_TRANSCRIPTS, _REPAIRED_TRANSCRIPTS)},
m AS (
  SELECT docint FROM post WHERE term IN ('merge','window')
  GROUP BY docint HAVING COUNT(DISTINCT term) = 2
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('merge','window') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, ROUND(ct.score, 4) AS score
FROM contrib ct
JOIN dl ON dl.docint = ct.docint
ORDER BY ct.score DESC LIMIT 10
""",
)


# -- snapshot time-travel over the store manifest (incremental.py) -----------


def _q_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over a HISTORICAL store snapshot: build on the first convs,
    snapshot, append the rest, then serve load(as_of=snapshot) — the
    Iceberg-style time-travel read over the manifest log
    (incremental.py snapshot_id/load). The oracle scores the same query
    over ONLY the prefix corpus, so a pass proves the snapshot read
    excludes post-snapshot appends with correct historical stats."""
    import tempfile

    from miru_spark.indexing.incremental import SegmentStore

    key = f"{id(spark)}:{sf_dir}:snapshot"
    if key not in _INCR_CACHE:
        turns = transcripts_from_documents(spark, sf_dir)
        store = SegmentStore(
            spark, tempfile.mkdtemp(prefix="miru_snap_"), n_shards=2
        )
        store.build(turns.where(F.col("conv_id") < "conv00000060"))
        snap = store.snapshot_id()
        store.append(turns)  # post-snapshot history
        idx = store.load(as_of=snap)
        idx.postings = idx.postings.cache()
        idx.terms = idx.terms.cache()
        _INCR_CACHE[key] = idx
    out = search(_INCR_CACHE[key], "window OR part", k=10)
    return out.select(
        "conv_id", "turn_idx", F.round("score", 4).alias("score")
    )


_SNAPSHOT_TRANSCRIPTS = (
    f"SELECT * FROM ({DUCKDB_TRANSCRIPTS}) WHERE conv_id < 'conv00000060'"
)

_register(
    "ft_bm25_snapshot",
    _q_snapshot,
    f"""{SQL_PRELUDE.replace(DUCKDB_TRANSCRIPTS, _SNAPSHOT_TRANSCRIPTS)},
m AS (SELECT DISTINCT docint FROM post WHERE term IN ('window','part')),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('window','part') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, ROUND(ct.score, 4) AS score
FROM contrib ct
JOIN dl ON dl.docint = ct.docint
ORDER BY ct.score DESC, ct.docint DESC LIMIT 10
""",
)


# -- hit-context fetch (query/context.py) -------------------------------------


def _q_ft_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with a rendered +/-1-turn conversation window per hit
    (query/context.py search_with_context — the RAG grounding fetch)."""
    from miru_spark.query.context import search_with_context

    out = search_with_context(
        _index_for(spark, sf_dir), "join OR window", k=10, before=1, after=1
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_context",
    _q_ft_context,
    f"""{SQL_PRELUDE},
m AS (SELECT DISTINCT docint FROM post WHERE term IN ('join','window')),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('join','window') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
),
topk AS (
  SELECT dl.conv_id, dl.turn_idx, m.docint,
         ROUND(COALESCE(ct.score, 0), 4) AS score
  FROM m
  LEFT JOIN contrib ct USING (docint)
  JOIN dl ON dl.docint = m.docint
  ORDER BY COALESCE(ct.score, 0) DESC, m.docint DESC
  LIMIT 10
)
SELECT tk.conv_id, tk.turn_idx, tk.docint, tk.score,
       string_agg(t.role || ': ' || t.text, chr(10) ORDER BY t.turn_idx)
         AS context
FROM topk tk
JOIN t ON t.conv_id = tk.conv_id
      AND t.turn_idx BETWEEN tk.turn_idx - 1 AND tk.turn_idx + 1
GROUP BY 1, 2, 3, 4
""",
)


# -- tokenizer vocabulary analytics (operators/textstats.py) -------------------


def _q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 vocabulary with cumulative corpus coverage
    (textstats.vocab_coverage — the tokenizer-sizing curve)."""
    from miru_spark.operators.textstats import vocab_coverage

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return vocab_coverage(d, top_v=100)


_register(
    "vocab_top_terms",
    _q_vocab_coverage,
    """
WITH tok AS (
  SELECT doc_id AS id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS term
  FROM documents
),
tf AS (SELECT term, COUNT(*) AS cf, COUNT(DISTINCT id) AS df FROM tok GROUP BY 1),
tot AS (SELECT SUM(cf)::DOUBLE AS t FROM tf),
top AS (
  SELECT term, cf, df, ROW_NUMBER() OVER (ORDER BY cf DESC, term ASC) AS rank
  FROM tf ORDER BY cf DESC, term ASC LIMIT 100
)
SELECT top.rank::INT AS rank, top.term, top.cf, top.df,
       ROUND(SUM(top.cf) OVER (ORDER BY top.rank) / tot.t, 6) AS coverage
FROM top CROSS JOIN tot
ORDER BY rank
""",
)


def _q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc OOV fraction against the corpus top-100 vocabulary
    (textstats.oov_rate — tokenizer-eval companion)."""
    from miru_spark.operators.textstats import oov_rate

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return oov_rate(d, top_v=100)


_register(
    "text_oov_rate",
    _q_oov_rate,
    """
WITH tok AS (
  SELECT doc_id AS id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS term
  FROM documents
),
tf AS (SELECT id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
vocab AS (
  SELECT term FROM (
    SELECT term, SUM(tf) AS cf FROM tf GROUP BY 1
    ORDER BY cf DESC, term ASC LIMIT 100
  )
),
pd AS (
  SELECT tf.id, SUM(tf.tf)::INT AS n_tokens,
         SUM(CASE WHEN v.term IS NULL THEN tf.tf ELSE 0 END)::INT AS n_oov
  FROM tf LEFT JOIN vocab v USING (term)
  GROUP BY 1
)
SELECT d.doc_id AS id,
       COALESCE(pd.n_tokens, 0) AS n_tokens,
       COALESCE(pd.n_oov, 0) AS n_oov,
       COALESCE(ROUND(pd.n_oov / NULLIF(pd.n_tokens::DOUBLE, 0), 6), 0.0)
         AS oov_rate
FROM documents d LEFT JOIN pd ON pd.id = d.doc_id
""",
)


# -- score explanation (query/explain.py) --------------------------------------


def _q_ft_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(hit, term) BM25 contribution breakdown for the top-10 of an
    AND query (query/explain.py — the Lucene Explanation parity)."""
    from miru_spark.query.explain import explain_scores

    out = explain_scores(_index_for(spark, sf_dir), "spark AND join", k=10)
    return out.select(
        "conv_id",
        "turn_idx",
        "docint",
        "term",
        "tf",
        "doclen",
        F.round("idf", 4).alias("idf"),
        F.round("contrib", 4).alias("contrib"),
        F.round("score", 4).alias("score"),
    )


_register(
    "ft_explain",
    _q_ft_explain,
    f"""{SQL_PRELUDE},
m AS (
  SELECT docint FROM post WHERE term IN ('spark','join')
  GROUP BY docint HAVING COUNT(DISTINCT term) = 2
),
ct AS (
  SELECT p.docint, p.term, p.tf, dl.doclen,
         ln(1 + (c.n_docs - s.df + 0.5) / (s.df + 0.5)) AS idf,
         {_BM25} AS contrib
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('spark','join') AND p.docint IN (SELECT docint FROM m)
),
topk AS (
  SELECT docint, SUM(contrib) AS score FROM ct
  GROUP BY 1 ORDER BY score DESC, docint DESC LIMIT 10
)
SELECT dl.conv_id, dl.turn_idx, ct.docint, ct.term, ct.tf, ct.doclen,
       ROUND(ct.idf, 4) AS idf, ROUND(ct.contrib, 4) AS contrib,
       ROUND(tk.score, 4) AS score
FROM topk tk
JOIN ct USING (docint)
JOIN dl ON dl.docint = ct.docint
""",
)


def _q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-length histogram over power-of-two buckets
    (textstats.length_histogram — the corpus-report length chart)."""
    from miru_spark.operators.textstats import length_histogram

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return length_histogram(d)


_register(
    "text_length_histogram",
    _q_length_histogram,
    """
WITH tok AS (
  SELECT doc_id AS id,
         len(regexp_extract_all(lower(text), '[a-z0-9'']+'))::INT AS n
  FROM documents
),
b AS (
  SELECT (CASE WHEN n <= 0 THEN -1 ELSE length(bin(n)) - 1 END)::INT AS bucket, n
  FROM tok
)
SELECT bucket,
       (CASE WHEN bucket < 0 THEN 0 ELSE 1::BIGINT << bucket END)::BIGINT AS lo,
       (CASE WHEN bucket < 0 THEN 0
             ELSE (1::BIGINT << (bucket + 1)) - 1 END)::BIGINT AS hi,
       COUNT(*) AS n_docs, SUM(n)::BIGINT AS n_tokens
FROM b GROUP BY 1, 2, 3 ORDER BY bucket
""",
)


# -- streaming waveform (streaming/ingest.py) ----------------------------------

_STREAM_SINK_SEQ = [0]


def _q_streaming_waveform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING waveform path under a hard oracle: the transcript
    corpus is written to a directory, drained through the Structured
    Streaming windowed term-count aggregation (streaming/ingest.py
    streaming_waveform, availableNow trigger, memory sink), and the
    drained result is compared against the batch time-bucket oracle —
    exactly-once file-source semantics make the streamed counts equal
    the batch GROUP BY."""
    import shutil
    import tempfile

    from miru_spark.streaming.ingest import streaming_waveform

    turns_dir = tempfile.mkdtemp(prefix="miru_stream_wf_")
    try:
        transcripts_from_documents(spark, sf_dir).write.mode(
            "overwrite"
        ).parquet(turns_dir)
        _STREAM_SINK_SEQ[0] += 1
        sink = f"wf_sink_{_STREAM_SINK_SEQ[0]}"
        wf = streaming_waveform(
            spark, turns_dir, window="1 hour", watermark="2 hours"
        )
        q = (
            wf.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.table(sink)
            .select("bucket_start", "term", "n")
            .orderBy("bucket_start", "term")
        )
        # materialize before the source directory disappears
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(turns_dir, ignore_errors=True)


_register(
    "streaming_waveform_counts",
    _q_streaming_waveform,
    f"""
WITH t AS ({DUCKDB_TRANSCRIPTS}),
tok AS (SELECT ts, unnest({_TOK}) AS term FROM t)
SELECT date_trunc('hour', ts) AS bucket_start, term, COUNT(*)::BIGINT AS n
FROM tok GROUP BY 1, 2
ORDER BY bucket_start, term
""",
)


def _q_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over a store populated ONLY by the Structured-Streaming sip
    tail (streaming/ingest.py stream_ingest): the corpus arrives as two
    file chunks drained by two availableNow runs sharing a checkpoint
    (exactly-once file discovery + the store's per-shard watermark), so
    the loaded index must equal a full batch build. Query terms differ
    from ft_bm25_incremental / sync_store for independent signal; output
    is id-space-neutral (conv_id, turn_idx, score) like those rows."""
    import shutil
    import tempfile

    from miru_spark.indexing.incremental import SegmentStore
    from miru_spark.streaming.ingest import stream_ingest

    turns = transcripts_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="miru_stream_sip_")
    try:
        src = f"{root}/incoming"
        ckpt = f"{root}/ckpt"
        store = SegmentStore(spark, f"{root}/seg", n_shards=2)
        turns.where(F.col("conv_id") < "conv00000050").write.mode(
            "append"
        ).parquet(src)
        q = stream_ingest(spark, src, store, ckpt)
        assert q.awaitTermination(300), "stream did not terminate"
        turns.where(F.col("conv_id") >= "conv00000050").write.mode(
            "append"
        ).parquet(src)
        q = stream_ingest(spark, src, store, ckpt)
        assert q.awaitTermination(300), "stream did not terminate"
        out = search(store.load(), "hash AND batch", k=10).select(
            "conv_id", "turn_idx", F.round("score", 4).alias("score")
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_register(
    "ft_bm25_stream_ingest",
    _q_stream_ingest,
    f"""{SQL_PRELUDE},
m AS (
  SELECT docint FROM post WHERE term IN ('hash','batch')
  GROUP BY docint HAVING COUNT(DISTINCT term) = 2
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('hash','batch') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, ROUND(ct.score, 4) AS score
FROM contrib ct
JOIN dl ON dl.docint = ct.docint
ORDER BY ct.score DESC LIMIT 10
""",
)


def _q_unread_inbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful inbox operator (streaming/unread.py,
    applyInPandasWithState) under a hard oracle: inbox events are
    derived deterministically from the events table (click/purchase/
    signup → msg, view → read, error → mark_all_read; msg_id =
    event_id), drained in ONE availableNow batch so each key folds its
    full (ts, msg_id)-ordered history, and the final per-(user, stream)
    state is compared to the batch SQL equivalent — reads and
    mark-all-reads only ever raise the watermark, so the sequential
    fold equals a max over per-event contributions (the run_max window
    in the oracle)."""
    import shutil
    import tempfile

    from miru_spark.streaming.unread import unread_counts

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.concat(F.lit("s"), (F.col("event_id") % 3).cast("string")).alias(
                "stream_id"
            ),
            "user_id",
            F.when(F.col("event_type") == "view", "read")
            .when(F.col("event_type") == "error", "mark_all_read")
            .otherwise("msg")
            .alias("kind"),
            F.col("event_id").alias("msg_id"),
            "ts",
        )
    )
    root = tempfile.mkdtemp(prefix="miru_unread_")
    try:
        ev.coalesce(1).write.mode("overwrite").parquet(root)
        src = spark.readStream.schema(ev.schema).parquet(root)
        _STREAM_SINK_SEQ[0] += 1
        sink = f"unread_sink_{_STREAM_SINK_SEQ[0]}"
        q = (
            unread_counts(src)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not terminate"
        out = spark.table(sink).select(
            "user_id", "stream_id", "n_msgs", "unread", "last_read"
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_register(
    "streaming_unread_inbox",
    _q_unread_inbox,
    """
WITH ev AS (
  SELECT 's' || (event_id % 3) AS stream_id, user_id,
         CASE event_type WHEN 'view' THEN 'read'
                         WHEN 'error' THEN 'mark_all_read'
                         ELSE 'msg' END AS kind,
         event_id AS msg_id, ts
  FROM events
),
seq AS (
  SELECT *, MAX(CASE WHEN kind = 'msg' THEN msg_id END)
            OVER (PARTITION BY user_id, stream_id ORDER BY ts, msg_id
                  ROWS UNBOUNDED PRECEDING) AS run_max
  FROM ev
),
agg AS (
  SELECT user_id, stream_id,
         COUNT(CASE WHEN kind = 'msg' THEN 1 END)::INT AS n_msgs,
         GREATEST(
           COALESCE(MAX(CASE WHEN kind = 'read' THEN msg_id END), -1),
           COALESCE(MAX(CASE WHEN kind = 'mark_all_read' THEN run_max END), -1)
         )::BIGINT AS last_read
  FROM seq GROUP BY 1, 2
)
SELECT a.user_id, a.stream_id, a.n_msgs,
       COALESCE(SUM(CASE WHEN e.kind = 'msg' AND e.msg_id > a.last_read
                         THEN 1 END), 0)::INT AS unread,
       a.last_read
FROM agg a
LEFT JOIN ev e ON e.user_id = a.user_id AND e.stream_id = a.stream_id
GROUP BY 1, 2, 3, 5
""",
)


def _q_delivery_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realtime push delivery (streaming/delivery.py — the reference's
    RoutingBirdRealtimeDelivery: ingested activities matched against
    registered endpoints with a staleness cutoff) under a hard oracle:
    the corpus is drained through deliver_stream in ONE availableNow
    batch (single input file ⇒ the per-batch staleness cutoff equals the
    global max(ts) − interval, which pure SQL can replay), and the
    per-subscription delivery log is compared to the same predicates as
    WHERE clauses. Covers token-AND, field+token, and OR subscriptions
    plus the dropRealtimeDeliveryOlderThanNMillis cutoff."""
    import shutil
    import tempfile

    from miru_spark.streaming.delivery import deliver_stream

    subs = [
        ("s_sparkjoin", "spark AND join"),
        ("s_asst_merge", "role:assistant AND merge"),
        ("s_winpart", "window OR part"),
    ]
    root = tempfile.mkdtemp(prefix="miru_delivery_")
    try:
        src, out_dir, ckpt = f"{root}/in", f"{root}/log", f"{root}/ckpt"
        transcripts_from_documents(spark, sf_dir).coalesce(1).write.mode(
            "overwrite"
        ).parquet(src)
        q = deliver_stream(
            spark, src, subs, out_dir, ckpt, drop_older_than="48 HOURS"
        )
        assert q.awaitTermination(300), "stream did not terminate"
        out = spark.read.parquet(out_dir).select(
            "sub_id", "conv_id", "turn_idx", "ts"
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_register(
    "delivery_log",
    _q_delivery_log,
    f"""
WITH t AS ({DUCKDB_TRANSCRIPTS}),
b AS (
  SELECT *, {_TOK} AS toks FROM t
  WHERE ts >= (SELECT MAX(ts) - INTERVAL 48 HOUR FROM t)
)
SELECT 's_sparkjoin' AS sub_id, conv_id, turn_idx, ts FROM b
 WHERE list_contains(toks, 'spark') AND list_contains(toks, 'join')
UNION ALL
SELECT 's_asst_merge' AS sub_id, conv_id, turn_idx, ts FROM b
 WHERE role = 'assistant' AND list_contains(toks, 'merge')
UNION ALL
SELECT 's_winpart' AS sub_id, conv_id, turn_idx, ts FROM b
 WHERE list_contains(toks, 'window') OR list_contains(toks, 'part')
""",
)


def _q_min_should_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minimum_should_match: top-10 docs matching >= 2 of 4 OR'd terms
    (query/bm25.py search_min_should_match — Lucene
    BooleanQuery.setMinimumNumberShouldMatch)."""
    from miru_spark.query.bm25 import search_min_should_match

    out = search_min_should_match(
        _index_for(spark, sf_dir), "spark OR join OR merge OR hash", m=2, k=10
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_min_should_match",
    _q_min_should_match,
    _bm25_sql(
        "SELECT docint FROM post WHERE term IN ('spark','join','merge','hash') "
        "GROUP BY docint HAVING COUNT(DISTINCT term) >= 2",
        "p.term IN ('spark','join','merge','hash')",
        10,
    ),
)


def _q_msm_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minimum_should_match with a GROUPED clause: ``spark OR (join OR
    merge) OR hash`` at m=2 — the parenthesized group counts as ONE
    SHOULD clause toward m, present when ANY member term is (Lucene
    BooleanQuery counts clauses, not the terms a synonym expansion or
    multi-term rewrite put inside one; query/bm25.py
    search_min_should_match clause decomposition)."""
    from miru_spark.query.bm25 import search_min_should_match

    out = search_min_should_match(
        _index_for(spark, sf_dir),
        "spark OR (join OR merge) OR hash",
        m=2,
        k=10,
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_msm_clause",
    _q_msm_clause,
    _bm25_sql(
        "SELECT docint FROM post WHERE term IN ('spark','join','merge','hash') "
        "GROUP BY docint HAVING ("
        "MAX(CASE WHEN term = 'spark' THEN 1 ELSE 0 END)"
        " + MAX(CASE WHEN term IN ('join','merge') THEN 1 ELSE 0 END)"
        " + MAX(CASE WHEN term = 'hash' THEN 1 ELSE 0 END)) >= 2",
        "p.term IN ('spark','join','merge','hash')",
        10,
    ),
)


def _q_dismax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DisjunctionMax scoring (max + 0.3·rest) over four OR'd terms
    (query/bm25.py search_dismax — Lucene DisjunctionMaxQuery)."""
    from miru_spark.query.bm25 import search_dismax

    out = search_dismax(
        _index_for(spark, sf_dir),
        "spark OR join OR merge OR hash",
        tie_breaker=0.3,
        k=10,
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_dismax",
    _q_dismax,
    f"""{SQL_PRELUDE},
ct AS (
  SELECT p.docint, {_BM25} AS contrib
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('spark','join','merge','hash')
),
agg AS (
  SELECT docint,
         MAX(contrib) + 0.3 * (SUM(contrib) - MAX(contrib)) AS score
  FROM ct GROUP BY 1
),
topk AS (
  SELECT docint, score FROM agg ORDER BY score DESC, docint DESC LIMIT 10
)
SELECT dl.conv_id, dl.turn_idx, tk.docint, ROUND(tk.score, 4) AS score
FROM topk tk JOIN dl ON dl.docint = tk.docint
ORDER BY tk.score DESC, tk.docint DESC
""",
)


def _q_batch_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched serving: three queries (AND / OR / AND-NOT) through ONE
    shared postings scan + one (query_id, docint) aggregation
    (query/batch.py search_batch — the Spark-native amortization of the
    reference's long-lived per-partition readers). Per-query results are
    rank-identical to the single-query engine."""
    from miru_spark.query.batch import search_batch

    out = search_batch(
        _index_for(spark, sf_dir),
        [
            ("b1", "spark AND join", 5),
            ("b2", "merge OR hash", 5),
            ("b3", "spark AND NOT join", 5),
        ],
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_batch",
    _q_batch_serve,
    f"""{SQL_PRELUDE},
w AS (
  SELECT p.docint, p.term, {_BM25} AS w
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('spark', 'join', 'merge', 'hash')
),
q1 AS (
  SELECT 'b1' AS query_id, docint, SUM(w) AS score
  FROM w WHERE term IN ('spark', 'join') GROUP BY docint
  HAVING COUNT(DISTINCT term) = 2
  ORDER BY score DESC, docint DESC LIMIT 5
),
q2 AS (
  SELECT 'b2' AS query_id, docint, SUM(w) AS score
  FROM w WHERE term IN ('merge', 'hash') GROUP BY docint
  ORDER BY score DESC, docint DESC LIMIT 5
),
q3 AS (
  SELECT 'b3' AS query_id, docint,
         SUM(CASE WHEN term = 'spark' THEN w END) AS score
  FROM w WHERE term IN ('spark', 'join') GROUP BY docint
  HAVING MAX(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) = 1
     AND MAX(CASE WHEN term = 'join' THEN 1 ELSE 0 END) = 0
  ORDER BY score DESC, docint DESC LIMIT 5
),
u AS (
  SELECT * FROM q1 UNION ALL SELECT * FROM q2 UNION ALL SELECT * FROM q3
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, docint DESC) AS rank
  FROM u
)
SELECT r.query_id, dl.conv_id, dl.turn_idx, r.docint,
       ROUND(r.score, 4) AS score, r.rank::INT AS rank
FROM r JOIN dl ON dl.docint = r.docint
ORDER BY r.query_id, r.rank
""",
)


def _q_batch_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched serving with per-query scoring variants: a DisjunctionMax
    query (max clause + tie x the rest) and a minimum-should-match
    query (2-of-3 SHOULD clauses) ride the SAME shared postings scan as
    a plain AND — dismax adds a max to the shared aggregation, msm
    raises the presence threshold; no extra scan or shuffle. Each
    result is identical to its single-query engine
    (bm25.search_dismax / search_min_should_match)."""
    from miru_spark.query.batch import search_batch

    out = search_batch(
        _index_for(spark, sf_dir),
        [
            ("x1", "spark OR merge", 5, {"tie": 0.3}),
            ("x2", "spark hash join", 5, {"min_should_match": 2}),
            ("x3", "spark AND join", 5),
        ],
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_batch_mixed",
    _q_batch_mixed,
    f"""{SQL_PRELUDE},
w AS (
  SELECT p.docint, p.term, {_BM25} AS w
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('spark', 'merge', 'hash', 'join')
),
q1 AS (
  SELECT 'x1' AS query_id, docint,
         MAX(w) + 0.3 * (SUM(w) - MAX(w)) AS score
  FROM w WHERE term IN ('spark', 'merge') GROUP BY docint
  ORDER BY score DESC, docint DESC LIMIT 5
),
q2 AS (
  SELECT 'x2' AS query_id, docint, SUM(w) AS score
  FROM w WHERE term IN ('spark', 'hash', 'join') GROUP BY docint
  HAVING COUNT(DISTINCT term) >= 2
  ORDER BY score DESC, docint DESC LIMIT 5
),
q3 AS (
  SELECT 'x3' AS query_id, docint, SUM(w) AS score
  FROM w WHERE term IN ('spark', 'join') GROUP BY docint
  HAVING COUNT(DISTINCT term) = 2
  ORDER BY score DESC, docint DESC LIMIT 5
),
u AS (
  SELECT * FROM q1 UNION ALL SELECT * FROM q2 UNION ALL SELECT * FROM q3
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, docint DESC) AS rank
  FROM u
)
SELECT r.query_id, dl.conv_id, dl.turn_idx, r.docint,
       ROUND(r.score, 4) AS score, r.rank::INT AS rank
FROM r JOIN dl ON dl.docint = r.docint
ORDER BY r.query_id, r.rank
""",
)


def _q_sync_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse (backfill) sync cursor (MiruSyncSender.java:74-112
    forward+reverse progress pair, :530-565 reverse traversal): the
    sender is created against a source that ALREADY has two
    generations of history; forward rounds ship only data appended
    after the relationship started, reverse rounds backfill the
    historical units newest-first through the key-dedupe repair path.
    BM25 over the destination must equal the full-corpus oracle —
    proving forward+reverse covered everything exactly once."""
    import tempfile

    from miru_spark.indexing.incremental import SegmentStore
    from miru_spark.indexing.sync import SyncSender

    key = f"{id(spark)}:{sf_dir}:sync_rev"
    if key not in _INCR_CACHE:
        turns = transcripts_from_documents(spark, sf_dir)
        src = SegmentStore(spark, tempfile.mkdtemp(prefix="miru_revsrc_"), n_shards=2)
        dest = SegmentStore(spark, tempfile.mkdtemp(prefix="miru_revdst_"), n_shards=3)
        src.build(turns.where(F.col("conv_id") < "conv00000030"))
        src.append(
            turns.where(
                (F.col("conv_id") >= "conv00000030")
                & (F.col("conv_id") < "conv00000060")
            )
        )
        sender = SyncSender(src, dest)
        sender.init_reverse()  # history -> the reverse walker
        src.append(turns)  # new data arrives after the relationship
        sender.sync()  # forward ships ONLY the new units
        while sender.reverse_pending():  # backfill newest-first
            sender.sync_reverse(batch=2)
        idx = dest.load()
        idx.postings = idx.postings.cache()
        idx.terms = idx.terms.cache()
        _INCR_CACHE[key] = idx
    out = search(_INCR_CACHE[key], "stream AND filter", k=10)
    return out.select(
        "conv_id", "turn_idx", F.round("score", 4).alias("score")
    )


_register(
    "ft_bm25_sync_reverse",
    _q_sync_reverse,
    f"""{SQL_PRELUDE},
m AS (
  SELECT docint FROM post WHERE term IN ('stream','filter')
  GROUP BY docint HAVING COUNT(DISTINCT term) = 2
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('stream','filter') AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, ROUND(ct.score, 4) AS score
FROM contrib ct
JOIN dl ON dl.docint = ct.docint
ORDER BY ct.score DESC LIMIT 10
""",
)


def _q_batch_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched serving with an exact phrase in the batch: the phrase's
    (term, offset) leaves ride a shared positions scan (explode of
    shift-normalized starts + one count-distinct groupBy — the batched
    twin of phrase_match_docs), a plain AND rides the shared term scan;
    both rank-identical to their single-query engines
    (query/batch.py search_batch phrase block)."""
    from miru_spark.query.batch import search_batch

    out = search_batch(
        _index_for(spark, sf_dir, positions=True),
        [
            ("p1", '"the fast"', 5),
            ("a1", "spark AND join", 5),
        ],
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_batch_phrase",
    _q_batch_phrase,
    f"""{SQL_PRELUDE},
w AS (
  SELECT p.docint, p.term, {_BM25} AS w
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('the', 'fast', 'spark', 'join')
),
m AS (
  SELECT docint FROM d
  WHERE ' ' || array_to_string({_TOK}, ' ') || ' ' LIKE '% the fast %'
),
p1 AS (
  SELECT 'p1' AS query_id, docint, SUM(w) AS score
  FROM w WHERE term IN ('the', 'fast') AND docint IN (SELECT docint FROM m)
  GROUP BY docint
  ORDER BY score DESC, docint DESC LIMIT 5
),
a1 AS (
  SELECT 'a1' AS query_id, docint, SUM(w) AS score
  FROM w WHERE term IN ('spark', 'join') GROUP BY docint
  HAVING COUNT(DISTINCT term) = 2
  ORDER BY score DESC, docint DESC LIMIT 5
),
u AS (SELECT * FROM p1 UNION ALL SELECT * FROM a1),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, docint DESC) AS rank
  FROM u
)
SELECT r.query_id, dl.conv_id, dl.turn_idx, r.docint,
       ROUND(r.score, 4) AS score, r.rank::INT AS rank
FROM r JOIN dl ON dl.docint = r.docint
ORDER BY r.query_id, r.rank
""",
)


def _q_batch_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched serving with the final two fallback classes batched
    (round 5): an ordered-proximity query ('"the fast"~2') rides the
    shared positions scan with the greedy ordered chain evaluated as
    one F.aggregate fold per candidate (the batched twin of
    phrase.proximity_match_docs), and an OR-over-metadata query
    ('spark OR role:assistant') rides the shared term scan with its
    metadata disjunct evaluated in the shared mask docs scan, whose
    pairs union in as 0.0-score candidates. A plain AND shares both
    scans. Each result is rank-identical to its single-query engine."""
    from miru_spark.query.batch import search_batch

    out = search_batch(
        _index_for(spark, sf_dir, positions=True),
        [
            ("s1", '"the fast"~2', 5),
            ("s2", "spark OR role:assistant", 5),
            ("a1", "merge AND hash", 5),
        ],
    )
    return out.withColumn("score", F.round("score", 4))


_register(
    "ft_bm25_batch_slop",
    _q_batch_slop,
    f"""{SQL_PRELUDE},
w AS (
  SELECT p.docint, p.term, {_BM25} AS w
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ('the', 'fast', 'spark', 'merge', 'hash')
),
m1 AS (
  SELECT d.docint FROM d
  WHERE len(list_filter(
      list_filter(range(len({_TOK})), i -> ({_TOK})[i+1] = 'the'),
      a -> len(list_filter(range(len({_TOK})),
               b -> ({_TOK})[b+1] = 'fast' AND b > a AND b - a <= 3)) > 0)) > 0
),
q1 AS (
  SELECT 's1' AS query_id, docint, SUM(w) AS score
  FROM w WHERE term IN ('the', 'fast') AND docint IN (SELECT docint FROM m1)
  GROUP BY docint
  ORDER BY score DESC, docint DESC LIMIT 5
),
m2 AS (
  SELECT docint FROM post WHERE term = 'spark'
  UNION
  SELECT docint FROM dl WHERE role = 'assistant'
),
c2 AS (
  SELECT docint, SUM(w) AS score FROM w WHERE term = 'spark' GROUP BY docint
),
q2 AS (
  SELECT 's2' AS query_id, m2.docint, COALESCE(c2.score, 0) AS score
  FROM m2 LEFT JOIN c2 USING (docint)
  ORDER BY COALESCE(c2.score, 0) DESC, m2.docint DESC LIMIT 5
),
q3 AS (
  SELECT 'a1' AS query_id, docint, SUM(w) AS score
  FROM w WHERE term IN ('merge', 'hash') GROUP BY docint
  HAVING COUNT(DISTINCT term) = 2
  ORDER BY score DESC, docint DESC LIMIT 5
),
u AS (
  SELECT * FROM q1 UNION ALL SELECT * FROM q2 UNION ALL SELECT * FROM q3
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, docint DESC) AS rank
  FROM u
)
SELECT r.query_id, dl.conv_id, dl.turn_idx, r.docint,
       ROUND(r.score, 4) AS score, r.rank::INT AS rank
FROM r JOIN dl ON dl.docint = r.docint
ORDER BY r.query_id, r.rank
""",
)


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-ordering conversion funnel over the event stream: per
    user, the earliest view, the earliest click AFTER that view, the
    earliest purchase AFTER that click — per-stage user counts. The
    ordering constraint is what separates a funnel from three
    independent counts (a click before any view does not convert).

    Scale: three per-user MIN aggregations chained by broadcast-sized
    per-user timestamps — each stage is one groupBy(user_id) with
    map-side combine over a filtered scan; no windows, no per-user
    sequence materialization."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = (
        v.select(F.lit(1).alias("stage"), F.lit("view").alias("event"), "user_id")
        .unionByName(
            c.select(
                F.lit(2).alias("stage"), F.lit("click").alias("event"), "user_id"
            )
        )
        .unionByName(
            p.select(
                F.lit(3).alias("stage"),
                F.lit("purchase").alias("event"),
                "user_id",
            )
        )
    )
    return (
        rows.groupBy("stage", "event")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("stage")
    )


_register(
    "funnel_events",
    _q_funnel,
    """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
)
SELECT 1 AS stage, 'view' AS event, COUNT(*)::BIGINT AS n_users FROM v
UNION ALL
SELECT 2, 'click', COUNT(*)::BIGINT FROM c
UNION ALL
SELECT 3, 'purchase', COUNT(*)::BIGINT FROM p
ORDER BY stage
""",
)


def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the event stream: users grouped by
    first-activity week, counted in each later week they return.
    Week buckets are floor(days-since-epoch-date / 7) in BOTH engines —
    the oracle uses an explicit floor() because DuckDB's ``//``
    truncates toward zero, which diverges from floor for any event
    before the 2024-01-01 epoch date (-3 // 7 = 0 vs floor = -1).

    Scale: one groupBy(user) for the cohort week, one distinct
    (user, week) projection, one broadcast-sized join back — shuffle
    keys are the uniform user id, output is cohorts × offsets."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            / 7
        )
        .cast("int")
        .alias("week"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(cohort, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


_register(
    "retention_cohorts",
    _q_retention,
    """
WITH ev AS (
  SELECT DISTINCT user_id,
         CAST(floor(datediff('day', DATE '2024-01-01', ts::DATE) / 7.0) AS INT) AS week
  FROM events
),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1)
SELECT c.cohort_week, (e.week - c.cohort_week)::INT AS week_offset,
       COUNT(DISTINCT e.user_id)::BIGINT AS n_users
FROM ev e JOIN cohort c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
)


# Inline multilingual corpus for analyze_breadth: one deterministic
# sentence per reference locale key (TermAnalyzers.java:53-99), with
# inflected forms that exercise each locale's stemmer and mixed-case /
# region-variant locale codes that exercise findAnalyzer's prefix walk.
# No apostrophes (rows are embedded as SQL literals in the oracle twin).
_BREADTH_ROWS: tuple[tuple[str, str], ...] = (
    ("en", "The quick brown foxes jump over the lazy dogs"),
    ("en_IE", "Irish english maps to the english stemmer holidays"),
    ("fr", "Les renards bruns rapides sautent sur les chiens dans les maisons"),
    ("de", "Die schnellen braunen Füchse springen über die faulen Hunde"),
    ("es", "Los zorros marrones rápidos saltan sobre los perros perezosos"),
    ("it", "Le volpi marroni veloci saltano sopra i cani pigri"),
    ("pt", "As raposas castanhas rápidas saltam sobre os cães preguiçosos"),
    ("pt_BR", "As raposas brasileiras saltam sobre os meses alugadas"),
    ("nl", "De snelle bruine vossen springen over de luie honden en huisjes"),
    ("da", "De hurtige brune ræve springer over de dovne hundene i husene"),
    ("sv", "De snabba bruna rävarna hoppar över de lata hundarna i husen"),
    ("nb", "De raske brune revene hopper over de late hundene i husene"),
    ("nn", "Dei raske brune revane hoppar over dei late hundane"),
    ("ro", "Vulpile maro rapide sar peste câinii leneși prin orașele mari"),
    ("ca", "Les guineus marrons ràpides salten sobre els gossos mandrosos"),
    ("gl", "Os raposos marróns rápidos saltan sobre os cans preguiceiros"),
    ("id", "Rubah coklat cepat melompatkah anjingnya pemalasku pun"),
    ("eu", "Azeri arinak txakur alferren gainetik jauzi egiten dute mendietan"),
    ("fi", "Nopeat ruskeat ketut hyppäävät laiskojen koirien yli taloissa"),
    ("cs", "Rychlé hnědé lišky skáčou přes líné psy ve velkých městech"),
    ("lv", "Ātrās brūnās lapsas lec pāri slinkiem suņiem lielajās pilsētās"),
    ("tr", "Hızlı kahverengi tilkiler tembel köpeklerin üzerinden atlarlar"),
    ("ru", "Быстрые коричневые лисы прыгают через ленивых собак в городах"),
    ("bg", "Бързите кафяви лисици скачат през мързеливите кучета в градовете"),
    ("gr", "Οι γρήγορες καφέ αλεπούδες πηδούν πάνω από τεμπέληδες σκύλους"),
    ("hi", "तेज़ भूरी लोमड़ियों ने आलसी कुत्तों के ऊपर छलांग लगाई"),
    ("hy", "Արագ շագանակագույն աղվեսները ցատկում են ծույլ շների վրայով"),
    ("ar", "الثعالبُ البنيةُ السريعةُ تقفزُ فوقَ الكلابِ الكسولةِ في المدينة"),
    ("fa", "روباه‌های قهوه‌ای سریع از روی سگ‌های تنبل می‌پرند در شهرها"),
    ("ku", "روباه‌های سۆرانی در شهرها"),
    ("th", "สุนัขจิ้งจอกสีน้ำตาลกระโดดข้าม fast dogs"),
    ("zh", "快速的棕色狐狸跳过懒狗 spark joins"),
    ("ja", "素早い茶色の狐が怠け者の犬を飛び越える"),
    ("ko", "빠른 갈색 여우가 게으른 개를 뛰어넘는다"),
)


def _q_analyze_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-registry per-locale analysis (TermAnalyzers.java:53-99):
    every reference locale key analyzed by the analyzer it resolves to
    via analyzer_for_locale (incl. the prefix walk for en_IE/pt_BR and
    the shared nb/nn→no and ku→fa mappings), over an inline
    deterministic corpus — the sf fixture only carries 5 langs, so
    breadth is proven on embedded rows identical in both engines.
    Output is (locale, pos, token): pos pins token ORDER into the value
    hash, so the oracle proves tokenization, normalization chains
    (Greek ς→σ, Turkish dot-strip, Arabic tashkeel/alef folding), and
    longest-suffix stemming end-to-end for all 34 locale keys."""
    from miru_spark.analyzers import analyze_col, analyzer_for_locale

    df = spark.createDataFrame(list(_BREADTH_ROWS), "locale string, text string")
    expr = None
    for loc in sorted({r[0] for r in _BREADTH_ROWS}):
        toks = analyze_col(F.col("text"), analyzer_for_locale(loc))
        expr = (
            F.when(F.col("locale") == loc, toks)
            if expr is None
            else expr.when(F.col("locale") == loc, toks)
        )
    return df.select(
        "locale", F.posexplode(expr).alias("pos", "token")
    ).select("locale", F.col("pos").cast("int").alias("pos"), "token")


def _analyze_breadth_sql() -> str:
    from miru_spark.analyzers import analyzer_for_locale, duckdb_analyze

    values = ",\n    ".join(
        f"('{loc}', '{text}')" for loc, text in _BREADTH_ROWS
    )
    cases = "\n         ".join(
        f"WHEN locale = '{loc}' THEN "
        + duckdb_analyze("text", analyzer_for_locale(loc))
        for loc in sorted({r[0] for r in _BREADTH_ROWS})
    )
    return f"""
WITH corpus(locale, text) AS (
  VALUES
    {values}
),
analyzed AS (
  SELECT locale,
         CASE {cases} END AS toks
  FROM corpus
)
SELECT locale,
       (generate_subscripts(toks, 1) - 1)::INT AS pos,
       unnest(toks) AS token
FROM analyzed
"""


_register("analyze_breadth", _q_analyze_breadth, _analyze_breadth_sql())


# Inline Cyrillic corpus for ft_bm25_ru: mixed-script transcripts (code
# identifiers inside Russian prose) with inflection pairs (лисы/лиса,
# быстрые/быстро) that only match through the ru stemmer.
_RU_ROWS: tuple[tuple[str, int, str, str, int], ...] = (
    ("r1", 0, "user", "Быстрые лисы используют spark запросы", 1000),
    ("r1", 1, "assistant", "лиса прыгает через ленивую собаку", 2000),
    ("r2", 0, "user", "spark joins и окна в запросах", 3000),
    ("r2", 1, "user", "собаки спят а лисы прыгают быстро", 4000),
    ("r3", 0, "assistant", "медленные черепахи не используют индексы", 5000),
    ("r3", 1, "user", "быстрый индекс для быстрых запросов", 6000),
)


def _q_ft_bm25_ru(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-script BM25 end-to-end: a ru-analyzed index over an inline
    Cyrillic+latin corpus, searched with an INFLECTED Cyrillic query
    ('лисы быстрые' — the postings hold the stems лис/быстр). Proves the
    analyzer is threaded through build AND the script-aware query parse
    (a ru term is invisible to the latin LogMill pre-tokenizer), with
    rank order + scores hash-checked against a DuckDB twin that replays
    the same analysis chain and BM25 formula. Reference:
    TermAnalyzers.findAnalyzer + TermTokenizer.java:34-54."""
    from miru_spark.index import InvertedIndex

    df = spark.createDataFrame(
        [(c, i, r, t, None, ts) for c, i, r, t, ts in _RU_ROWS],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts long",
    )
    idx = InvertedIndex.build(df, positions=False, analyzer="ru")
    out = search(idx, "лисы AND быстрые", k=5)
    return out.withColumn("score", F.round("score", 4))


def _ft_bm25_ru_sql() -> str:
    from miru_spark.analyzers import analyze_py, duckdb_analyze

    stems = analyze_py("лисы быстрые", "ru")
    values = ",\n    ".join(
        f"('{c}', {i}, '{t}')" for c, i, _r, t, _ts in _RU_ROWS
    )
    arr = duckdb_analyze("text", "ru")
    in_list = ", ".join(f"'{s}'" for s in stems)
    return f"""
WITH t(conv_id, turn_idx, text) AS (
  VALUES
    {values}
),
d AS (
  SELECT t.*, (COALESCE(o.off, 0) + t.turn_idx)::BIGINT AS docint
  FROM t
  JOIN (
    SELECT conv_id,
           SUM(n) OVER (ORDER BY conv_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off
    FROM (SELECT conv_id, COUNT(*) AS n FROM t GROUP BY conv_id)
  ) o USING (conv_id)
),
ana AS (
  SELECT docint, conv_id, turn_idx, {arr} AS toks FROM d
),
dl AS (
  SELECT docint, conv_id, turn_idx, len(toks)::INT AS doclen FROM ana
),
tok AS (
  SELECT docint, unnest(toks) AS term FROM ana
),
post AS (
  SELECT term, docint, COUNT(*)::INT AS tf FROM tok GROUP BY 1, 2
),
stats AS (
  SELECT term, COUNT(*)::BIGINT AS df FROM post GROUP BY 1
),
corpus AS (
  SELECT COUNT(*)::BIGINT AS n_docs, AVG(doclen) AS avgdl FROM dl
),
m AS (
  SELECT docint FROM post WHERE term IN ({in_list})
  GROUP BY 1 HAVING COUNT(DISTINCT term) = {len(stems)}
),
contrib AS (
  SELECT p.docint, SUM({_BM25}) AS score
  FROM post p
  JOIN stats s USING (term)
  JOIN dl ON dl.docint = p.docint
  CROSS JOIN corpus c
  WHERE p.term IN ({in_list}) AND p.docint IN (SELECT docint FROM m)
  GROUP BY 1
)
SELECT dl.conv_id, dl.turn_idx, m.docint,
       ROUND(COALESCE(ct.score, 0), 4) AS score
FROM m
LEFT JOIN contrib ct USING (docint)
JOIN dl ON dl.docint = m.docint
ORDER BY COALESCE(ct.score, 0) DESC, m.docint DESC
LIMIT 5
"""


_register("ft_bm25_ru", _q_ft_bm25_ru, _ft_bm25_ru_sql())
