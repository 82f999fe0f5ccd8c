"""SQL API over the registered index views — same engine, SQL surface."""

from miru_spark.index import InvertedIndex
from miru_spark.oracle import PandasIndex
from miru_spark.query.bm25 import search


def test_sql_bm25_matches_dataframe_engine(spark, small_turns, small_pdf):
    idx = InvertedIndex.build(small_turns)
    views = idx.register_views("t")
    assert set(views) == {"t_postings", "t_docs", "t_terms"}
    n, avgdl = idx.n_docs, idx.avg_doclen
    got = spark.sql(f"""
        WITH q AS (
          SELECT term, ln(1 + ({n} - df + 0.5) / (df + 0.5)) AS idf
          FROM t_terms WHERE term IN ('w00001', 'w00004')
        ),
        m AS (
          SELECT docint FROM t_postings WHERE term IN ('w00001', 'w00004')
          GROUP BY docint HAVING count(DISTINCT term) = 2
        ),
        s AS (
          SELECT p.docint,
                 sum(q.idf * p.tf * 2.2 /
                     (p.tf + 1.2 * (0.25 + 0.75 * p.doclen / {avgdl}))) AS score
          FROM t_postings p JOIN q USING (term)
          WHERE p.docint IN (SELECT docint FROM m)
          GROUP BY p.docint
        )
        SELECT d.conv_id, d.turn_idx, s.docint, s.score
        FROM s JOIN t_docs d USING (docint)
        ORDER BY s.score DESC, s.docint DESC LIMIT 10
    """).toPandas()
    exp = search(idx, "w00001 AND w00004", k=10).toPandas()
    assert list(got["docint"]) == list(exp["docint"])
    oracle = PandasIndex(small_pdf).search("w00001 AND w00004", k=10)
    assert list(got["docint"]) == list(oracle["docint"])
    idx.unpersist()
