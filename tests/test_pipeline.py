"""End-to-end training-data pipeline (miru_spark/pipeline.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_pipeline_invariants(documents):
    """Stage counts are monotone, survivors are unique, every survivor
    gets exactly one split, and each split's packing is a clean prefix
    sum from offset 0."""
    from miru_spark.pipeline import prepare_training_data

    packed, m = prepare_training_data(documents, collect_metrics=True)
    assert (
        m["docs_in"]
        >= m["docs_after_quality"]
        >= m["docs_after_exact_dedup"]
        >= m["docs_after_near_dedup"]
        > 0
    )
    pdf = packed.toPandas()
    assert len(pdf) == m["docs_after_near_dedup"]
    assert pdf["id"].is_unique
    assert set(pdf["split"]) <= {"train", "val", "test"}
    assert sum(m["splits"].values()) == len(pdf)
    for _, sub in pdf.groupby("split"):
        sub = sub.sort_values("id")
        starts = sub["n_tokens"].cumsum().shift(1, fill_value=0).astype("int64")
        assert sub["start"].tolist() == starts.tolist()
        assert sub["start"].iloc[0] == 0


def test_pipeline_deterministic(documents, spark):
    """Same input + params -> byte-identical output across runs and
    shuffle-partition settings (the reproducibility contract)."""
    from miru_spark.pipeline import prepare_training_data

    a, _ = prepare_training_data(documents)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b, _ = prepare_training_data(documents)
        bp = b.toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    ap = a.toPandas()
    cols = ["split", "id", "n_tokens", "start", "seq_id", "seq_off", "seq_last"]
    ap = ap[cols].sort_values(["split", "id"]).reset_index(drop=True)
    bp = bp[cols].sort_values(["split", "id"]).reset_index(drop=True)
    assert ap.equals(bp)


def test_pipeline_drops_injected_duplicates(documents, spark):
    """Injecting a near-copy of an existing doc (new id) must not grow
    the survivor set: the copy clusters with its source and only the
    canonical (lower id) survives."""
    from miru_spark.pipeline import prepare_training_data

    base, _ = prepare_training_data(documents)
    n_base = base.count()
    src = documents.orderBy("doc_id").limit(1).collect()[0]
    clone = spark.createDataFrame(
        [(10_000_000, src["text"], src["lang"], src["source"], src["n_chars"])],
        documents.schema,
    )
    grown, _ = prepare_training_data(documents.unionByName(clone))
    assert grown.count() == n_base
    assert grown.where(F.col("id") == 10_000_000).count() == 0


def test_pipeline_decontam_stage(documents):
    """With a bench set, survivors sharing an n-gram with it are gone;
    without one, the pipeline is unchanged. The bench docs themselves
    are never in the training input."""
    from miru_spark.operators.textstats import decontaminate
    from miru_spark.pipeline import prepare_training_data

    train = documents.where(F.col("doc_id") % 20 != 0)
    bench = documents.where(F.col("doc_id") % 20 == 0)
    base, _ = prepare_training_data(train)
    clean, m = prepare_training_data(
        train, bench=bench, contam_ngram=5, collect_metrics=True
    )
    assert m["docs_after_decontam"] <= m["docs_after_near_dedup"]
    # every surviving doc is n-gram-disjoint from the bench set
    ids = clean.select("id").distinct()
    flags = decontaminate(
        train.join(ids, train["doc_id"] == ids["id"], "left_semi"), bench, n=5
    )
    assert flags.where(F.col("contaminated")).count() == 0
    # decontam only ever removes docs
    assert clean.count() <= base.count()
