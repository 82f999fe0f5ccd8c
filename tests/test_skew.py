"""Heavy-term salt: the north rule requires the index build to handle
term-frequency skew via salted repartitioning of heavy terms.

``build_blocks`` salts its one shuffle with the docint span
(``docint >> span_bits``), so a stopword-grade term with postings across
the whole docint range spreads over many partitions instead of
hot-spotting one — while every block range still lands wholly inside a
single partition (span_bits > block_bits), so no (term, block_id) group
is ever split across encoders.

Reference analog: the atomized chunk keyspace ``(termKey, blockKey)``
spreads one term's bitmap over many LAB keys
(miru-service/.../index/lab/LabInvertedIndex.java:268-399).

The test runs at reduced bits (block=4, span=6: 16-doc blocks, 64-doc
spans) so a 4k-doc corpus exercises 64 span keys; the production
constants differ only by scale.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from miru_spark.indexing.blocks import build_blocks
from miru_spark.indexing.codec import varint_decode

N_DOCS = 4096
BLOCK_BITS = 4
SPAN_BITS = 6
N_PARTS = 8


@pytest.fixture(scope="module")
def skew_flat(spark):
    """Flat postings with one pathological heavy term.

    ``hot`` appears in EVERY doc (df = n_docs); 32 light terms carry a
    uniform tail. Built directly as the (term, docint, tf, doclen)
    relation build_blocks consumes — the tokenizer is irrelevant here.
    """
    docs = spark.range(N_DOCS).select(F.col("id").alias("docint"))
    hot = docs.select(
        F.lit("hot").alias("term"),
        "docint",
        (F.pmod(F.col("docint"), F.lit(7)) + 1).cast("int").alias("tf"),
        F.lit(40).alias("doclen"),
    )
    light = docs.select(
        F.concat(F.lit("w"), F.pmod(F.xxhash64("docint"), F.lit(32))).alias(
            "term"
        ),
        "docint",
        F.lit(1).cast("int").alias("tf"),
        F.lit(40).alias("doclen"),
    )
    df = hot.unionByName(light).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def skew_blocks(spark, skew_flat):
    blocks = build_blocks(
        skew_flat,
        avgdl=40.0,
        n_partitions=N_PARTS,
        block_bits=BLOCK_BITS,
        span_bits=SPAN_BITS,
    ).withColumn("pid", F.spark_partition_id())
    pdf = blocks.toPandas()
    return pdf


def test_hot_term_spreads_across_partitions(skew_blocks):
    """The salt must break the hot term over many partitions: with 64
    span keys hashed to 8 partitions, all 8 should see hot-term work
    (unsalted repartition("term") puts 100% of it on one)."""
    hot_pids = set(skew_blocks.loc[skew_blocks["term"] == "hot", "pid"])
    assert len(hot_pids) >= N_PARTS - 1  # allow one empty hash bucket


def test_no_group_split_under_salt(skew_blocks):
    """Exactly one block row per (term, block_id): the coarser span key
    keeps each block range inside one partition, so no group is split
    between two encoder instances."""
    dup = skew_blocks.groupby(["term", "block_id"]).size()
    assert int(dup.max()) == 1
    hot = skew_blocks[skew_blocks["term"] == "hot"]
    assert len(hot) == N_DOCS >> BLOCK_BITS  # full blocks, none missing


def test_salted_blocks_decode_exactly(skew_flat, skew_blocks):
    """Round-trip: decoding every hot-term block reproduces the exact
    posting set — the salt changed layout, not content."""
    want = {
        int(r["docint"]): int(r["tf"])
        for r in skew_flat.filter("term = 'hot'").collect()
    }
    got = {}
    for _, row in skew_blocks[skew_blocks["term"] == "hot"].iterrows():
        docs = np.cumsum(varint_decode(row["docs_bin"]), dtype=np.uint64)
        tfs = varint_decode(row["tfs_bin"])
        assert int(docs[0]) == row["first_doc"]
        assert int(docs[-1]) == row["last_doc"]
        for d, tf in zip(docs, tfs):
            assert int(d) >> BLOCK_BITS == row["block_id"]
            got[int(d)] = int(tf)
    assert got == want


def test_span_bits_guard():
    """span_bits <= block_bits would let one block straddle partitions;
    the builder must refuse."""
    with pytest.raises(ValueError):
        build_blocks(None, avgdl=1.0, block_bits=6, span_bits=6)
