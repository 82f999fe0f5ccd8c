from __future__ import annotations

import pytest

from miru_spark.session import get_spark
from miru_spark.transcripts import generate_transcripts


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "miru_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
        # C1-only JIT: faster warmup for short test jobs
        extra_conf={"spark.driver.extraJavaOptions": "-XX:TieredStopAtLevel=1"},
    )
    yield s


@pytest.fixture(scope="session")
def tiny_turns(spark):
    """~1k-turn deterministic corpus (FIXTURES.md 'tiny')."""
    df = generate_transcripts(spark, n_convs=100, max_turns=16, seed=42)
    df = df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def tiny_pdf(tiny_turns):
    return tiny_turns.toPandas()


@pytest.fixture(scope="session")
def small_turns(spark):
    """~10k-turn corpus (FIXTURES.md 'small') for e2e oracle checks."""
    df = generate_transcripts(spark, n_convs=1000, max_turns=20, seed=42)
    df = df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def small_pdf(small_turns):
    return small_turns.toPandas()
