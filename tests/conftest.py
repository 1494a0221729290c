from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from openmldb_spark.session import SessionConfig, get_spark

    cfg = SessionConfig(
        master="local[4]",
        app_name="openmldb_spark_tests",
        shuffle_partitions=4,
        driver_memory="4g",
    )
    s = get_spark(cfg)
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    from openmldb_spark.data import generate_transcripts

    df = generate_transcripts(spark, n_convs=20, avg_turns=40, seed=42)
    df = df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def conv_meta(spark):
    from openmldb_spark.data import generate_conv_meta

    df = generate_conv_meta(spark, n_convs=20, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def archive(spark):
    from openmldb_spark.data import generate_archive

    df = generate_archive(spark, n_convs=20, avg_turns=10, seed=42).cache()
    df.count()
    return df
