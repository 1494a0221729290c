"""AutoFE generation + scalar function registry sanity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_autofe_generates_and_runs(spark, transcripts):
    from openmldb_spark.plans.autofe import generate_feature_windows, to_sql
    from openmldb_spark.plans.backfill import backfill_features

    wins = generate_feature_windows(
        transcripts, key="conv_id", ts="ts", tiebreak=["turn_idx"],
        row_horizons=(5,), time_horizons_ms=(3_600_000,), max_lag=1,
    )
    assert len(wins) == 3  # rows, rows_range, lags
    out = backfill_features(transcripts, "ts", wins)
    pdf = out.limit(50).toPandas()
    assert "turn_idx_sum_r5" in pdf.columns
    assert "tool_nuniq_t60m" in pdf.columns
    assert "role_lag1" in pdf.columns

    # the generated SQL runs through the SQL front-end too
    from openmldb_spark.sql import SqlEngine

    eng = SqlEngine(spark)
    eng.register("tr", transcripts)
    sql = to_sql("tr", wins[:1], "conv_id", "ts")
    res = eng.sql(sql)
    assert res.count() == transcripts.count()
    assert "turn_idx_sum_r5" in res.columns


def test_scalar_function_registry(spark):
    from openmldb_spark.functions import scalar as S

    df = spark.range(1).select(
        S.earth_distance(0.0, 0.0, 0.0, 90.0).alias("quarter_eq"),
        S.strcmp(F.lit("a"), F.lit("b")).alias("cmp"),
        S.if_null(F.lit(None).cast("int"), F.lit(7)).alias("nvl"),
        S.truncate(F.lit(-1.7)).alias("trunc"),
        S.split_by_key(F.lit("k1:v1,k2:v2"), ",", ":").alias("keys"),
        S.split_by_value(F.lit("k1:v1,k2:v2"), ",", ":").alias("vals"),
        S.maximum(F.lit(1), F.lit(9), F.lit(5)).alias("mx"),
        S.FUNCTIONS["abs"](F.lit(-3)).alias("a"),
        S.FUNCTIONS["concat_ws"]("-", F.lit("x"), F.lit("y")).alias("cw"),
    ).first()
    # quarter circumference with the reference's 6372.8 km radius
    # (earth_distance_def.cc:28) ≈ 10,010.3 km — output is in km
    assert math.isclose(df["quarter_eq"], 10010.3, rel_tol=1e-3)
    assert df["cmp"] == -1
    assert df["nvl"] == 7
    assert df["trunc"] == -1.0
    assert list(df["keys"]) == ["k1", "k2"]
    assert list(df["vals"]) == ["v1", "v2"]
    assert df["mx"] == 9
    assert df["a"] == 3
    assert df["cw"] == "x-y"
    assert len(S.FUNCTIONS) >= 80
