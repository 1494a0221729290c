"""Sessionization + end-to-end backfill (north-star flagship shape).

Covers: session split at 30-min inactivity gaps, point-in-time feature
vectors at every (conv_id, ts, turn_idx), zero temporal leakage, and
per-turn text equality under stable (conv_id, turn_idx) ordering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from openmldb_spark.operators.sessionize import sessionize
from openmldb_spark.operators.window import Agg, WindowSpec
from openmldb_spark.plans.backfill import AsOfSource, FeatureWindow, backfill_features


def test_sessionize_matches_pandas(spark, transcripts):
    got = (
        sessionize(transcripts, "conv_id", "ts", gap=1800.0, tiebreak=["turn_idx"])
        .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pdf = transcripts.toPandas().sort_values(["conv_id", "ts", "turn_idx"])
    exp = []
    for _, g in pdf.groupby("conv_id", sort=False):
        ts_ms = g["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
        gap = ts_ms.diff()
        new = (gap.isna() | (gap > 1_800_000)).astype(int)
        exp.append(pd.DataFrame({
            "conv_id": g["conv_id"], "turn_idx": g["turn_idx"],
            "session_id": new.cumsum() - 1,
        }))
    expdf = pd.concat(exp).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["session_id"].tolist() == expdf["session_id"].tolist()
    # fixture must actually contain multi-session conversations
    assert got.groupby("conv_id")["session_id"].max().max() >= 1


def test_backfill_end_to_end(spark, transcripts, conv_meta, archive):
    fw = FeatureWindow(
        spec=WindowSpec(["conv_id"], "ts", "rows", 10, tiebreak=["turn_idx"]),
        aggs=[
            Agg("count_where", "turn_idx", "n_tool_calls_10", cond="__is_tool__"),
            Agg("distinct_count", "tool", "n_distinct_tools_10"),
            Agg("lag", "tool", "prev_tool", n=1),
            Agg("lag", "role", "prev_role", n=1),
        ],
    )
    from pyspark.sql import functions as F

    primary = transcripts.withColumn("__is_tool__", F.col("role") == "tool")
    out = backfill_features(
        primary,
        anchor_ts="ts",
        windows=[fw],
        asof=[AsOfSource(conv_meta, on=["conv_id"], right_ts="ts", prefix="m_")],
        session_key="conv_id",
        session_gap=1800.0,
        session_tiebreak=["turn_idx"],
    )
    pdf = out.toPandas()
    n = transcripts.count()
    assert len(pdf) == n
    assert set(["n_tool_calls_10", "n_distinct_tools_10", "prev_tool", "prev_role",
                "m_model", "session_id"]).issubset(pdf.columns)
    # per-turn text equality under stable (conv_id, turn_idx) ordering
    src = transcripts.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["text"].tolist() == src["text"].tolist()


def test_backfill_zero_leakage(spark, transcripts, conv_meta):
    """Recompute each anchor's features on a truncated table (rows with
    ts > anchor dropped) — the feature vector must be identical."""
    from pyspark.sql import functions as F

    small = transcripts.filter(F.col("conv_id").isin("conv_000001", "conv_000002"))
    fw = FeatureWindow(
        spec=WindowSpec(["conv_id"], "ts", "rows_range", 3_600_000, tiebreak=["turn_idx"]),
        aggs=[Agg("count", None, "cnt_1h"), Agg("sum", "turn_idx", "sum_1h"),
              Agg("distinct_count", "tool", "dtool_1h")],
    )
    full = backfill_features(
        small, "ts", [fw],
        asof=[AsOfSource(conv_meta, on=["conv_id"], right_ts="ts", prefix="m_")],
    ).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    pdf = small.toPandas()
    feature_cols = ["cnt_1h", "sum_1h", "dtool_1h", "m_model"]
    meta_pdf = conv_meta.toPandas()
    for _, anchor in full.sample(n=min(25, len(full)), random_state=7).iterrows():
        trunc = pdf[(pdf["ts"] <= anchor["ts"]) & (pdf["conv_id"] == anchor["conv_id"])]
        tdf = spark.createDataFrame(trunc)
        mdf = spark.createDataFrame(meta_pdf)
        re = backfill_features(
            tdf, "ts", [fw],
            asof=[AsOfSource(mdf, on=["conv_id"], right_ts="ts", prefix="m_")],
        ).toPandas()
        row = re[(re["conv_id"] == anchor["conv_id"]) & (re["turn_idx"] == anchor["turn_idx"])]
        assert len(row) == 1
        for c in feature_cols:
            a, b = anchor[c], row.iloc[0][c]
            if pd.isna(a) and pd.isna(b):
                continue
            assert a == b, f"leakage in {c}: full={a} truncated={b}"
