"""Structured Streaming feature operators: drive a parquet-backed
stream to completion and compare against batch semantics."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream_dir(spark, transcripts, tmp_path_factory):
    """Transcripts + one far-future sentinel row: append-mode windowed
    aggregates only emit once the watermark passes their end, so the
    sentinel flushes every real session/window."""
    d = str(tmp_path_factory.mktemp("stream") / "transcripts")
    sentinel = transcripts.limit(1).select(
        F.lit("__sentinel__").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("x").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")).alias("ts"),
    )
    transcripts.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def _drive(q):
    q.processAllAvailable()
    q.stop()


def test_stream_sessionize_matches_batch(spark, transcripts, stream_dir):
    from openmldb_spark.operators.sessionize import sessionize
    from openmldb_spark.streaming.features import stream_sessionize

    src = spark.readStream.schema(transcripts.schema).parquet(stream_dir)
    agg = stream_sessionize(src, key="conv_id", ts="ts", gap="30 minutes", watermark="1 minute")
    q = (
        agg.writeStream.outputMode("append").format("memory")
        .queryName("sess_out").trigger(availableNow=True).start()
    )
    _drive(q)
    got = spark.sql("select * from sess_out where conv_id != '__sentinel__'").toPandas()

    # batch oracle: sessionize then aggregate per session
    batch = (
        sessionize(transcripts, "conv_id", "ts", gap=1800.0, tiebreak=["turn_idx"])
        .groupBy("conv_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .toPandas()
    )
    # session counts per conv must match as multisets
    g = got.groupby("conv_id")["n_turns"].apply(lambda s: sorted(s)).to_dict()
    b = batch.groupby("conv_id")["n_turns"].apply(lambda s: sorted(s)).to_dict()
    assert g == b


def test_stream_running_features(spark, transcripts, stream_dir):
    from openmldb_spark.streaming.features import stream_running_features

    src = spark.readStream.schema(transcripts.schema).parquet(stream_dir)
    feats = stream_running_features(src)
    q = (
        feats.writeStream.outputMode("append").format("memory")
        .queryName("run_out").trigger(availableNow=True).start()
    )
    _drive(q)
    got = spark.sql("select * from run_out where conv_id != '__sentinel__'").toPandas()
    assert len(got) == transcripts.count()

    # batch oracle for one conversation
    pdf = transcripts.filter(F.col("conv_id") == "conv_000003").toPandas()
    pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort").reset_index(drop=True)
    sub = got[got.conv_id == "conv_000003"].sort_values("n_turns_so_far").reset_index(drop=True)
    assert sub["n_turns_so_far"].tolist() == list(range(1, len(pdf) + 1))
    exp_tools = pdf["tool"].notna().cumsum().tolist()
    assert sub["n_tool_calls_so_far"].tolist() == exp_tools
    prev_roles = [None] + pdf["role"].tolist()[:-1]
    assert [x if isinstance(x, str) else None for x in sub["prev_role"]] == prev_roles


def test_stream_rolling_counts_runs(spark, transcripts, stream_dir):
    from openmldb_spark.streaming.features import stream_rolling_counts

    src = spark.readStream.schema(transcripts.schema).parquet(stream_dir)
    agg = stream_rolling_counts(src, key="conv_id", ts="ts",
                                window="1 hour", slide="30 minutes",
                                watermark="1 minute", value_col="turn_idx")
    q = (
        agg.writeStream.outputMode("append").format("memory")
        .queryName("roll_out").trigger(availableNow=True).start()
    )
    _drive(q)
    got = spark.sql("select * from roll_out").toPandas()
    assert len(got) > 0
    assert {"conv_id", "window_start", "window_end", "n_events", "sum_turn_idx"} <= set(got.columns)


def test_preagg_sink_matches_batch_state(spark, tmp_path):
    """Streaming insert-time pre-agg maintenance (streaming/
    preagg_sink.py): two ordered micro-batches through foreachBatch
    leave the SAME merged (key, bucket) partials as one batch build —
    and a replayed batch is a no-op (idempotent under at-least-once)."""
    import pandas as pd

    from openmldb_spark.operators.preagg import PreAggTable
    from openmldb_spark.operators.window import Agg, WindowSpec
    from openmldb_spark.streaming.preagg_sink import preagg_sink

    spec = WindowSpec(["k"], "ts", "rows", None, tiebreak=["rid"])
    aggs = [Agg("sum", "v", "sv"), Agg("count", "v", "cv")]
    rows = [("a" if i % 2 else "b", i * 600_000, i, float(i)) for i in range(40)]
    pdf = pd.DataFrame(rows, columns=["k", "ts", "rid", "v"])
    full = spark.createDataFrame(pdf.astype({"ts": "int64", "rid": "int64"}))

    src_dir = str(tmp_path / "src")
    full.filter("ts < 12000000").coalesce(1).write.parquet(src_dir)

    stream_state = PreAggTable.create(spark, str(tmp_path / "s1"), spec, aggs,
                                      bucket_ms=3_600_000)
    src = spark.readStream.schema(full.schema).parquet(src_dir)
    q = preagg_sink(src, stream_state,
                    checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        # second ordered chunk arrives
        full.filter("ts >= 12000000").coalesce(1).write.mode("append").parquet(src_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    batch_state = PreAggTable.create(spark, str(tmp_path / "s2"), spec, aggs,
                                     bucket_ms=3_600_000)
    batch_state.append(full)

    def canon(t):
        return sorted(tuple(r) for r in t.partials()
                      .select("k", "__lw_bucket__", "__s0__", "__c0__", "__c1__")
                      .collect())

    assert canon(stream_state) == canon(batch_state)

    # replaying an already-seen chunk is a no-op (tail mode drops rows
    # at/below each key's watermark)
    stream_state.append_tail(full.filter("ts < 12000000"))
    assert canon(stream_state) == canon(batch_state)
