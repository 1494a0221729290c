"""Structured Streaming feature operators.

The reference has NO streaming engine (survey §2.6) — its "real-time"
side is request-mode lookup. This module is the Spark-native
equivalent of that capability: the same feature definitions computed
incrementally over a stream, so online features match the batch
backfill by construction.

- ``stream_sessionize`` — native ``session_window`` (gap sessions).
- ``stream_rolling_counts`` — watermarked sliding-window aggregates.
- ``stream_running_features`` — custom stateful per-key features via
  ``applyInPandasWithState`` (running counts / distinct tools / last
  values), the streaming analogue of the batch ordered kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["stream_sessionize", "stream_rolling_counts", "stream_running_features"]


def stream_sessionize(
    stream: DataFrame,
    key: str = "conv_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session aggregates per (key, gap-session): count + span.

    Streaming counterpart of ``operators.sessionize`` — the same 30-min
    inactivity-gap definition, via Spark's native session_window."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("session"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
        )
        .select(
            key,
            F.col("session.start").alias("window_start"),
            F.col("session.end").alias("window_end"),
            "n_turns", "session_start", "session_end",
        )
    )


def stream_rolling_counts(
    stream: DataFrame,
    key: str = "conv_id",
    ts: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Watermarked sliding-window counts/sums per key."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window, slide).alias("w"), F.col(key))
        .agg(*aggs)
        .select(
            key,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            *([f"sum_{value_col}"] if value_col else []),
        )
    )


_STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_tool_calls", T.LongType()),
    T.StructField("tools_seen", T.ArrayType(T.StringType())),
    T.StructField("last_role", T.StringType()),
])

_OUT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("n_turns_so_far", T.LongType()),
    T.StructField("n_tool_calls_so_far", T.LongType()),
    T.StructField("n_distinct_tools_so_far", T.LongType()),
    T.StructField("prev_role", T.StringType()),
])


def stream_running_features(stream: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Running per-conversation features over a transcripts stream —
    the streaming analogue of the batch backfill's cumulative features
    (exact same definitions, so online == offline).

    Input schema: (conv_id, turn_idx, role, tool, ts [, ...]).
    """
    import pandas as pd

    def update(key, pdfs, state):
        (conv_id,) = key
        if state.exists:
            n_turns, n_tools, seen, last_role = state.get
            seen = list(seen or [])
        else:
            n_turns, n_tools, seen, last_role = 0, 0, [], None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            for r in pdf.itertuples():
                out.append((conv_id, int(r.turn_idx), n_turns + 1,
                            n_tools + (1 if isinstance(r.tool, str) else 0),
                            len(set(seen) | ({r.tool} if isinstance(r.tool, str) else set())),
                            last_role))
                n_turns += 1
                if isinstance(r.tool, str):
                    n_tools += 1
                    if r.tool not in seen:
                        seen.append(r.tool)
                last_role = r.role
        state.update((n_turns, n_tools, seen, last_role))
        yield pd.DataFrame(out, columns=[f.name for f in _OUT_SCHEMA.fields])

    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            update, _OUT_SCHEMA, _STATE_SCHEMA, "append", timeout
        )
    )
