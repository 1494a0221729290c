"""Sessionization by inactivity gap — pure native Spark windows.

Not present in the reference (its "real-time" side is request-mode,
survey §2.6); built here as a first-class operator per the north star:
``lag(ts) over (key order ts)`` → gap > threshold starts a new session →
cumulative sum of starts = session index. Single shuffle on the key,
all inside Catalyst/whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["sessionize"]


def sessionize(
    df: DataFrame,
    key: str | list[str],
    ts: str,
    gap: float = 1800.0,
    tiebreak: list[str] | None = None,
    session_col: str = "session_id",
    out_global_id: bool = False,
) -> DataFrame:
    """Append a per-key session index (0-based) split at gaps > ``gap`` s.

    ``tiebreak`` makes ordering total under duplicate timestamps (e.g.
    ``["turn_idx"]``). With ``out_global_id`` also emit a globally
    unique string id ``<key>#<session_idx>``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)

    ts_dt = df.schema[ts].dataType
    if isinstance(ts_dt, (T.TimestampType, T.TimestampNTZType)):
        cur_ms = (F.unix_micros(F.col(ts).cast("timestamp")) / 1000).cast("long")
    else:
        cur_ms = F.col(ts).cast("long")
    prev_ms = F.lag(cur_ms).over(w)
    new_sess = F.when(
        prev_ms.isNull() | ((cur_ms - prev_ms) > int(gap * 1000)), F.lit(1)
    ).otherwise(F.lit(0))
    out = df.withColumn(
        session_col,
        (F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast("long"),
    )
    if out_global_id:
        out = out.withColumn(
            f"{session_col}_global",
            F.concat_ws("#", *[F.col(k) for k in keys], F.col(session_col)),
        )
    return out
