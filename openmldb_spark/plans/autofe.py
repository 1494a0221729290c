"""AutoFE — automatic window/LAST-JOIN feature generation.

Analogue of the reference's ``python/openmldb_autofe/autofe/autofe.py``
(survey §0): given a primary table's key/ts and column types, generate
a candidate ``FeatureWindow`` set (rolling counts/sums/avgs/min/max
over several horizons, distinct counts and top-frequency for
categoricals, lags) ready for ``backfill_features``. The reference
emits SQL text; we emit the engine's typed plan objects, which also
compile back to dialect SQL via ``to_sql`` for portability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from openmldb_spark.operators.window import Agg, WindowSpec
from openmldb_spark.plans.backfill import FeatureWindow

__all__ = ["generate_feature_windows", "to_sql"]

DEFAULT_ROW_HORIZONS = (5, 20)
DEFAULT_TIME_HORIZONS_MS = (3_600_000, 86_400_000)  # 1h, 1d

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType)


def generate_feature_windows(
    df: DataFrame,
    key: str,
    ts: str,
    tiebreak: list[str] | None = None,
    row_horizons=DEFAULT_ROW_HORIZONS,
    time_horizons_ms=DEFAULT_TIME_HORIZONS_MS,
    max_lag: int = 2,
    skew: bool = False,
) -> list[FeatureWindow]:
    """Candidate features per column type over each horizon."""
    numeric = [f.name for f in df.schema.fields
               if isinstance(f.dataType, _NUMERIC) and f.name not in (key, ts)]
    categorical = [f.name for f in df.schema.fields
                   if isinstance(f.dataType, T.StringType) and f.name not in (key, ts)]
    out: list[FeatureWindow] = []

    def aggs_for(tag: str) -> list[Agg]:
        aggs: list[Agg] = [Agg("count", None, f"n_{tag}")]
        for c in numeric:
            aggs += [
                Agg("sum", c, f"{c}_sum_{tag}"),
                Agg("avg", c, f"{c}_avg_{tag}"),
                Agg("min", c, f"{c}_min_{tag}"),
                Agg("max", c, f"{c}_max_{tag}"),
            ]
        for c in categorical:
            aggs.append(Agg("distinct_count", c, f"{c}_nuniq_{tag}"))
            aggs.append(Agg("topn_frequency", c, f"{c}_top1_{tag}", n=1))
        return aggs

    for n in row_horizons:
        spec = WindowSpec([key], ts, "rows", n, tiebreak=tuple(tiebreak or ()))
        out.append(FeatureWindow(spec, aggs_for(f"r{n}"), skew=skew))
    for ms in time_horizons_ms:
        spec = WindowSpec([key], ts, "rows_range", ms, tiebreak=tuple(tiebreak or ()))
        out.append(FeatureWindow(spec, aggs_for(f"t{ms // 60000}m"), skew=skew))

    lag_aggs = [
        Agg("lag", c, f"{c}_lag{i}", n=i)
        for c in (numeric + categorical)
        for i in range(1, max_lag + 1)
    ]
    if lag_aggs:
        out.append(FeatureWindow(
            WindowSpec([key], ts, "rows", max(row_horizons), tiebreak=tuple(tiebreak or ())),
            lag_aggs, skew=skew,
        ))
    return out


def _frame_sql(spec: WindowSpec) -> str:
    unit = "" if spec.frame == "rows" else ""
    start = "UNBOUNDED" if spec.preceding is None else str(spec.preceding)
    kind = "ROWS" if spec.frame == "rows" else "ROWS_RANGE"
    parts = [f"{kind} BETWEEN {start} PRECEDING AND CURRENT ROW"]
    if spec.maxsize:
        parts.append(f"MAXSIZE {spec.maxsize}")
    if spec.exclude_current_time:
        parts.append("EXCLUDE CURRENT_TIME")
    if spec.exclude_current_row:
        parts.append("EXCLUDE CURRENT_ROW")
    return " ".join(parts)


def to_sql(table: str, windows: list[FeatureWindow], key: str, ts: str) -> str:
    """Compile generated features to dialect SQL (reference AutoFE's
    output format) — runnable via SqlEngine or the reference itself."""
    items = [f"{key}", f"{ts}"]
    wdefs = []
    for i, fw in enumerate(windows):
        wname = f"w{i}"
        for a in fw.aggs:
            args = a.col or "*"
            if a.func in ("lag", "topn_frequency"):
                args = f"{a.col}, {a.n}"
            items.append(f"{a.func}({args}) OVER {wname} AS {a.name}")
        wdefs.append(
            f"{wname} AS (PARTITION BY {table}.{key} ORDER BY {table}.{ts} {_frame_sql(fw.spec)})"
        )
    return (
        "SELECT " + ", ".join(items) + f" FROM {table} WINDOW " + ", ".join(wdefs)
    )
