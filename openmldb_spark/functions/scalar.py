"""Scalar function surface — the reference's built-in UDF registry
re-expressed as native Spark Column expressions.

Registry parity target: ``hybridse/src/udf/default_udf_library.cc`` +
``hybridse/src/udf/default_defs/*.cc`` (152 documented functions,
survey §2.4). Every function here is a thin combinator over
``pyspark.sql.functions`` — JVM-side, codegen'd, no Python in the hot
path. Functions Spark lacks are built from primitives (earth_distance,
split_by_key/value, like_match, ...).

Use ``FUNCTIONS[name](col...)`` or import directly. ``register_all``
registers SQL-callable wrappers for the handful of names Spark SQL
doesn't already provide.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["FUNCTIONS", "register_all"]


def _c(x):
    return x if isinstance(x, Column) else (F.lit(x) if not isinstance(x, str) else F.col(x))


# --- math (default_udf_library.cc; 1:1 with pyspark.sql.functions) --------

def log(base, col=None):
    """log(x) = natural log; log(b, x) = log base b (reference semantics)."""
    if col is None:
        return F.log(_c(base))
    return F.log(float(base) if not isinstance(base, Column) else base, _c(col))


def pmod(a, b):
    return F.pmod(_c(a), _c(b))


def inc(col):
    return _c(col) + 1


def identity(col):
    return _c(col)


def truncate(col):
    """truncate toward zero (reference: udfs truncate)."""
    c = _c(col)
    return F.when(c >= 0, F.floor(c)).otherwise(F.ceil(c)).cast("double")


def hash64(col, dtype=None):
    """farmhash::Fingerprint64 of the value's raw bytes, bit-exact with
    the reference (functions/farmhash.py; udf.cc:1407). The byte view
    is typed — pass the column's Spark ``dtype`` (the SQL front-end
    supplies it automatically from schema probing); bare calls default
    to string semantics."""
    from pyspark.sql import types as T

    from openmldb_spark.functions.farmhash import UDF_NAME

    dtype = dtype or T.StringType()
    c = _c(col)
    if isinstance(dtype, T.StringType):
        return F.call_udf(UDF_NAME, c, F.lit("str"))
    if isinstance(dtype, T.BooleanType):
        return F.call_udf(UDF_NAME, c.cast("int").cast("string"), F.lit("i1"))
    if isinstance(dtype, T.ShortType):
        return F.call_udf(UDF_NAME, c.cast("string"), F.lit("i2"))
    if isinstance(dtype, T.IntegerType):
        return F.call_udf(UDF_NAME, c.cast("string"), F.lit("i4"))
    if isinstance(dtype, T.LongType):
        return F.call_udf(UDF_NAME, c.cast("string"), F.lit("i8"))
    if isinstance(dtype, T.FloatType):
        return F.call_udf(UDF_NAME, c.cast("string"), F.lit("f4"))
    if isinstance(dtype, T.DoubleType):
        return F.call_udf(UDF_NAME, c.cast("string"), F.lit("f8"))
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.call_udf(UDF_NAME, F.unix_millis(c).cast("string"), F.lit("i8"))
    if isinstance(dtype, T.DateType):
        packed = ((F.year(c) - 1900) * 65536 + (F.month(c) - 1) * 256
                  + F.dayofmonth(c))
        return F.call_udf(UDF_NAME, packed.cast("string"), F.lit("i4"))
    raise ValueError(f"hash64: unsupported type {dtype}")


farm_fingerprint = hash64


# --- string ----------------------------------------------------------------

def strcmp(a, b):
    a, b = _c(a), _c(b)
    return F.when(a < b, -1).when(a > b, 1).otherwise(0)


def like_regex(pat: str, esc: str) -> str | None:
    """Dialect LIKE pattern → anchored-regex body; ``None`` for a
    dangling escape (matches nothing). Any char may be the escape;
    an empty escape leaves wildcards live (shared with the SQL
    front-end's _rewrite_like_escape). A MULTI-character escape string
    never matches either — the reference rejects the whole match
    rather than treating the escape as inert
    (test_like_match.yaml id=28)."""
    import re as _re

    if len(esc) > 1:
        return None
    out = []
    i = 0
    while i < len(pat):
        ch = pat[i]
        if esc and ch == esc:
            if i + 1 >= len(pat):
                return None
            out.append(_re.escape(pat[i + 1]))
            i += 2
            continue
        out.append(".*" if ch == "%" else "." if ch == "_" else _re.escape(ch))
        i += 1
    return "".join(out)


def like_match(col, pattern, escape=None):
    """LIKE with the dialect's ESCAPE rules ('' disables escaping, any
    char may escape, dangling escape never matches). Non-default
    escapes are lowered to RLIKE via the same regex translation as the
    SQL front-end — no SQL-string building, so backslashes and
    expression columns are safe."""
    c = _c(col)
    if escape is None or escape == "" or not isinstance(pattern, str):
        return c.like(pattern)
    if escape == "\\":
        return c.like(pattern)  # Spark's native default-escape semantics
    rx = like_regex(pattern, escape)
    rx = "(?!x)x" if rx is None else rx  # never-match (NULL stays NULL)
    return c.rlike(f"^{rx}$")


def ilike_match(col, pattern):
    return F.lower(_c(col)).like(pattern.lower() if isinstance(pattern, str) else F.lower(_c(pattern)))


def regexp_like(col, pattern):
    return _c(col).rlike(pattern)


def split(col, delim):
    """string → array<string> (feature_zero_def.cc split)."""
    return F.split(_c(col), delim)


def split_by_key(col, item_delim, kv_delim):
    """'k1:v1,k2:v2' → array of keys (feature_zero_def.cc)."""
    return F.transform(
        F.split(_c(col), item_delim),
        lambda kv: F.split(kv, kv_delim).getItem(0),
    )


def split_by_value(col, item_delim, kv_delim):
    """'k1:v1,k2:v2' → array of values."""
    return F.transform(
        F.split(_c(col), item_delim),
        lambda kv: F.split(kv, kv_delim).getItem(1),
    )


def join(col, delim):
    return F.array_join(_c(col), delim)


# --- date / time -----------------------------------------------------------

def day_of_week(col):
    return F.dayofweek(_c(col))


def week_of_year(col):
    return F.weekofyear(_c(col))


def unix_timestamp_ms(col):
    """reference TIMESTAMP is int64 epoch ms."""
    return (F.unix_micros(_c(col)) / 1000).cast("long")


def timestamp_from_ms(col):
    return F.timestamp_millis(_c(col).cast("long"))


# --- null handling -----------------------------------------------------------

def if_null(col, default):
    return F.coalesce(_c(col), _c(default))


ifnull = if_null
nvl = if_null


def nvl2(col, value_if_not_null, value_if_null):
    c = _c(col)
    return F.when(c.isNotNull(), _c(value_if_not_null)).otherwise(_c(value_if_null))


def is_null(col):
    return F.isnull(_c(col))


# --- geo ---------------------------------------------------------------------

def earth_distance(lat1, lon1, lat2, lon2):
    """Haversine great-circle distance in KILOMETERS, radius 6372.8
    (reference-exact: default_defs/earth_distance_def.cc:28)."""
    rlat1, rlon1 = F.radians(_c(lat1)), F.radians(_c(lon1))
    rlat2, rlon2 = F.radians(_c(lat2)), F.radians(_c(lon2))
    dlat, dlon = rlat2 - rlat1, rlon2 - rlon1
    a = F.sin(dlat / 2) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    return 2 * 6372.8 * F.asin(F.sqrt(a))


# --- row-wise min/max (reference maximum/minimum) ----------------------------

def maximum(*cols):
    return F.greatest(*[_c(c) for c in cols])


def minimum(*cols):
    return F.least(*[_c(c) for c in cols])


# --- registry ----------------------------------------------------------------

# names map 1:1 to pyspark.sql.functions (reference → Spark; survey §2.4)
_PASSTHROUGH = {
    # math
    "abs": F.abs, "acos": F.acos, "asin": F.asin, "atan": F.atan,
    "atan2": F.atan2, "ceil": F.ceil, "ceiling": F.ceil, "cos": F.cos,
    "cot": F.cot, "degrees": F.degrees, "exp": F.exp, "floor": F.floor,
    "ln": F.log, "log2": F.log2, "log10": F.log10, "pow": F.pow,
    "power": F.pow, "radians": F.radians, "round": F.round, "sin": F.sin,
    "sqrt": F.sqrt, "tan": F.tan, "hex": F.hex, "unhex": F.unhex,
    # string
    "char": F.char, "char_length": F.char_length,
    "character_length": F.char_length, "concat": F.concat,
    "concat_ws": F.concat_ws, "lower": F.lower, "lcase": F.lower,
    "upper": F.upper, "ucase": F.upper, "replace": F.replace,
    "reverse": F.reverse, "substr": F.substring, "substring": F.substring,
    "lpad": F.lpad, "rpad": F.rpad, "trim": F.trim, "ltrim": F.ltrim, "rtrim": F.rtrim,
    # date/time
    "date": F.to_date, "date_format": F.date_format, "datediff": F.datediff,
    "day": F.dayofmonth, "dayofmonth": F.dayofmonth, "dayofweek": F.dayofweek,
    "dayofyear": F.dayofyear, "hour": F.hour, "last_day": F.last_day,
    "minute": F.minute, "month": F.month, "second": F.second,
    "unix_timestamp": F.unix_timestamp, "week": F.weekofyear,
    "weekofyear": F.weekofyear, "year": F.year, "add_months": F.add_months,
    # arrays/maps/json (array_def.cc, map_defs.cc, json_defs.cc)
    "array_contains": F.array_contains, "split_array": F.split,
    "map": F.create_map, "map_keys": F.map_keys,
    "get_json_object": F.get_json_object,
    "json_array_length": F.json_array_length,
    # null / misc
    "coalesce": F.coalesce, "isnull": F.isnull,
    "greatest": F.greatest, "least": F.least,
}

FUNCTIONS: dict[str, object] = dict(_PASSTHROUGH)
FUNCTIONS.update(
    log=log, pmod=pmod, inc=inc, identity=identity, truncate=truncate,
    hash64=hash64, farm_fingerprint=farm_fingerprint, strcmp=strcmp,
    like_match=like_match, ilike_match=ilike_match, regexp_like=regexp_like,
    split=split, split_by_key=split_by_key, split_by_value=split_by_value,
    join=join, day_of_week=day_of_week, week_of_year=week_of_year,
    unix_timestamp_ms=unix_timestamp_ms, timestamp_from_ms=timestamp_from_ms,
    if_null=if_null, ifnull=ifnull, nvl=nvl, nvl2=nvl2, is_null=is_null,
    earth_distance=earth_distance, maximum=maximum, minimum=minimum,
)


def register_all(spark) -> None:
    """Expose the non-native names to Spark SQL (as SQL expressions via
    selectExpr-compatible temp functions where possible)."""
    from openmldb_spark.functions import farmhash

    farmhash.register(spark)
    # earth_distance & friends are composite Column builders — expose a
    # SQL macro through a view-less expression: Spark supports SQL UDF
    # registration only for Python/pandas UDFs, so register thin pandas
    # wrappers only where SQL-callability is genuinely needed.
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def earth_distance_sql(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
        import numpy as np

        # literal args may arrive as DECIMAL → object-dtype Decimals
        lat1, lon1, lat2, lon2 = (s.astype("float64") for s in (lat1, lon1, lat2, lon2))
        rlat1, rlon1 = np.radians(lat1), np.radians(lon1)
        rlat2, rlon2 = np.radians(lat2), np.radians(lon2)
        dlat, dlon = rlat2 - rlat1, rlon2 - rlon1
        a = np.sin(dlat / 2) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon / 2) ** 2
        return pd.Series(2 * 6372.8 * np.arcsin(np.sqrt(a)))

    spark.udf.register("earth_distance", earth_distance_sql)

    # entropy as a grouped-agg pandas UDAF: SQL-callable in full-table
    # and GROUP BY aggregations (window frames route through the
    # kernel's evaluator instead — test_udaf_function.yaml id=63)
    @F.pandas_udf(DoubleType())
    def entropy_sql(v: pd.Series) -> float:  # Series → scalar ⇒ grouped agg
        import numpy as np

        x = v.dropna()
        if not len(x):
            return None
        p = x.astype(str).value_counts(normalize=True).to_numpy()
        return float(-(p * np.log2(p)).sum() + 0.0)

    spark.udf.register("entropy", entropy_sql)

    # 3-arg like_match with a non-literal escape — NULL escape/pattern/
    # target yield NULL, dangling escape matches nothing (SQL front-end
    # routes only non-literal-escape calls here)
    def _like3(ci: bool):
        import re as _re

        @F.pandas_udf("boolean")
        def go(s: pd.Series, p: pd.Series, e: pd.Series) -> pd.Series:
            out = []
            for v, pat, esc in zip(s, p, e):
                if v is None or pat is None or esc is None:
                    out.append(None)
                    continue
                rx = like_regex(pat, esc)
                if rx is None:
                    out.append(False)
                    continue
                if ci:
                    rx = "(?i)" + rx
                out.append(bool(_re.fullmatch(rx, v)))
            return pd.Series(out, dtype=object)

        return go

    spark.udf.register("like_match", _like3(False))
    spark.udf.register("ilike_match", _like3(True))
