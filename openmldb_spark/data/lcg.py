"""SQL-replicable deterministic transcripts (oracle-checkable twin of
``transcripts.py``).

``transcripts.py`` derives its uniforms from Spark's ``xxhash64`` —
fast and distributed, but no other engine can recompute them, so
queries over that data can only get rows-only correctness checks.
This module generates the same *shapes* (hot conversation, dup-ts
ties, session gaps, sparse tool column, slowly-changing meta) from a
small integer hash chain using only ``* % ^ >>`` on BIGINTs —
operations DuckDB evaluates identically — so the driver's DuckDB
oracle can regenerate the exact table as a CTE and check full value
hashes end-to-end (VERDICT r3 "What's missing" #1).

Every value is a pure function of ``(seed, tag, conv_no, turn_idx)``:
no Python loops over rows, no driver-side data; the Spark side scales
exactly like ``generate_transcripts`` (explode over a range, one
window cumsum for ts). Intermediate products stay < 2^48 so DuckDB's
checked BIGINT arithmetic never overflows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EPOCH_2025_MS = 1735689600000  # 2025-01-01T00:00:00Z in epoch ms
_M = 2147483647  # 2^31 - 1 (Lehmer modulus)

TOOLS = ["search", "code", "browser", "sql"]
MODELS = ["m-a", "m-b", "m-c"]
CHANNELS = ["web", "api", "slack"]
WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()


# ---------------------------------------------------------------------------
# the shared integer hash — one Spark implementation, one SQL-text twin
# ---------------------------------------------------------------------------


def _u(seed: int, tag: int, a, b):
    """Spark Column: mixed integer hash in [0, 2^31) of (seed, tag, a, b)."""
    a = F.col(a) if isinstance(a, str) else F.lit(a) if isinstance(a, int) else a
    b = F.col(b) if isinstance(b, str) else F.lit(b) if isinstance(b, int) else b
    x = (
        F.lit(seed).cast("long") * 2654435
        + F.lit(tag).cast("long") * 1013904
        + a.cast("long") * 1000003
        + b.cast("long")
    )
    h = F.pmod(x, F.lit(_M))
    h = F.pmod(h * 48271, F.lit(_M))
    h = h.bitwiseXOR(F.shiftright(h, 15))
    h = F.pmod(h * 69621, F.lit(_M))
    return h.bitwiseXOR(F.shiftright(h, 13))


def sql_u(seed: int, tag: int, a: str, b: str) -> str:
    """DuckDB SQL text computing exactly ``_u`` (xor/>>/% on BIGINT)."""
    x = f"(({seed}::BIGINT*2654435 + {tag}*1013904 + ({a})*1000003 + ({b})) % {_M})"
    h2 = f"(({x} * 48271) % {_M})"
    h3 = f"xor({h2}, {h2} >> 15)"
    h4 = f"(({h3} * 69621) % {_M})"
    return f"xor({h4}, {h4} >> 13)"


def _pick(h, choices: list[str]):
    """h % len(choices) → categorical literal (Spark side)."""
    n = len(choices)
    m = F.pmod(h, F.lit(n))
    expr = F.lit(choices[-1])
    for i in range(n - 2, -1, -1):
        expr = F.when(m == i, F.lit(choices[i])).otherwise(expr)
    return expr


def sql_pick(h: str, choices: list[str]) -> str:
    arr = ", ".join(f"'{c}'" for c in choices)
    return f"[{arr}][(({h}) % {len(choices)}) + 1]"


def hot_turns(n_convs: int, avg_turns: int, hot_frac: float = 0.10) -> int:
    return max(avg_turns, int(n_convs * avg_turns * hot_frac))


# ---------------------------------------------------------------------------
# Spark generators (same schema/shapes as transcripts.py)
# ---------------------------------------------------------------------------


def generate_transcripts_lcg(
    spark: SparkSession,
    n_convs: int = 50,
    avg_turns: int = 100,
    seed: int = 42,
    hot_frac: float = 0.10,
    n_partitions: int | None = None,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) — conv 0 is
    the hot conversation; ~5% dup-ts ties, ~4% >30min session gaps."""
    ht = hot_turns(n_convs, avg_turns, hot_frac)
    convs = spark.range(n_convs).select(F.col("id").alias("conv_no"))
    convs = convs.withColumn(
        "n_turns",
        F.when(F.col("conv_no") == 0, F.lit(ht)).otherwise(
            F.lit(avg_turns // 2) + F.pmod(_u(seed, 1, "conv_no", 0), F.lit(avg_turns)) + 1
        ),
    )
    if n_partitions:
        convs = convs.repartition(n_partitions, "conv_no")
    t = convs.select(
        "conv_no", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx")
    )

    kind = F.pmod(_u(seed, 3, "conv_no", "turn_idx"), F.lit(100))
    h_gap = _u(seed, 2, "conv_no", "turn_idx")
    gap_ms = (
        F.when(F.col("turn_idx") == 0, F.lit(0))
        .when(kind < 5, F.lit(0))  # duplicate-ts tie
        .when(kind < 9, F.lit(1_800_000) + F.pmod(h_gap, F.lit(5_400_000)))  # session gap
        .otherwise(F.lit(1000) + F.pmod(h_gap, F.lit(599_000)))  # 1s..10min
    ).cast("long")
    w = Window.partitionBy("conv_no").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    conv_start_ms = F.lit(EPOCH_2025_MS) + F.pmod(_u(seed, 4, "conv_no", 0), F.lit(2_592_000)) * 1000
    t = t.withColumn("ts_ms", conv_start_ms + F.sum(gap_ms).over(w))

    h_role = F.pmod(_u(seed, 5, "conv_no", "turn_idx"), F.lit(100))
    role = (
        F.when((F.col("turn_idx") % 3 == 0) | (h_role < 5), F.lit("user"))
        .when(F.col("turn_idx") % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
    )
    tool = F.when(role == "tool", _pick(_u(seed, 6, "conv_no", "turn_idx"), TOOLS)).otherwise(
        F.lit(None).cast("string")
    )
    word = _pick(_u(seed, 7, "conv_no", "turn_idx"), WORDS)
    text = F.format_string(
        "msg conv_%06d:%d %s", F.col("conv_no"), F.col("turn_idx"), word
    )
    return t.select(
        F.format_string("conv_%06d", F.col("conv_no")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
    )


def generate_conv_meta_lcg(
    spark: SparkSession, n_convs: int = 50, seed: int = 42
) -> DataFrame:
    """conv_meta(conv_id, ts, model, channel, priority): ~80% coverage,
    1-5 versions interleaved with the conversation's active window."""
    convs = spark.range(n_convs).select(F.col("id").alias("conv_no"))
    covered = convs.filter(F.pmod(_u(seed, 10, "conv_no", 0), F.lit(100)) < 80)
    n_ver = F.pmod(_u(seed, 11, "conv_no", 0), F.lit(5)) + 1
    m = covered.select(
        "conv_no", F.explode(F.sequence(F.lit(0), n_ver - 1)).alias("ver")
    )
    conv_start_ms = F.lit(EPOCH_2025_MS) + F.pmod(_u(seed, 4, "conv_no", 0), F.lit(2_592_000)) * 1000
    ver_ms = (
        conv_start_ms
        - 3_600_000
        + F.col("ver").cast("long") * 7_200_000
        + F.pmod(_u(seed, 12, "conv_no", "ver"), F.lit(3_600_000))
    )
    return m.select(
        F.format_string("conv_%06d", F.col("conv_no")).alias("conv_id"),
        F.timestamp_millis(ver_ms).alias("ts"),
        _pick(_u(seed, 13, "conv_no", "ver"), MODELS).alias("model"),
        _pick(_u(seed, 14, "conv_no", "ver"), CHANNELS).alias("channel"),
        F.pmod(_u(seed, 15, "conv_no", "ver"), F.lit(4)).cast("int").alias("priority"),
    )


# ---------------------------------------------------------------------------
# DuckDB CTE twins — regenerate the identical tables inside an oracle
# ---------------------------------------------------------------------------


def duckdb_transcripts_cte(
    n_convs: int, avg_turns: int, seed: int = 42, hot_frac: float = 0.10
) -> str:
    """CTE body (``lcg_t``) producing exactly generate_transcripts_lcg,
    with ts as BIGINT epoch-ms (``ts_ms``)."""
    ht = hot_turns(n_convs, avg_turns, hot_frac)
    u_nt = sql_u(seed, 1, "conv_no", "0")
    u_kind = sql_u(seed, 3, "conv_no", "turn_idx")
    u_gap = sql_u(seed, 2, "conv_no", "turn_idx")
    u_start = sql_u(seed, 4, "conv_no", "0")
    u_role = sql_u(seed, 5, "conv_no", "turn_idx")
    u_tool = sql_u(seed, 6, "conv_no", "turn_idx")
    u_word = sql_u(seed, 7, "conv_no", "turn_idx")
    tool_pick = sql_pick(u_tool, TOOLS)
    word_pick = sql_pick(u_word, WORDS)
    return f"""
    lcg_convs AS (
      SELECT conv_no,
             CASE WHEN conv_no = 0 THEN {ht}
                  ELSE {avg_turns // 2} + ({u_nt}) % {avg_turns} + 1 END AS n_turns
      FROM (SELECT unnest(range({n_convs}))::BIGINT AS conv_no)
    ),
    lcg_rows AS (
      SELECT conv_no, unnest(range(n_turns))::BIGINT AS turn_idx FROM lcg_convs
    ),
    lcg_gaps AS (
      SELECT conv_no, turn_idx,
        CASE WHEN turn_idx = 0 THEN 0
             WHEN ({u_kind}) % 100 < 5 THEN 0
             WHEN ({u_kind}) % 100 < 9 THEN 1800000 + ({u_gap}) % 5400000
             ELSE 1000 + ({u_gap}) % 599000 END AS gap_ms,
        {EPOCH_2025_MS}::BIGINT + (({u_start}) % 2592000) * 1000 AS conv_start_ms,
        CASE WHEN turn_idx % 3 = 0 OR ({u_role}) % 100 < 5 THEN 'user'
             WHEN turn_idx % 3 = 1 THEN 'assistant' ELSE 'tool' END AS role,
        {tool_pick} AS tool0,
        {word_pick} AS word
      FROM lcg_rows
    ),
    lcg_t AS (
      SELECT printf('conv_%06d', conv_no) AS conv_id,
             turn_idx::INT AS turn_idx, role,
             printf('msg conv_%06d:%d %s', conv_no, turn_idx, word) AS text,
             CASE WHEN role = 'tool' THEN tool0 END AS tool,
             CAST(conv_start_ms + SUM(gap_ms) OVER (
               PARTITION BY conv_no ORDER BY turn_idx
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ts_ms
      FROM lcg_gaps
    )"""


def duckdb_conv_meta_cte(n_convs: int, seed: int = 42) -> str:
    """CTE body (``lcg_meta``) producing exactly generate_conv_meta_lcg
    with ts as BIGINT epoch-ms (``ts_ms``)."""
    u_cov = sql_u(seed, 10, "conv_no", "0")
    u_nv = sql_u(seed, 11, "conv_no", "0")
    u_start = sql_u(seed, 4, "conv_no", "0")
    u_off = sql_u(seed, 12, "conv_no", "ver")
    u_model = sql_pick(sql_u(seed, 13, "conv_no", "ver"), MODELS)
    u_chan = sql_pick(sql_u(seed, 14, "conv_no", "ver"), CHANNELS)
    u_prio = sql_u(seed, 15, "conv_no", "ver")
    return f"""
    lcg_mc AS (
      SELECT conv_no, ({u_nv}) % 5 + 1 AS n_ver
      FROM (SELECT unnest(range({n_convs}))::BIGINT AS conv_no)
      WHERE ({u_cov}) % 100 < 80
    ),
    lcg_mr AS (
      SELECT conv_no, unnest(range(n_ver))::BIGINT AS ver FROM lcg_mc
    ),
    lcg_meta AS (
      SELECT printf('conv_%06d', conv_no) AS conv_id,
             CAST({EPOCH_2025_MS}::BIGINT + (({u_start}) % 2592000) * 1000
               - 3600000 + ver * 7200000 + ({u_off}) % 3600000 AS BIGINT) AS ts_ms,
             {u_model} AS model, {u_chan} AS channel,
             (({u_prio}) % 4)::INT AS priority
      FROM lcg_mr
    )"""
