"""Deterministic synthetic transcripts tables (schema per FIXTURES.md).

The generator is *distributed and seed-stable*: every value is a pure
function of ``(seed, conv_id, turn_idx)`` computed with Spark-native
expressions (``xxhash64``-derived uniforms), so the same code can
materialize a 5k-row pytest fixture on ``local[2]`` or a 10^12-turn
table on a 1000-executor cluster with zero driver-side data movement.
The only window used is a per-conv cumulative sum for timestamps, which
shuffles once on conv_id — the table's natural key.

Tables (FIXTURES.md §1-3):
- ``transcripts(conv_id, turn_idx, role, text, tool, ts)`` — primary;
  one hot conversation holding ~10% of rows (skew fixture), ~5%
  duplicate-ts pairs, inactivity gaps > 30 min for sessionization.
- ``conv_meta(conv_id, ts, model, channel, priority)`` — slowly-changing
  right table for LAST JOIN; ~80% conv coverage, 1-5 versions per conv.
- ``transcripts_archive`` — same schema as transcripts, earlier time
  ranges of the same convs (WINDOW UNION secondary table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EPOCH_2025_MS = 1735689600000  # 2025-01-01T00:00:00Z in epoch ms

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()

_TOOLS = ["search", "code", "browser", "sql"]
_MODELS = ["m-a", "m-b", "m-c"]
_CHANNELS = ["web", "api", "slack"]


def _u(seed: int, *cols):
    """Deterministic uniform in [0, 1) from xxhash64 of the columns."""
    h = F.xxhash64(F.lit(seed), *cols)
    return (F.pmod(h, F.lit(1_000_003)).cast("double")) / 1_000_003.0


def _pick(u, choices: list[str]):
    """Map a uniform to a categorical literal (deterministic)."""
    n = len(choices)
    expr = F.lit(choices[-1])
    for i in range(n - 1, -1, -1):
        expr = F.when(u < (i + 1) / n, F.lit(choices[i])).otherwise(expr)
    return expr


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 50,
    avg_turns: int = 100,
    seed: int = 42,
    hot_frac: float = 0.10,
    n_partitions: int | None = None,
) -> DataFrame:
    """Primary transcripts table. conv_000000 is the hot conversation.

    ts per conv = conv_start + cumsum(gap); gaps mix 0s (dup-ts ties,
    ~5%), 1s-10min (normal), and 30min-2h (~4%, session breaks).
    """
    base_rows = n_convs * avg_turns
    hot_turns = max(avg_turns, int(base_rows * hot_frac))

    convs = spark.range(n_convs).select(
        F.format_string("conv_%06d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_no"),
    )
    # per-conv turn count: hot conv gets hot_turns; others 0.5x-1.5x avg
    u_nt = _u(seed + 1, F.col("conv_no"))
    convs = convs.withColumn(
        "n_turns",
        F.when(F.col("conv_no") == 0, F.lit(hot_turns)).otherwise(
            (avg_turns / 2 + (u_nt * avg_turns)).cast("int") + 1
        ),
    )
    if n_partitions:
        convs = convs.repartition(n_partitions, "conv_id")

    t = convs.select(
        "conv_id",
        "conv_no",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    u_gap = _u(seed + 2, F.col("conv_id"), F.col("turn_idx"))
    u_kind = _u(seed + 3, F.col("conv_id"), F.col("turn_idx"))
    gap_s = (
        F.when(F.col("turn_idx") == 0, F.lit(0.0))
        .when(u_kind < 0.05, F.lit(0.0))  # duplicate-ts tie
        .when(u_kind < 0.09, 1800.0 + u_gap * 5400.0)  # 30min..2h session gap
        .otherwise(1.0 + u_gap * 599.0)  # 1s..10min
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    conv_start_ms = F.lit(EPOCH_2025_MS) + F.pmod(
        F.xxhash64(F.lit(seed + 4), F.col("conv_id")), F.lit(30 * 86400)
    ) * 1000
    t = t.withColumn("ts_ms", conv_start_ms + (F.sum(gap_s).over(w) * 1000).cast("long"))

    u_role = _u(seed + 5, F.col("conv_id"), F.col("turn_idx"))
    role = (
        F.when((F.col("turn_idx") % 3 == 0) | (u_role < 0.05), F.lit("user"))
        .when(F.col("turn_idx") % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
    )
    u_tool = _u(seed + 6, F.col("conv_id"), F.col("turn_idx"))
    tool = F.when(role == "tool", _pick(u_tool, _TOOLS)).otherwise(F.lit(None).cast("string"))

    word_idx = F.pmod(F.xxhash64(F.lit(seed + 7), F.col("conv_id"), F.col("turn_idx")), F.lit(len(_WORDS)))
    words_arr = F.array(*[F.lit(wd) for wd in _WORDS])
    text = F.format_string(
        "msg %s:%d %s",
        F.col("conv_id"),
        F.col("turn_idx"),
        F.element_at(words_arr, (word_idx + 1).cast("int")),
    )

    return t.select(
        F.col("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
    )


def generate_conv_meta(
    spark: SparkSession, n_convs: int = 50, seed: int = 42
) -> DataFrame:
    """Slowly-changing per-conv attributes; ~80% conv coverage, 1-5 versions."""
    convs = spark.range(n_convs).select(
        F.format_string("conv_%06d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_no"),
    )
    covered = convs.filter(_u(seed + 10, F.col("conv_no")) < 0.80)
    n_ver = (1 + _u(seed + 11, F.col("conv_no")) * 5).cast("int")
    m = covered.select(
        "conv_id",
        "conv_no",
        F.explode(F.sequence(F.lit(0), n_ver - 1)).alias("ver"),
    )
    conv_start_ms = F.lit(EPOCH_2025_MS) + F.pmod(
        F.xxhash64(F.lit(seed + 4), F.col("conv_id")), F.lit(30 * 86400)
    ) * 1000
    # versions interleave with turn timestamps: one before conv start,
    # later ones spread across the conversation's active window
    u_off = _u(seed + 12, F.col("conv_id"), F.col("ver"))
    ver_ms = (
        conv_start_ms
        - 3600_000
        + (F.col("ver").cast("long") * 7200_000)
        + (u_off * 3600_000).cast("long")
    )
    return m.select(
        "conv_id",
        F.timestamp_millis(ver_ms).alias("ts"),
        _pick(_u(seed + 13, F.col("conv_id"), F.col("ver")), _MODELS).alias("model"),
        _pick(_u(seed + 14, F.col("conv_id"), F.col("ver")), _CHANNELS).alias("channel"),
        (_u(seed + 15, F.col("conv_id"), F.col("ver")) * 4).cast("int").alias("priority"),
    )


def generate_archive(
    spark: SparkSession,
    n_convs: int = 50,
    avg_turns: int = 30,
    seed: int = 42,
) -> DataFrame:
    """WINDOW UNION secondary table: same schema, earlier ts ranges.

    Rows sit strictly before each conv's first primary turn (minus a
    small overlap fraction at exactly conv_start for tie-break tests):
    archive turn k of conv c gets ts = conv_start - (n-k)*120s, with ~3%
    of rows at exactly conv_start (overlapping-ts tie rows).
    """
    convs = spark.range(n_convs).select(
        F.format_string("conv_%06d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_no"),
    )
    n_turns = (avg_turns / 2 + _u(seed + 20, F.col("conv_no")) * avg_turns).cast("int") + 1
    t = convs.select(
        "conv_id",
        "conv_no",
        F.lit(n_turns).alias("n_turns"),
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    )
    conv_start_ms = F.lit(EPOCH_2025_MS) + F.pmod(
        F.xxhash64(F.lit(seed + 4), F.col("conv_id")), F.lit(30 * 86400)
    ) * 1000
    u_tie = _u(seed + 21, F.col("conv_id"), F.col("turn_idx"))
    ts_ms = F.when(u_tie < 0.03, conv_start_ms).otherwise(
        conv_start_ms - (F.col("n_turns") - F.col("turn_idx")).cast("long") * 120_000
    )
    u_role = _u(seed + 22, F.col("conv_id"), F.col("turn_idx"))
    role = _pick(u_role, ["user", "assistant", "tool"])
    tool = F.when(
        role == "tool", _pick(_u(seed + 23, F.col("conv_id"), F.col("turn_idx")), _TOOLS)
    ).otherwise(F.lit(None).cast("string"))
    text = F.format_string("arch %s:%d", F.col("conv_id"), F.col("turn_idx"))
    # archive turn_idx is negative so (conv_id, turn_idx) stays unique
    return t.select(
        "conv_id",
        (-1 - F.col("turn_idx")).cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_millis(ts_ms).alias("ts"),
    )
