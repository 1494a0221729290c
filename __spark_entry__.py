"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (window frames, LAST JOIN, sessionization, group/filter/
sort/union relational ops, skew-salted windows) plus the training-data
pipeline ops (dedup, similarity, text analysis) and the transcript
backfill/request flagships. EVERY query has a DuckDB oracle in
``oracle_sql()`` — discovery-style ops emit their exact-verified
stage, transcript flagships run on the SQL-replicable LCG generator
(data/lcg.py) so the oracle regenerates the inputs as CTEs, and the
simhash/LSH oracles recompute the identical hashes (portable md5_60
fingerprints / embedded hyperplane constants).

Column-name and type parity with the oracles is deliberate: every
float is rounded to 6 dp on BOTH sides, counts are BIGINT on both.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _r6(c):
    return F.round(c, 6)


# ---------------------------------------------------------------------------
# window frames over events(user_id, ts, event_type, value)
# ---------------------------------------------------------------------------


def q_rows_window(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows", 5, tiebreak=["event_id"])
    out = window_agg(ev, spec, [
        Agg("count", None, "cnt6"),
        Agg("sum", "value", "sum6"),
        Agg("min", "value", "min6"),
        Agg("max", "value", "max6"),
    ], impl="native")
    return out.select("event_id", "user_id", "cnt6", _r6("sum6").alias("sum6"),
                      _r6("min6").alias("min6"), _r6("max6").alias("max6"))


def q_rows_range_window(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows_range", 600_000, tiebreak=["event_id"])
    # auto now routes to the tie-corrected native ROWS_RANGE plan
    # (cum-minus-before along buffer order): zero Python, one exchange
    out = window_agg(ev, spec, [
        Agg("count", "value", "cnt_10m"),
        Agg("sum", "value", "sum_10m"),
    ], impl="auto")
    return out.select("event_id", "user_id", "cnt_10m", _r6("sum_10m").alias("sum_10m"))


def q_rows_range_maxsize(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows_range", 1_800_000, maxsize=5, tiebreak=["event_id"])
    out = window_agg(ev, spec, [
        Agg("count", "value", "cnt_ms"),
        Agg("sum", "value", "sum_ms"),
    ], impl="kernel")
    return out.select("event_id", "user_id", "cnt_ms", _r6("sum_ms").alias("sum_ms"))


def q_window_exclude_current_time(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows_range", 1_800_000,
                      exclude_current_time=True, tiebreak=["event_id"])
    out = window_agg(ev, spec, [
        Agg("count", "value", "cnt_ect"),
        Agg("sum", "value", "sum_ect"),
    ], impl="auto")  # native ECT plan: strict range + current row
    return out.select("event_id", "user_id", "cnt_ect", _r6("sum_ect").alias("sum_ect"))


def q_window_open_preceding(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows_range", 1_800_000,
                      open_preceding=True, tiebreak=["event_id"])
    out = window_agg(ev, spec, [
        Agg("count", "value", "cnt_op"),
        Agg("sum", "value", "sum_op"),
    ], impl="auto")  # native OPEN-start range plan
    return out.select("event_id", "user_id", "cnt_op", _r6("sum_op").alias("sum_op"))


def q_rows_between(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows", 10, end_preceding=2, tiebreak=["event_id"])
    out = window_agg(ev, spec, [
        Agg("count", "value", "cnt_b"),
        Agg("sum", "value", "sum_b"),
    ], impl="auto")  # native end-offset ROWS frame
    return out.select("event_id", "user_id", "cnt_b", _r6("sum_b").alias("sum_b"))


def q_lag_lead(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lag("event_type", 2).over(w).alias("prev2_type"),
        F.lead("event_type", 1).over(w).alias("next_type"),
    )


def q_distinct_count_window(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows", 20, tiebreak=["event_id"])
    out = window_agg(ev, spec, [Agg("distinct_count", "event_type", "dct")], impl="auto")  # native small-frame dc (shared-sort array_distinct)
    return out.select("event_id", "user_id", "dct")


def q_entropy_window(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows", 20, tiebreak=["event_id"])
    out = window_agg(ev, spec, [Agg("entropy", "event_type", "ent")], impl="kernel")
    return out.select("event_id", "user_id", _r6("ent").alias("ent"))


def q_cate_window(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows", 10, tiebreak=["event_id"])
    out = window_agg(ev, spec, [Agg("count_cate", "value", "cc", cate="event_type")], impl="kernel")
    return out.select("event_id", "user_id", "cc")


def q_where_window(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events").withColumn("big", F.col("value") > 100)
    spec = WindowSpec(["user_id"], "ts", "rows_range", 3_600_000, tiebreak=["event_id"])
    out = window_agg(ev, spec, [
        Agg("count_where", "value", "cw", cond="big"),
        Agg("sum_where", "value", "sw", cond="big"),
    ], impl="auto")
    return out.select("event_id", "user_id", "cw", _r6("sw").alias("sw"))


def q_ew_avg_window(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows", 10, tiebreak=["event_id"])
    out = window_agg(ev, spec, [Agg("ew_avg", "value", "ew", param=0.5)], impl="kernel")
    return out.select("event_id", "user_id", _r6("ew").alias("ew"))


def q_stat_windows(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows", 20, tiebreak=["event_id"])
    out = window_agg(ev, spec, [
        Agg("stddev", "value", "sd"),
        Agg("var", "value", "vr"),
        Agg("median", "value", "med"),
    ], impl="auto")  # native: stddev/var ANSI + small-frame sorted-list median
    # +1e-9 before rounding: the 2-decimal source data makes variance
    # values land exactly on .5 rounding boundaries, where engines'
    # half-rounding conventions differ
    return out.select(
        "event_id", "user_id",
        F.round(F.col("sd") + 1e-9, 6).alias("sd"),
        F.round(F.col("vr") + 1e-9, 6).alias("vr"),
        _r6("med").alias("med"),
    )


def q_drawdown_window(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows", 20, tiebreak=["event_id"])
    out = window_agg(ev, spec, [Agg("drawdown", "value", "dd")], impl="kernel")
    return out.select("event_id", "user_id", _r6("dd").alias("dd"))


def q_first_value_window(spark, sf_dir):
    """reference first_value = NEWEST value in frame; with EXCLUDE
    CURRENT_ROW that is the previous row's value (≡ lag 1)."""
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows", 5, exclude_current_row=True,
                      tiebreak=["event_id"])
    out = window_agg(ev, spec, [Agg("first_value", "value", "fv")], impl="auto")
    return out.select("event_id", "user_id", _r6("fv").alias("fv"))


def q_skewed_window(spark, sf_dir):
    from openmldb_spark.operators.skew import window_agg_skewed
    from openmldb_spark.operators.window import Agg, WindowSpec

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows_range", 1_800_000, tiebreak=["event_id"])
    out = window_agg_skewed(ev, spec, [
        Agg("count", "value", "cnt_sk"),
        Agg("sum", "value", "sum_sk"),
    ], quantiles=3, hot_threshold=10)
    return out.select("event_id", "user_id", "cnt_sk", _r6("sum_sk").alias("sum_sk"))


def q_bounded_range_window(spark, sf_dir):
    """Bounded ROWS_RANGE via the skew-free prefix-subtraction plan
    (long_window.long_window_agg_bounded): cum − before-frame-start
    over bucketed partials, (key,bucket)-parallel, zero replication —
    the hot-key plan for bounded ms windows at 10^12 turns."""
    from openmldb_spark.operators.skew import window_agg_skewed
    from openmldb_spark.operators.window import Agg, WindowSpec

    ev = _t(spark, sf_dir, "events")
    spec = WindowSpec(["user_id"], "ts", "rows_range", 1_800_000,
                      tiebreak=["event_id"])
    out = window_agg_skewed(ev, spec, [
        Agg("sum", "event_id", "sum_id_30m"),
        Agg("count", None, "cnt_30m"),
        Agg("avg", "event_id", "avg_id_30m"),
    ], quantiles=4, hot_threshold=10, native_when_cold=False,
       bounded_impl="subtract")
    return out.select("event_id", "user_id", "sum_id_30m", "cnt_30m",
                      _r6("avg_id_30m").alias("avg_id_30m"))


def q_window_union(spark, sf_dir):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events")
    primary = ev.filter(F.col("event_type") == "purchase")
    secondary = ev.filter(F.col("event_type") != "purchase")
    spec = WindowSpec(["user_id"], "ts", "rows_range", 1_800_000, tiebreak=["event_id"])
    out = window_agg(primary, spec, [
        Agg("count", "value", "cnt_u"),
        Agg("sum", "value", "sum_u"),
    ], union=[secondary], impl="auto")  # native WINDOW UNION plan
    return out.select("event_id", "user_id", "cnt_u", _r6("sum_u").alias("sum_u"))


# ---------------------------------------------------------------------------
# joins / sessionization / relational core
# ---------------------------------------------------------------------------


def q_last_join_asof(spark, sf_dir):
    from openmldb_spark.operators.last_join import last_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("value").alias("click_value"),
        F.col("event_id").alias("click_id"),
    )
    out = last_join(
        purchases, clicks, on=["user_id"], order_by="cts",
        asof_left_ts="ts", asof_right_ts="cts", how="union_asof",
    )
    return out.select("event_id", "user_id", "click_id", _r6("click_value").alias("click_value"))


def q_last_join_ordered(spark, sf_dir):
    from openmldb_spark.operators.last_join import last_join

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_quantity")
    )
    out = last_join(
        orders, li, on=[("o_orderkey", "l_orderkey")], order_by="l_linenumber",
        how="shuffle",
    )
    return out.select("o_orderkey", "l_linenumber", _r6("l_quantity").alias("last_qty"))


def q_sessionize(spark, sf_dir):
    from openmldb_spark.operators.sessionize import sessionize

    ev = _t(spark, sf_dir, "events")
    out = sessionize(ev, "user_id", "ts", gap=1800.0, tiebreak=["event_id"])
    return out.select("event_id", "user_id", "session_id")


def q_group_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # wide sums round to 2 dp: double summation order differs between
    # engines (~1e-5 abs at this magnitude), 6 dp would flap
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            _r6(F.avg("l_quantity")).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_filter_project(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") < "1996-01-01") & (F.col("l_quantity") > 30))
        .select(
            "l_orderkey", "l_linenumber",
            _r6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.upper("l_returnflag").alias("flag_u"),
        )
    )


def q_sort_limit(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", _r6("o_totalprice").alias("o_totalprice"))
    )


def q_union_distinct(spark, sf_dir):
    n = _t(spark, sf_dir, "nation").select(F.col("n_regionkey").alias("k"))
    r = _t(spark, sf_dir, "region").select(F.col("r_regionkey").alias("k"))
    return n.union(r).distinct()


# ---------------------------------------------------------------------------
# training-data pipeline ops
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    from openmldb_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id", normalized=False).select("doc_id", "text")


def q_text_stats(spark, sf_dir):
    from openmldb_spark.operators.text import quality_features

    docs = _t(spark, sf_dir, "documents")
    f = quality_features("text")
    return docs.select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        f["n_tokens"].alias("n_tokens"),
        _r6(f["punct_ratio"]).alias("punct_ratio"),
        _r6(f["upper_ratio"]).alias("upper_ratio"),
        _r6(f["digit_ratio"]).alias("digit_ratio"),
    )


def q_fingerprint_groups(spark, sf_dir):
    from openmldb_spark.operators.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(fingerprint("text").alias("fp"))
        .groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    )


def q_similarity_topk(spark, sf_dir):
    from openmldb_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk(emb, queries, k=5)
    return out.select("query_id", "vec_id", _r6("cosine").alias("cosine"),
                      F.col("rank").cast("long").alias("rank"))


def q_minhash_pairs(spark, sf_dir):
    """MinHash+LSH discovery, exact-Jaccard verified output: because
    the emitted rows are the VERIFIED stage (exact shingle Jaccard ≥ τ
    over candidates), the DuckDB all-pairs oracle checks them in full —
    a green hash additionally proves LSH recall = 1 on this corpus
    (every true pair J ≥ 0.89 here; band miss prob ≤ (1-J²)^16 ≈ 5e-11)."""
    from openmldb_spark.operators.dedup import minhash_dedup

    docs = _t(spark, sf_dir, "documents")
    out = minhash_dedup(docs, num_hashes=32, bands=16, jaccard_threshold=0.5)
    return out.select("id_a", "id_b", _r6("jaccard").alias("jaccard"))


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs with the portable md5-derived 60-bit
    fingerprint — the DuckDB oracle recomputes the identical simhashes
    (standard MD5 both sides) and does the exact all-pairs hamming
    join; segment bucketing is pigeonhole-exact so the outputs match
    in full, not just on sampled pairs."""
    from openmldb_spark.operators.dedup import simhash_dedup

    docs = _t(spark, sf_dir, "documents")
    return simhash_dedup(docs, max_hamming=3, hash_fn="md5_60")


def q_lsh_topk(spark, sf_dir):
    from openmldb_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = lsh_topk(emb, queries, k=5, n_planes=8, n_probes=4)
    return out.select("query_id", "vec_id", _r6("cosine").alias("cosine"),
                      F.col("rank").cast("long").alias("rank"))


def q_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard pairs (dedup.ngram_jaccard_pairs):
    shingle explode + shared-shingle self-join — the verification
    primitive behind minhash_pairs (quadratic only WITHIN shared-
    shingle buckets; minhash is the discovery path at scale). Same
    DuckDB oracle as minhash_pairs: both must emit the exact τ≥0.5
    pair set."""
    from openmldb_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, threshold=0.5)
    return out.select("id_a", "id_b", _r6("jaccard").alias("jaccard"))


def q_cosine_dedup(spark, sf_dir):
    """Embedding near-dup pairs: random-hyperplane sign-bucket LSH +
    exact cosine verify (dedup.embedding_cosine_dedup — ONE bucket per
    vector, oversized buckets sub-bucketed by extra sign bits, never
    silently dropped). Oracle recomputes the same seeded planes and
    the same bucket join in DuckDB."""
    from openmldb_spark.operators.dedup import embedding_cosine_dedup

    emb = _t(spark, sf_dir, "embeddings")
    out = embedding_cosine_dedup(emb, threshold=0.30, n_planes=8,
                                 seed=42, dim=64)
    return out.select("id_a", "id_b", _r6("cosine").alias("cosine"))


def _cosine_dedup_oracle() -> str:
    import numpy as np

    planes = np.random.default_rng(42).standard_normal((16, 64))
    sig_terms = " + ".join(
        f"(CASE WHEN list_inner_product(v, "
        f"[{', '.join(repr(float(x)) for x in planes[i])}]) > 0 "
        f"THEN {1 << i}::BIGINT ELSE 0 END)"
        for i in range(8)
    )
    return f"""
        WITH c AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        cs AS (
          SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS n,
                 {sig_terms} AS b
          FROM c
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_inner_product(a.v, b.v) / (a.n * b.n), 6) AS cosine
        FROM cs a JOIN cs b ON a.b = b.b AND a.vec_id < b.vec_id
        WHERE list_inner_product(a.v, b.v) / (a.n * b.n) >= 0.30
    """


def _backfill_scale(sf_dir: str) -> tuple[int, int]:
    return {"sf0.001": (20, 40), "sf0.01": (100, 80)}.get(
        sf_dir.rstrip("/").rsplit("/", 1)[-1], (50, 60)
    )


def q_backfill_transcripts(spark, sf_dir):
    """Flagship: full point-in-time feature backfill (as-of LAST JOIN +
    rows-window features + sessionize) over the SQL-replicable LCG
    transcripts — the DuckDB oracle regenerates the identical input as
    a CTE, so the whole feature vector is value-hash checked.

    Timestamps are emitted as epoch-ms BIGINTs so the compare is
    session-timezone-independent on both sides."""
    from openmldb_spark.data.lcg import generate_conv_meta_lcg, generate_transcripts_lcg
    from openmldb_spark.operators.window import Agg, WindowSpec
    from openmldb_spark.plans.backfill import AsOfSource, FeatureWindow, backfill_features

    scale = _backfill_scale(sf_dir)
    t = generate_transcripts_lcg(spark, n_convs=scale[0], avg_turns=scale[1], seed=42)
    meta = generate_conv_meta_lcg(spark, n_convs=scale[0], seed=42)
    primary = t.withColumn("__is_tool__", F.col("role") == "tool")
    fw = FeatureWindow(
        spec=WindowSpec(["conv_id"], "ts", "rows", 10, tiebreak=["turn_idx"]),
        aggs=[
            Agg("count_where", "turn_idx", "n_tool_calls_10", cond="__is_tool__"),
            Agg("distinct_count", "tool", "n_distinct_tools_10"),
            Agg("lag", "tool", "prev_tool", n=1),
            Agg("lag", "role", "prev_role", n=1),
        ],
    )
    out = backfill_features(
        primary, "ts", [fw],
        asof=[AsOfSource(meta, on=["conv_id"], right_ts="ts", prefix="m_")],
        session_key="conv_id", session_gap=1800.0, session_tiebreak=["turn_idx"],
    )
    return out.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        "n_tool_calls_10", "n_distinct_tools_10", "prev_tool", "prev_role",
        F.unix_millis("m_ts").alias("m_ts_ms"),
        "m_model", "m_channel", "m_priority", "session_id",
    )


def q_request_transcripts(spark, sf_dir):
    """Request-mode features (plans/request.py — the reference's online
    request mode as a batch surface): the newest turn of every conv is
    the REQUEST row, everything earlier is stored history; features =
    rows-10 window over history ∪ request (native WINDOW UNION plan)
    + as-of meta join at the request anchor. Same LCG inputs as
    backfill_transcripts, so the oracle regenerates them as CTEs and
    checks full values."""
    from pyspark.sql import Window

    from openmldb_spark.data.lcg import generate_conv_meta_lcg, generate_transcripts_lcg
    from openmldb_spark.operators.window import Agg, WindowSpec
    from openmldb_spark.plans.backfill import AsOfSource, FeatureWindow
    from openmldb_spark.plans.request import request_features

    scale = _backfill_scale(sf_dir)
    t = generate_transcripts_lcg(spark, n_convs=scale[0], avg_turns=scale[1], seed=42)
    meta = generate_conv_meta_lcg(spark, n_convs=scale[0], seed=42)
    t = t.withColumn("__is_tool__", F.col("role") == "tool")
    rn = F.row_number().over(
        Window.partitionBy("conv_id").orderBy(F.desc("ts"), F.desc("turn_idx")))
    tagged = t.withColumn("__rn__", rn)
    requests = tagged.filter(F.col("__rn__") == 1).drop("__rn__")
    history = tagged.filter(F.col("__rn__") > 1).drop("__rn__")
    fw = FeatureWindow(
        spec=WindowSpec(["conv_id"], "ts", "rows", 10, tiebreak=["turn_idx"]),
        aggs=[
            Agg("count_where", "turn_idx", "n_tool_calls_10", cond="__is_tool__"),
            Agg("distinct_count", "tool", "n_distinct_tools_10"),
            Agg("lag", "tool", "prev_tool", n=1),
        ],
    )
    out = request_features(
        requests, history, "ts", [fw],
        asof=[AsOfSource(meta, on=["conv_id"], right_ts="ts", prefix="m_")],
    )
    return out.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        "n_tool_calls_10", "n_distinct_tools_10", "prev_tool",
        F.unix_millis("m_ts").alias("m_ts_ms"),
        "m_model", "m_channel", "m_priority",
    )


def q_nth_value_where_window(spark, sf_dir):
    """nth_value_where (window_functions_def.cc:283): 2nd matching row
    from the frame start, matches = event_type = 'click'."""
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events").withColumn("is_click", F.col("event_type") == "click")
    spec = WindowSpec(["user_id"], "ts", "rows", 10, tiebreak=["event_id"])
    out = window_agg(ev, spec, [
        Agg("nth_value_where", "value", "nv2", cond="is_click", n=2),
        Agg("nth_value_where", "value", "nv_last", cond="is_click", n=-1),
    ], impl="kernel")
    return out.select("event_id", "user_id", _r6("nv2").alias("nv2"),
                      _r6("nv_last").alias("nv_last"))


def q_topn_cate_window(spark, sf_dir):
    """top_n_key_count_cate_where + top1_ratio + topn_frequency
    (agg_by_category_def.cc / feature_zero_def.cc)."""
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events").withColumn("big", F.col("value") > 100)
    spec = WindowSpec(["user_id"], "ts", "rows", 10, tiebreak=["event_id"])
    out = window_agg(ev, spec, [
        Agg("top_n_key_count_cate_where", "value", "tkc", cond="big",
            cate="event_type", n=2),
        Agg("top1_ratio", "event_type", "t1r"),
        Agg("topn_frequency", "event_type", "tf", n=2),
    ], impl="kernel")
    return out.select("event_id", "user_id", "tkc", _r6("t1r").alias("t1r"), "tf")


def q_fz_split_window(spark, sf_dir):
    """Feature-zero window splits (feature_zero_def.cc): per-row kv
    strings split across the frame, newest-first concatenation."""
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    ev = _t(spark, sf_dir, "events").withColumn(
        "kv", F.concat_ws(":", F.col("event_type"), F.col("event_id").cast("string")))
    spec = WindowSpec(["user_id"], "ts", "rows", 5, tiebreak=["event_id"])
    out = window_agg(ev, spec, [
        Agg("join", "kv", "keys_j", split=("split_by_key", ",", ":"), sep=" "),
        Agg("count", "kv", "tok_cnt", split=("split", ",", None)),
        Agg("distinct_count", "kv", "key_dc", split=("split_by_key", ",", ":")),
    ], impl="kernel")
    return out.select("event_id", "user_id", "keys_j", "tok_cnt", "key_dc")


def q_long_window_unbounded(spark, sf_dir):
    """Long-window pre-aggregation (long_window_optimized.cc analogue):
    UNBOUNDED cumulative aggregates via bucketed partials + carry-in —
    fully native, no per-key single-task bottleneck."""
    from openmldb_spark.operators.long_window import long_window_agg
    from openmldb_spark.operators.window import Agg, WindowSpec

    ev = _t(spark, sf_dir, "events")
    # exact fixed-point sums: double addition is non-associative, so the
    # bucketed recombination could land on ROUND half-boundaries a digit
    # off from a sequential cumsum; decimal sums are exact + associative
    # on both the Spark and the DuckDB-oracle side (VERDICT r2 #1)
    ev = ev.withColumn("value_dec", F.col("value").cast("decimal(20,6)"))
    spec = WindowSpec(["user_id"], "ts", "rows", None, tiebreak=["event_id"])
    out = long_window_agg(ev, spec, [
        Agg("sum", "value_dec", "cum_sum"),
        Agg("count", "value", "cum_cnt"),
        Agg("min", "value", "cum_min"),
        Agg("max", "value", "cum_max"),
        Agg("avg", "value_dec", "cum_avg"),
    ], bucket_ms=3_600_000)
    return out.select("event_id", "user_id",
                      _r6(F.col("cum_sum").cast("double")).alias("cum_sum"),
                      "cum_cnt", _r6("cum_min").alias("cum_min"),
                      _r6("cum_max").alias("cum_max"), _r6("cum_avg").alias("cum_avg"))


def q_preagg_incremental(spark, sf_dir):
    """Materialized incremental pre-agg (src/storage/aggregator.h:40-56
    analogue, operators/preagg.py): bucket partials for the older half
    of events are persisted once; the newer half is APPENDED — O(new)
    work, carry state read from the materialized partials instead of
    rescanning history. Features for the appended rows must equal the
    plain UNBOUNDED window over the full table (the oracle)."""
    import tempfile

    from openmldb_spark.operators.preagg import PreAggTable
    from openmldb_spark.operators.window import Agg, WindowSpec

    ev = _t(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(20,6)"))
    # split boundary: one metadata-sized driver scalar, same integer
    # arithmetic as the oracle CTE
    mm = ev.agg(F.min(F.unix_millis(F.col("ts").cast("timestamp"))).alias("lo"),
                F.max(F.unix_millis(F.col("ts").cast("timestamp"))).alias("hi")).first()
    mid = (mm["lo"] + mm["hi"]) // 2

    spec = WindowSpec(["user_id"], "ts", "rows", None, tiebreak=["event_id"])
    aggs = [Agg("sum", "value_dec", "cum_sum"), Agg("count", "value", "cum_cnt"),
            Agg("min", "value", "cum_min"), Agg("max", "value", "cum_max")]
    state = tempfile.mkdtemp(prefix="omldb_preagg_") + "/state"
    t = PreAggTable.create(spark, state, spec, aggs, bucket_ms=3_600_000)
    t.append(ev.filter(F.unix_millis(F.col("ts").cast("timestamp")) <= mid))          # history → partials
    out = t.append(ev.filter(F.unix_millis(F.col("ts").cast("timestamp")) > mid))     # incremental slice
    return out.select(
        "event_id", "user_id",
        _r6(F.col("cum_sum").cast("double")).alias("cum_sum"),
        "cum_cnt", _r6("cum_min").alias("cum_min"), _r6("cum_max").alias("cum_max"))


def q_iceberg_scan(spark, sf_dir):
    """The north star's Iceberg surface, executed: events committed to
    an iceberg-lite table (sources/iceberg_lite.py) in three snapshots
    split by event_id range, read back via a metadata-planned scan that
    prunes whole files from parquet-footer min/max stats (no directory
    listing), then aggregated. Oracle = the same aggregate over the raw
    parquet: green hash proves snapshot read == source data AND that
    pruning dropped no qualifying file. (Real-runtime path:
    tests/test_iceberg_integration.py; reference
    docs/en/integration/offline_data_sources/iceberg.md.)"""
    import tempfile

    from openmldb_spark.sources.iceberg_lite import IcebergLiteTable

    ev = _t(spark, sf_dir, "events")
    # one driver-side scalar (the split boundary) — metadata-sized, not
    # a data collect; same FLOOR(max/3) expression as the oracle
    m = ev.agg(F.max("event_id")).first()[0]
    b = int(m // 3)
    loc = tempfile.mkdtemp(prefix="omldb_ice_scan_") + "/events"
    t = IcebergLiteTable.create(loc, ev.schema)
    t.append(ev.filter(F.col("event_id") <= b))
    t.append(ev.filter((F.col("event_id") > b) & (F.col("event_id") <= 2 * b)))
    t.append(ev.filter(F.col("event_id") > 2 * b))
    scan = t.read(spark, predicates={"event_id": (None, b)})
    return (
        scan.filter(F.col("event_id") <= b)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             # 2 dp: double sums are order-sensitive across engines
             F.round(F.sum("value"), 2).alias("sum_v"),
             F.max("event_id").alias("max_id"))
    )


def q_left_join(spark, sf_dir):
    """Plain LEFT JOIN through the SQL front-end (JoinPlan.scala:159)."""
    from openmldb_spark.sql import SqlEngine

    eng = SqlEngine(spark)
    eng.register("nation", _t(spark, sf_dir, "nation"))
    eng.register("region", _t(spark, sf_dir, "region"))
    out = eng.sql(
        "select n_nationkey, n_name, r_name from nation "
        "left join region on nation.n_regionkey = region.r_regionkey "
        "and region.r_regionkey < 3"
    )
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_backfill_transcripts(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rows_window": q_rows_window,
        "rows_range_window": q_rows_range_window,
        "rows_range_maxsize": q_rows_range_maxsize,
        "window_exclude_current_time": q_window_exclude_current_time,
        "window_open_preceding": q_window_open_preceding,
        "rows_between": q_rows_between,
        "lag_lead": q_lag_lead,
        "distinct_count_window": q_distinct_count_window,
        "entropy_window": q_entropy_window,
        "cate_window": q_cate_window,
        "where_window": q_where_window,
        "ew_avg_window": q_ew_avg_window,
        "stat_windows": q_stat_windows,
        "drawdown_window": q_drawdown_window,
        "first_value_window": q_first_value_window,
        "skewed_window": q_skewed_window,
        "bounded_range_window": q_bounded_range_window,
        "window_union": q_window_union,
        "last_join_asof": q_last_join_asof,
        "last_join_ordered": q_last_join_ordered,
        "sessionize": q_sessionize,
        "group_agg": q_group_agg,
        "filter_project": q_filter_project,
        "sort_limit": q_sort_limit,
        "union_distinct": q_union_distinct,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "fingerprint_groups": q_fingerprint_groups,
        "similarity_topk": q_similarity_topk,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "lsh_topk": q_lsh_topk,
        "cosine_dedup": q_cosine_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "backfill_transcripts": q_backfill_transcripts,
        "request_transcripts": q_request_transcripts,
        "long_window_unbounded": q_long_window_unbounded,
        "preagg_incremental": q_preagg_incremental,
        "nth_value_where_window": q_nth_value_where_window,
        "topn_cate_window": q_topn_cate_window,
        "fz_split_window": q_fz_split_window,
        "left_join": q_left_join,
        "iceberg_scan": q_iceberg_scan,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles — buffer-order window semantics expressed with
# correlated subqueries over a row_number CTE (rn = buffer position)
# ---------------------------------------------------------------------------

_RN_CTE = """
WITH r AS (
  SELECT event_id, user_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "rows_window": """
            SELECT event_id, user_id,
                   COUNT(*) OVER w AS cnt6,
                   ROUND(SUM(value) OVER w, 6) AS sum6,
                   ROUND(MIN(value) OVER w, 6) AS min6,
                   ROUND(MAX(value) OVER w, 6) AS max6
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
        """,
        "rows_range_window": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              (SELECT COUNT(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 10 MINUTE AND v.rn <= a.rn) AS cnt_10m,
              ROUND((SELECT SUM(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 10 MINUTE AND v.rn <= a.rn), 6) AS sum_10m
            FROM r a
        """,
        "rows_range_maxsize": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              (SELECT COUNT(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 30 MINUTE
                 AND v.rn <= a.rn AND v.rn >= a.rn - 4) AS cnt_ms,
              ROUND((SELECT SUM(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 30 MINUTE
                 AND v.rn <= a.rn AND v.rn >= a.rn - 4), 6) AS sum_ms
            FROM r a
        """,
        "window_exclude_current_time": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              (SELECT COUNT(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 30 MINUTE
                 AND (v.ts < a.ts OR v.rn = a.rn)) AS cnt_ect,
              ROUND((SELECT SUM(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 30 MINUTE
                 AND (v.ts < a.ts OR v.rn = a.rn)), 6) AS sum_ect
            FROM r a
        """,
        "window_open_preceding": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              (SELECT COUNT(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts > a.ts - INTERVAL 30 MINUTE AND v.rn <= a.rn) AS cnt_op,
              ROUND((SELECT SUM(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts > a.ts - INTERVAL 30 MINUTE AND v.rn <= a.rn), 6) AS sum_op
            FROM r a
        """,
        "rows_between": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              (SELECT COUNT(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.rn BETWEEN a.rn - 10 AND a.rn - 2) AS cnt_b,
              ROUND((SELECT SUM(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.rn BETWEEN a.rn - 10 AND a.rn - 2), 6) AS sum_b
            FROM r a
        """,
        "lag_lead": """
            SELECT event_id, user_id,
                   LAG(value, 1) OVER w AS prev_value,
                   LAG(event_type, 2) OVER w AS prev2_type,
                   LEAD(event_type, 1) OVER w AS next_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "distinct_count_window": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              (SELECT COUNT(DISTINCT v.event_type) FROM r v WHERE v.user_id=a.user_id
                 AND v.rn BETWEEN a.rn - 20 AND a.rn) AS dct
            FROM r a
        """,
        "entropy_window": _RN_CTE + """,
            pairs AS (
              SELECT a.event_id, a.user_id, v.event_type, COUNT(*) AS c
              FROM r a JOIN r v ON v.user_id = a.user_id
                AND v.rn BETWEEN a.rn - 20 AND a.rn
              GROUP BY 1, 2, 3
            ),
            tot AS (SELECT event_id, user_id, SUM(c) AS t FROM pairs GROUP BY 1, 2)
            SELECT p.event_id, p.user_id,
                   ROUND(-SUM((p.c * 1.0 / t.t) * LOG2(p.c * 1.0 / t.t)) + 0.0, 6) AS ent
            FROM pairs p JOIN tot t USING (event_id, user_id)
            GROUP BY p.event_id, p.user_id
        """,
        "cate_window": _RN_CTE + """,
            pairs AS (
              SELECT a.event_id, a.user_id, v.event_type, COUNT(v.value) AS c
              FROM r a JOIN r v ON v.user_id = a.user_id
                AND v.rn BETWEEN a.rn - 10 AND a.rn
              GROUP BY 1, 2, 3
            )
            SELECT event_id, user_id,
                   STRING_AGG(event_type || ':' || CAST(c AS VARCHAR), ','
                              ORDER BY event_type) AS cc
            FROM pairs GROUP BY event_id, user_id
        """,
        "where_window": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              (SELECT COUNT(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 1 HOUR AND v.rn <= a.rn
                 AND v.value > 100) AS cw,
              ROUND((SELECT SUM(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 1 HOUR AND v.rn <= a.rn
                 AND v.value > 100), 6) AS sw
            FROM r a
        """,
        "ew_avg_window": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              ROUND((SELECT SUM(v.value * POW(0.5, a.rn - v.rn)) /
                            SUM(POW(0.5, a.rn - v.rn))
                     FROM r v WHERE v.user_id=a.user_id
                       AND v.rn BETWEEN a.rn - 10 AND a.rn), 6) AS ew
            FROM r a
        """,
        "stat_windows": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              ROUND((SELECT STDDEV_SAMP(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.rn BETWEEN a.rn - 20 AND a.rn) + 1e-9, 6) AS sd,
              ROUND((SELECT VAR_SAMP(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.rn BETWEEN a.rn - 20 AND a.rn) + 1e-9, 6) AS vr,
              ROUND((SELECT MEDIAN(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.rn BETWEEN a.rn - 20 AND a.rn), 6) AS med
            FROM r a
        """,
        "drawdown_window": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              ROUND(COALESCE((
                SELECT MAX(
                  (SELECT MAX(w.value) FROM r w WHERE w.user_id = a.user_id
                     AND w.rn BETWEEN a.rn - 20 AND v.rn) - v.value)
                FROM r v WHERE v.user_id = a.user_id
                  AND v.rn BETWEEN a.rn - 20 AND a.rn), 0.0), 6) AS dd
            FROM r a
        """,
        "first_value_window": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              ROUND((SELECT v.value FROM r v WHERE v.user_id=a.user_id
                 AND v.rn = a.rn - 1), 6) AS fv
            FROM r a
        """,
        "skewed_window": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              (SELECT COUNT(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 30 MINUTE AND v.rn <= a.rn) AS cnt_sk,
              ROUND((SELECT SUM(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 30 MINUTE AND v.rn <= a.rn), 6) AS sum_sk
            FROM r a
        """,
        "bounded_range_window": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              CAST((SELECT SUM(v.event_id) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 30 MINUTE AND v.rn <= a.rn) AS BIGINT) AS sum_id_30m,
              (SELECT COUNT(*) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 30 MINUTE AND v.rn <= a.rn) AS cnt_30m,
              ROUND((SELECT AVG(v.event_id) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 30 MINUTE AND v.rn <= a.rn), 6) AS avg_id_30m
            FROM r a
        """,
        "window_union": """
            WITH r AS (
              SELECT event_id, user_id, ts, event_type, value,
                     CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_prim,
                     ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY ts,
                                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END,
                                event_id) AS rn
              FROM events
            )
            SELECT a.event_id, a.user_id,
              (SELECT COUNT(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 30 MINUTE AND v.rn <= a.rn) AS cnt_u,
              ROUND((SELECT SUM(v.value) FROM r v WHERE v.user_id=a.user_id
                 AND v.ts >= a.ts - INTERVAL 30 MINUTE AND v.rn <= a.rn), 6) AS sum_u
            FROM r a WHERE a.is_prim = 1
        """,
        "last_join_asof": """
            WITH p AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
            )
            SELECT p.event_id, p.user_id,
              (SELECT c.event_id FROM events c WHERE c.event_type='click'
                 AND c.user_id = p.user_id AND c.ts <= p.ts
                 ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id,
              (SELECT ROUND(c.value, 6) FROM events c WHERE c.event_type='click'
                 AND c.user_id = p.user_id AND c.ts <= p.ts
                 ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_value
            FROM p
        """,
        "last_join_ordered": """
            -- tie-break at equal l_linenumber mirrors the engine's
            -- deterministic all-right-columns-desc rule
            SELECT o.o_orderkey,
              (SELECT l.l_linenumber FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                 ORDER BY l.l_linenumber DESC, l.l_quantity DESC LIMIT 1) AS l_linenumber,
              (SELECT ROUND(l.l_quantity, 6) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                 ORDER BY l.l_linenumber DESC, l.l_quantity DESC LIMIT 1) AS last_qty
            FROM orders o
        """,
        "sessionize": """
            WITH g AS (
              SELECT event_id, user_id, ts,
                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events
            )
            SELECT event_id, user_id,
              CAST(SUM(CASE WHEN prev_ts IS NULL
                            OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
            FROM g
        """,
        "group_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   ROUND(AVG(l_quantity), 6) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "filter_project": """
            SELECT l_orderkey, l_linenumber,
                   ROUND(l_extendedprice * (1 - l_discount), 6) AS revenue,
                   UPPER(l_returnflag) AS flag_u
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 30
        """,
        "sort_limit": """
            SELECT o_orderkey, ROUND(o_totalprice, 6) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        "union_distinct": """
            SELECT n_regionkey AS k FROM nation
            UNION
            SELECT r_regionkey AS k FROM region
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
        """,
        "text_stats": r"""
            SELECT doc_id,
              CAST(LENGTH(text) AS BIGINT) AS n_chars,
              CAST(CASE WHEN TRIM(text) = '' THEN 0
                   ELSE ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'))
                   END AS BIGINT) AS n_tokens,
              ROUND(CASE WHEN LENGTH(text) > 0 THEN
                (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^\w\s]', '', 'g'))) * 1.0
                 / LENGTH(text) ELSE 0 END, 6) AS punct_ratio,
              ROUND(CASE WHEN LENGTH(text) > 0 THEN
                (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[A-Z]', '', 'g'))) * 1.0
                 / LENGTH(text) ELSE 0 END, 6) AS upper_ratio,
              ROUND(CASE WHEN LENGTH(text) > 0 THEN
                (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g'))) * 1.0
                 / LENGTH(text) ELSE 0 END, 6) AS digit_ratio
            FROM documents
        """,
        "fingerprint_groups": r"""
            SELECT MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^\w\s]', '', 'g'),
                                           '\s+', ' ', 'g'))) AS fp,
                   COUNT(*) AS n
            FROM documents GROUP BY 1
        """,
        "similarity_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 3
            ),
            s AS (
              SELECT q.query_id, e.vec_id,
                     LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]), q.qv) AS cosine
              FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
              SELECT query_id, vec_id, cosine,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, vec_id) AS rank
              FROM s
            )
            SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 5
        """,
        "long_window_unbounded": """
            SELECT event_id, user_id,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE), 6) AS cum_sum,
                   COUNT(value) OVER w AS cum_cnt,
                   ROUND(MIN(value) OVER w, 6) AS cum_min,
                   ROUND(MAX(value) OVER w, 6) AS cum_max,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE)
                         / COUNT(value) OVER w, 6) AS cum_avg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "preagg_incremental": """
            WITH b AS (
              SELECT (epoch_ms(MIN(ts)) + epoch_ms(MAX(ts))) // 2 AS mid
              FROM events
            ),
            w AS (
              SELECT event_id, user_id, ts,
                     CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER win AS DOUBLE) AS cum_sum,
                     COUNT(value) OVER win AS cum_cnt,
                     MIN(value) OVER win AS cum_min,
                     MAX(value) OVER win AS cum_max
              FROM events
              WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            )
            SELECT event_id, user_id, ROUND(cum_sum, 6) AS cum_sum, cum_cnt,
                   ROUND(cum_min, 6) AS cum_min, ROUND(cum_max, 6) AS cum_max
            FROM w, b WHERE epoch_ms(w.ts) > b.mid
        """,
        "nth_value_where_window": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              ROUND((SELECT v.value FROM r v WHERE v.user_id = a.user_id
                 AND v.rn BETWEEN a.rn - 10 AND a.rn AND v.event_type = 'click'
                 ORDER BY v.rn LIMIT 1 OFFSET 1), 6) AS nv2,
              ROUND((SELECT v.value FROM r v WHERE v.user_id = a.user_id
                 AND v.rn BETWEEN a.rn - 10 AND a.rn AND v.event_type = 'click'
                 ORDER BY v.rn DESC LIMIT 1), 6) AS nv_last
            FROM r a
        """,
        "topn_cate_window": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              COALESCE((
                SELECT STRING_AGG(k || ':' || CAST(c AS VARCHAR), ',' ORDER BY k DESC)
                FROM (SELECT v.event_type AS k, COUNT(*) AS c
                      FROM r v WHERE v.user_id = a.user_id
                        AND v.rn BETWEEN a.rn - 10 AND a.rn AND v.value > 100
                      GROUP BY 1 ORDER BY k DESC LIMIT 2) s
              ), '') AS tkc,
              ROUND((
                SELECT MAX(c) * 1.0 / SUM(c)
                FROM (SELECT COUNT(*) AS c FROM r v WHERE v.user_id = a.user_id
                        AND v.rn BETWEEN a.rn - 10 AND a.rn
                      GROUP BY v.event_type) s
              ), 6) AS t1r,
              (
                SELECT STRING_AGG(k, ',' ORDER BY c DESC, k)
                       || REPEAT(',NULL', 2 - COUNT(*))
                FROM (SELECT v.event_type AS k, COUNT(*) AS c
                      FROM r v WHERE v.user_id = a.user_id
                        AND v.rn BETWEEN a.rn - 10 AND a.rn
                      GROUP BY 1 ORDER BY c DESC, k LIMIT 2) s
              ) AS tf
            FROM r a
        """,
        "fz_split_window": _RN_CTE + """
            SELECT a.event_id, a.user_id,
              (SELECT STRING_AGG(v.event_type, ' ' ORDER BY v.rn DESC)
                 FROM r v WHERE v.user_id = a.user_id
                   AND v.rn BETWEEN a.rn - 5 AND a.rn) AS keys_j,
              (SELECT COUNT(*) FROM r v WHERE v.user_id = a.user_id
                 AND v.rn BETWEEN a.rn - 5 AND a.rn) AS tok_cnt,
              (SELECT COUNT(DISTINCT v.event_type) FROM r v WHERE v.user_id = a.user_id
                 AND v.rn BETWEEN a.rn - 5 AND a.rn) AS key_dc
            FROM r a
        """,
        "left_join": """
            SELECT n_nationkey, n_name, r_name FROM nation
            LEFT JOIN region ON nation.n_regionkey = region.r_regionkey
              AND region.r_regionkey < 3
        """,
        "iceberg_scan": """
            SELECT event_type, COUNT(*) AS n,
                   ROUND(SUM(value), 2) AS sum_v,
                   MAX(event_id) AS max_id
            FROM events
            WHERE event_id <= (SELECT CAST(FLOOR(MAX(event_id) / 3.0) AS BIGINT)
                               FROM events)
            GROUP BY event_type
        """,
        "backfill_transcripts": _backfill_oracle(),
        "request_transcripts": _request_oracle(),
        "minhash_pairs": _MINHASH_ORACLE,
        "ngram_jaccard": _MINHASH_ORACLE,
        "simhash_pairs": _SIMHASH_ORACLE,
        "lsh_topk": _lsh_oracle(),
        "cosine_dedup": _cosine_dedup_oracle(),
    }


# Exact all-pairs shingle Jaccard (same word-3-gram definition as
# openmldb_spark.operators.dedup.shingles). The Spark side emits the
# exact-verified stage, so green hash == LSH recall 1 on this corpus.
_MINHASH_ORACLE = r"""
    WITH sh AS (
      SELECT doc_id, sset FROM (
        SELECT doc_id,
          list_distinct([g for g in
            [array_to_string(toks[i+1:i+3], ' ')
             for i in range(0, greatest(len(toks)-3, 0) + 1)]
            if len(g) > 0]) AS sset
        FROM (SELECT doc_id,
                regexp_split_to_array(
                  trim(regexp_replace(lower(text), '[^\w\s]', '', 'g')),
                  '\s+') AS toks
              FROM documents)
      ) WHERE len(sset) > 0
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(len(list_intersect(a.sset, b.sset)) * 1.0
                 / len(list_distinct(list_concat(a.sset, b.sset))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sset, b.sset)) * 1.0
          / len(list_distinct(list_concat(a.sset, b.sset))) >= 0.5
"""

# Recompute the md5_60 simhash per doc (bit-for-bit: standard MD5,
# first 15 hex chars → 60-bit int; per-bit weighted majority over
# token multiplicities), then exact all-pairs hamming ≤ 3.
_SIMHASH_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
        regexp_split_to_array(
          trim(regexp_replace(lower(text), '[^\w\s]', '', 'g')), '\s+'),
        t -> len(t) > 0)) AS tok
      FROM documents
    ),
    th AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ),
    bt AS (
      SELECT doc_id, b,
             CASE WHEN 2 * SUM((h >> b) & 1) > COUNT(*)
                  THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      FROM th CROSS JOIN (SELECT unnest(range(60))::INT AS b) bb
      GROUP BY doc_id, b
    ),
    sh0 AS (
      SELECT doc_id, CAST(SUM(bit * (1::BIGINT << b)) AS BIGINT) AS h
      FROM bt GROUP BY doc_id
    ),
    sh AS (
      SELECT d.doc_id, COALESCE(s.h, 0) AS h
      FROM documents d LEFT JOIN sh0 s USING (doc_id)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.h, b.h))::INT AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h, b.h)) <= 3
"""


def _lsh_oracle() -> str:
    """Replicate lsh_topk's hyperplane bucketing in DuckDB: the planes
    are the same seeded numpy constants (seed 42, 8 planes, dim 64 —
    the driver-gate corpus), embedded as double literals; signatures,
    the 4 multi-probe buckets, candidate cosine and top-5 ranking all
    recomputed independently."""
    import numpy as np

    planes = np.random.default_rng(42).standard_normal((8, 64))
    sig_terms = " + ".join(
        f"(CASE WHEN list_inner_product(v, "
        f"[{', '.join(repr(float(x)) for x in planes[i])}]) > 0 "
        f"THEN {1 << i}::BIGINT ELSE 0 END)"
        for i in range(8)
    )
    return f"""
        WITH c AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        cs AS (
          SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS n,
                 {sig_terms} AS b
          FROM c
        ),
        probes AS (
          SELECT vec_id AS query_id, v AS qv, n AS qn,
                 unnest([b, xor(b, 1), xor(b, 2), xor(b, 4)]) AS b
          FROM cs WHERE vec_id < 3
        ),
        cand AS (
          SELECT DISTINCT p.query_id, c.vec_id,
                 list_inner_product(c.v, p.qv) / (c.n * p.qn) AS cosine
          FROM cs c JOIN probes p USING (b)
        ),
        ranked AS (
          SELECT query_id, vec_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id) AS rank
          FROM cand
        )
        SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine,
               CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 5
    """


def _request_oracle() -> str:
    """Request-mode oracle: the request row is each conv's newest turn,
    so its feature vector equals the backfill vector at that row —
    same LCG CTEs, final select filtered to the max buffer position
    per conv (no sessionize in request mode)."""
    from openmldb_spark.data.lcg import duckdb_conv_meta_cte, duckdb_transcripts_cte

    return f"""
        WITH {duckdb_transcripts_cte(100, 80, 42)},
        {duckdb_conv_meta_cte(100, 42)},
        r AS (
          SELECT conv_id, turn_idx, role, text, tool, ts_ms,
                 ROW_NUMBER() OVER wo AS rn,
                 COUNT(*) OVER wo AS n_conv,
                 COUNT(CASE WHEN role = 'tool' THEN 1 END) OVER w10 AS n_tool_calls_10,
                 LAG(tool) OVER wo AS prev_tool
          FROM lcg_t
          WINDOW wo AS (PARTITION BY conv_id ORDER BY ts_ms, turn_idx),
                 w10 AS (PARTITION BY conv_id ORDER BY ts_ms, turn_idx
                         ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
        ),
        s AS (
          SELECT r.*,
            (SELECT COUNT(DISTINCT COALESCE(v.tool, '')) FROM r v
               WHERE v.conv_id = r.conv_id
                 AND v.rn BETWEEN r.rn - 10 AND r.rn) AS n_distinct_tools_10,
            (SELECT MAX(v.rn) FROM r v WHERE v.conv_id = r.conv_id) AS max_rn
          FROM r
        )
        SELECT s.conv_id, s.turn_idx, s.role, s.text, s.tool, s.ts_ms,
               s.n_tool_calls_10, s.n_distinct_tools_10, s.prev_tool,
               mm.m_ts_ms, mm.m_model, mm.m_channel, mm.m_priority
        FROM s
        LEFT JOIN LATERAL (
          SELECT m.ts_ms AS m_ts_ms, m.model AS m_model,
                 m.channel AS m_channel, m.priority AS m_priority
          FROM lcg_meta m
          WHERE m.conv_id = s.conv_id AND m.ts_ms <= s.ts_ms
          ORDER BY m.ts_ms DESC LIMIT 1
        ) mm ON TRUE
        WHERE s.rn = s.max_rn
    """


def _backfill_oracle() -> str:
    """Full-value oracle for the flagship backfill: DuckDB regenerates
    the LCG transcripts + conv_meta as CTEs (bit-exact integer-hash
    twins of openmldb_spark.data.lcg), then computes the same feature
    vector with native windows + a lateral as-of join.

    Baked at the driver's gate scale (sf0.01 → 100 convs × 80 turns);
    the pytest parity test covers other scales."""
    from openmldb_spark.data.lcg import duckdb_conv_meta_cte, duckdb_transcripts_cte

    return f"""
        WITH {duckdb_transcripts_cte(100, 80, 42)},
        {duckdb_conv_meta_cte(100, 42)},
        r AS (
          SELECT conv_id, turn_idx, role, text, tool, ts_ms,
                 ROW_NUMBER() OVER wo AS rn,
                 COUNT(CASE WHEN role = 'tool' THEN 1 END) OVER w10 AS n_tool_calls_10,
                 LAG(tool) OVER wo AS prev_tool,
                 LAG(role) OVER wo AS prev_role,
                 LAG(ts_ms) OVER wo AS prev_ts_ms
          FROM lcg_t
          WINDOW wo AS (PARTITION BY conv_id ORDER BY ts_ms, turn_idx),
                 w10 AS (PARTITION BY conv_id ORDER BY ts_ms, turn_idx
                         ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
        ),
        s AS (
          SELECT r.*,
            (SELECT COUNT(DISTINCT COALESCE(v.tool, '')) FROM r v
               WHERE v.conv_id = r.conv_id
                 AND v.rn BETWEEN r.rn - 10 AND r.rn) AS n_distinct_tools_10,
            COUNT(CASE WHEN prev_ts_ms IS NULL
                       OR ts_ms - prev_ts_ms > 1800000 THEN 1 END)
              OVER (PARTITION BY conv_id ORDER BY ts_ms, turn_idx
                    ROWS UNBOUNDED PRECEDING) - 1 AS session_id
          FROM r
        )
        SELECT s.conv_id, s.turn_idx, s.role, s.text, s.tool, s.ts_ms,
               s.n_tool_calls_10, s.n_distinct_tools_10,
               s.prev_tool, s.prev_role,
               mm.m_ts_ms, mm.m_model, mm.m_channel, mm.m_priority,
               s.session_id
        FROM s
        LEFT JOIN LATERAL (
          SELECT m.ts_ms AS m_ts_ms, m.model AS m_model,
                 m.channel AS m_channel, m.priority AS m_priority
          FROM lcg_meta m
          WHERE m.conv_id = s.conv_id AND m.ts_ms <= s.ts_ms
          ORDER BY m.ts_ms DESC LIMIT 1
        ) mm ON TRUE
    """
