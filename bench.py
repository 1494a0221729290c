"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline: the north-star metric — turns/sec for LAST-JOIN + windowed
feature backfill over the synthetic transcripts table (hot-conversation
skew ≥10%), plus representative operator benchmarks over the driver
testdata at $SPARK_GRAFT_SF_DIR.

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  SPARK_GRAFT_BENCH_CONVS / _TURNS  transcripts scale (default 1000×600
      ≈ 600k turns + 60k hot-conv turns)
Transcripts are generated distributed + written to parquet once (keyed
by scale) so benched queries read from disk like production.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def build_spark(cpus: int):
    from openmldb_spark.session import SessionConfig, get_spark

    # benchmark context: shuffle scratch on tmpfs (the local-NVMe
    # analogue — this VM's /tmp disk serializes shuffle IO across
    # cores, BENCH.md r3). Engine-wide it is opt-in via the same env.
    if not os.environ.get("SPARK_GRAFT_LOCAL_DIR") and os.path.isdir("/dev/shm"):
        os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/sparktmp"
    return get_spark(
        SessionConfig(
            master=f"local[{cpus}]",
            app_name="openmldb_spark_bench",
            shuffle_partitions=max(cpus, 8),
            driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        )
    )


def ensure_transcripts(spark, n_convs: int, avg_turns: int, base: str | None = None):
    """Materialize the bench transcripts + conv_meta parquet once."""
    if base is None:
        base = os.environ.get("SPARK_GRAFT_BENCH_BASE", "/tmp/omldb_bench")
    from openmldb_spark.data import generate_conv_meta, generate_transcripts

    tdir = f"{base}/transcripts_{n_convs}x{avg_turns}"
    mdir = f"{base}/conv_meta_{n_convs}"
    if not os.path.exists(f"{tdir}/_SUCCESS"):
        generate_transcripts(spark, n_convs=n_convs, avg_turns=avg_turns, seed=42).write.mode(
            "overwrite"
        ).parquet(tdir)
    if not os.path.exists(f"{mdir}/_SUCCESS"):
        generate_conv_meta(spark, n_convs=n_convs, seed=42).write.mode("overwrite").parquet(mdir)
    return spark.read.parquet(tdir), spark.read.parquet(mdir)


_REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))


def _run(df, repeats: int = _REPEATS) -> float:
    """Best-of-N wall time (noop sink forces full computation; min
    damps host-VM CPU contention noise and JIT warm-up)."""
    best = float("inf")
    for _ in range(max(1, repeats)):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def flagship_backfill(spark, transcripts, meta):
    """LAST JOIN (as-of) + multi-feature ordered window + sessionize."""
    from pyspark.sql import functions as F

    from openmldb_spark.operators.window import Agg, WindowSpec
    from openmldb_spark.plans.backfill import AsOfSource, FeatureWindow, backfill_features

    primary = transcripts.withColumn("__is_tool__", F.col("role") == "tool")
    fw = FeatureWindow(
        spec=WindowSpec(["conv_id"], "ts", "rows", 10, tiebreak=["turn_idx"]),
        aggs=[
            Agg("count_where", "turn_idx", "n_tool_calls_10", cond="__is_tool__"),
            Agg("distinct_count", "tool", "n_distinct_tools_10"),
            Agg("lag", "tool", "prev_tool", n=1),
            Agg("lag", "role", "prev_role", n=1),
            Agg("count", None, "n_turns_10"),
        ],
        skew=True, skew_quantiles=8, skew_hot_threshold=100_000,
        # (conv_id, turn_idx) is the unique turn identity — text stays
        # out of any kernel/event-plan shuffles (BENCH.md r3)
        row_key=["conv_id", "turn_idx"],
    )
    return backfill_features(
        primary, "ts", [fw],
        asof=[AsOfSource(meta, on=["conv_id"], right_ts="ts", prefix="m_", how="union_asof")],
        session_key="conv_id", session_gap=1800.0, session_tiebreak=["turn_idx"],
    ).drop("__is_tool__")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "1000"))
    avg_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "600"))
    sf_label = sf_dir.rstrip("/").rsplit("/", 1)[-1]

    spark = build_spark(cpus)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as em

    transcripts, meta = ensure_transcripts(spark, n_convs, avg_turns)
    n_turns = transcripts.count()

    queries: dict[str, float] = {}

    # q1 — flagship: the north-star backfill (turns/sec comes from this)
    queries["backfill_flagship"] = _run(flagship_backfill(spark, transcripts, meta))

    # q2 — skew-salted unbounded window over the hot conversation
    from openmldb_spark.operators.skew import window_agg_skewed
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    spec_u = WindowSpec(["conv_id"], "ts", "rows_range", None, tiebreak=["turn_idx"])
    queries["skewed_unbounded_window"] = _run(
        window_agg_skewed(
            transcripts, spec_u,
            [Agg("count", None, "cnt"), Agg("sum", "turn_idx", "s"),
             Agg("distinct_count", "tool", "dt")],
            quantiles=8, hot_threshold=20_000,
        )
    )

    # q2b — same unbounded decomposable aggs via long-window pre-agg
    # (bucketed partials + carry-in — no context replication at all)
    from openmldb_spark.operators.long_window import long_window_agg

    queries["long_window_preagg"] = _run(
        long_window_agg(
            transcripts, spec_u,
            [Agg("count", None, "cnt"), Agg("sum", "turn_idx", "s"),
             Agg("min", "turn_idx", "mn"), Agg("max", "turn_idx", "mx")],
            bucket_ms=3_600_000,
        )
    )

    # q2c — bounded ROWS_RANGE on the hot conversation: the
    # prefix-subtraction plan (cum − before over bucketed partials,
    # (key,bucket)-parallel, zero replication) vs the native
    # single-exchange plan that puts the whole hot key on one task
    spec_b = WindowSpec(["conv_id"], "ts", "rows_range", 4 * 3_600_000,
                        tiebreak=["turn_idx"])
    baggs = [Agg("sum", "turn_idx", "s4h"), Agg("count", None, "c4h"),
             Agg("avg", "turn_idx", "a4h")]
    queries["bounded_range_subtract"] = _run(
        window_agg_skewed(transcripts, spec_b, baggs, quantiles=8,
                          hot_threshold=20_000, native_when_cold=False,
                          bounded_impl="subtract"))
    queries["bounded_range_native"] = _run(
        window_agg(transcripts, spec_b, baggs, impl="native"))

    # q3 — native rolling windows on events (pure Catalyst path)
    queries["rows_window_native"] = _run(em.q_rows_window(spark, sf_dir))

    # q4 — kernel ROWS_RANGE on events (the Arrow-kernel reference point)
    ev0 = spark.read.parquet(f"{sf_dir}/events.parquet")
    spec_rr = WindowSpec(["user_id"], "ts", "rows_range", 600_000, tiebreak=["event_id"])
    rr_aggs = [Agg("count", "value", "cnt_10m"), Agg("sum", "value", "sum_10m")]
    queries["rows_range_kernel"] = _run(window_agg(ev0, spec_rr, rr_aggs, impl="kernel"))

    # q4b — same query on the tie-corrected native ROWS_RANGE plan
    # (cum-minus-before along buffer order; zero Python, one exchange)
    queries["rows_range_native"] = _run(window_agg(ev0, spec_rr, rr_aggs, impl="native"))

    # q5 — as-of LAST JOIN on events (merge_asof path)
    queries["last_join_asof"] = _run(em.q_last_join_asof(spark, sf_dir))

    # q6 — sessionize events
    queries["sessionize"] = _run(em.q_sessionize(spark, sf_dir))

    # q7 — group agg (TPC-H Q1 shape)
    queries["group_agg"] = _run(em.q_group_agg(spark, sf_dir))

    # q8 — minhash near-dup discovery on documents
    queries["minhash_dedup"] = _run(em.q_minhash_pairs(spark, sf_dir))

    # q9 — brute-force cosine top-k on embeddings
    queries["similarity_topk"] = _run(em.q_similarity_topk(spark, sf_dir))

    # q10 — generic aggregates over a 1000-row frame (two-pointer
    # sliding path: entropy / ew_avg / top1_ratio, r2 vectorization)
    spec_g = WindowSpec(["user_id"], "ts", "rows", 1000, tiebreak=["event_id"])
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    queries["generic_aggs_1k_frame"] = _run(
        window_agg(ev, spec_g, [
            Agg("entropy", "event_type", "ent"),
            Agg("ew_avg", "value", "ew", param=0.5),
            Agg("top1_ratio", "event_type", "t1"),
        ], impl="kernel")
    )

    # q10b — categorical aggregates over 1000-row frames: vectorized
    # per-frame bincounts (no per-frame-row Python — VERDICT r2 #6)
    queries["cate_aggs_1k_frame"] = _run(
        window_agg(ev.withColumn("__hot__", F.col("value") > 10), spec_g, [
            Agg("sum_cate", "value", "sc", cate="event_type"),
            Agg("top_n_key_count_cate_where", "value", "tnc",
                cond="__hot__", cate="event_type", n=3),
        ], impl="kernel")
    )

    # q10c — request-mode serving shape: features for ONE request row
    # per conversation against the full transcript history (native
    # WINDOW UNION plan + as-of meta join)
    from pyspark.sql import Window as _W

    from openmldb_spark.plans.backfill import AsOfSource, FeatureWindow
    from openmldb_spark.plans.request import request_features

    rnk = F.row_number().over(
        _W.partitionBy("conv_id").orderBy(F.desc("ts"), F.desc("turn_idx")))
    tagged = transcripts.withColumn("__is_tool__", F.col("role") == "tool") \
                        .withColumn("__rn__", rnk)
    req = tagged.filter(F.col("__rn__") == 1).drop("__rn__")
    hist = tagged.filter(F.col("__rn__") > 1).drop("__rn__")
    fw_req = FeatureWindow(
        spec=WindowSpec(["conv_id"], "ts", "rows", 10, tiebreak=["turn_idx"]),
        aggs=[
            Agg("count_where", "turn_idx", "n_tools_10", cond="__is_tool__"),
            Agg("distinct_count", "tool", "n_dtools_10"),
            Agg("lag", "tool", "prev_tool", n=1),
        ],
    )
    queries["request_mode"] = _run(request_features(
        req, hist, "ts", [fw_req],
        asof=[AsOfSource(meta, on=["conv_id"], right_ts="ts", prefix="m_")],
    ).drop("__is_tool__"))

    # q10d — request-mode worst case: FOUR requests per conversation,
    # so the isolation probe must route to the per-request
    # INSTANCE_NOT_IN_WINDOW kernel plan — the serving path's upper
    # bound, not just the zero-Python single-request best case
    req4 = tagged.filter(F.col("__rn__") <= 4).drop("__rn__")
    hist4 = tagged.filter(F.col("__rn__") > 4).drop("__rn__")
    queries["request_mode_inw"] = _run(request_features(
        req4, hist4, "ts", [fw_req],
        asof=[AsOfSource(meta, on=["conv_id"], right_ts="ts", prefix="m_")],
    ).drop("__is_tool__"))

    # q10e/q10f — DEPLOY long-window serving: UNBOUNDED cumulative
    # features for one request per conversation, generic WINDOW-UNION
    # path vs the OPTIONS(long_windows=) pre-agg path (carry from
    # broadcast partials + edge-bucket raw scan; state build cost paid
    # once outside the timed region, like the reference's insert-time
    # aggregator)
    from openmldb_spark.sql import SqlEngine as _SE

    lw_sql = ("SELECT conv_id, ts, sum(turn_idx) OVER w AS s, "
              "count(turn_idx) OVER w AS c, max(turn_idx) OVER w AS mx "
              "FROM bench_hist "
              "WINDOW w AS (PARTITION BY conv_id ORDER BY ts "
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    slim = transcripts.select("conv_id", "ts", "turn_idx", "role", "tool")
    req_lw = slim.withColumn(
        "__rn__", rnk).filter(F.col("__rn__") == 1).drop("__rn__")
    hist_lw = slim.join(req_lw.select("conv_id", "ts", "turn_idx"),
                        on=["conv_id", "ts", "turn_idx"], how="left_anti")
    e_gen = _SE(spark)
    e_gen.register("bench_hist", hist_lw)
    e_gen.sql(f"DEPLOY dgen {lw_sql}")
    queries["deploy_request_generic"] = _run(e_gen.request("dgen", req_lw))

    e_lw = _SE(spark)
    e_lw.register("bench_hist", hist_lw.limit(0))
    e_lw.sql(f'DEPLOY dlw OPTIONS(long_windows="w:1h") {lw_sql}')
    e_lw.tables["bench_hist"] = hist_lw
    if hasattr(e_lw, "_table_versions"):
        e_lw._table_versions["bench_hist"] = 1
    else:
        e_lw._table_versions = {"bench_hist": 1}
    e_lw.request("dlw", req_lw.limit(1)).collect()  # state build (untimed)
    queries["deploy_request_preagg"] = _run(e_lw.request("dlw", req_lw))

    # q11 — SQL-surface as-of LAST JOIN (union_asof routing: 0 Python
    # nodes, 1 Exchange)
    from openmldb_spark.sql import SqlEngine

    eng = SqlEngine(spark)
    eng.register("p", ev.filter("event_type='purchase'"), index_ts="ts")
    eng.register("c", ev.filter("event_type='click'").selectExpr(
        "user_id uid", "ts cts", "value cval", "event_id cid"), index_ts="cts")
    queries["sql_asof_join"] = _run(eng.sql(
        "select p.event_id, p.user_id, c.cid, c.cval from p "
        "last join c ORDER BY c.cts on p.user_id = c.uid and c.cts <= p.ts"))

    total = sum(queries.values())
    out = {
        "metric": "turns_per_sec_backfill",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf_label,
        "cpus": cpus,
        "bench_rows": n_turns,
        "turns_per_sec": round(n_turns / queries["backfill_flagship"], 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
