"""Materialized incremental pre-aggregation state — the batch analogue
of the reference's insert-time aggregator.

The reference maintains pre-aggregated buckets *incrementally at insert
time* (``src/storage/aggregator.h:40-56``, ``aggregator.cc``: one
aggregated row per (key, time-bucket), updated as rows arrive, flushed
to a pre-agg table that long-window queries read instead of raw
history). ``long_window_agg`` re-derives those buckets per job; at
100 TB a daily backfill should not rescan years of history to rebuild
partials that never change.

``PreAggTable`` persists the bucket partials and updates them by
appending *generations*:

- ``create(...)`` writes the state manifest (spec, aggregates,
  bucket size) under ``state_dir``.
- ``append(df_new)`` computes partials of the appended rows ONLY
  (O(new) work), writes them as ``gen=N`` parquet, and returns the
  long-window feature rows for the appended data — carry state comes
  from the already-materialized partials, so history is never
  rescanned. Appends are validated against a high-watermark: each
  append's order keys must be ≥ every previous append's (per key the
  reference would accept out-of-order and re-aggregate; the batch
  contract is ordered appends, enforced loudly).
- generations merge by re-aggregation at read time (partials are
  associative: sum-of-sums, min-of-mins…); ``compact()`` folds all
  generations into one for bounded metadata.

Scale shape: an append over D new rows touches O(D) raw data + the
partials table (keys × buckets rows — KBs per TB of raw history). The
only shuffles are the new-data groupBy and the (key, bucket) running
window; carried state joins on (key, bucket) and is broadcast-sized in
practice.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openmldb_spark.operators.long_window import (
    _B,
    _DECOMPOSABLE,
    _order_ms,
    carry_exprs,
    combine_cols,
    merge_exprs,
    partial_cols,
    partial_exprs,
    running_cols,
)
from openmldb_spark.operators.window import Agg, WindowSpec

__all__ = ["PreAggTable", "serve_long_window", "long_window_serveable"]

_META = "_preagg_meta.json"
_WM = "__pa_max_ord__"


def _check_spec(spec: WindowSpec, aggs: list[Agg]) -> None:
    if spec.preceding is not None or spec.maxsize or spec.end_preceding \
            or spec.end_is_offset or spec.open_preceding or spec.open_end \
            or spec.exclude_current_time or spec.exclude_current_row \
            or spec.instance_not_in_window:
        raise ValueError("PreAggTable supports plain UNBOUNDED..CURRENT ROW frames")
    bad = [a.func for a in aggs if a.func not in _DECOMPOSABLE]
    if bad:
        raise ValueError(f"non-decomposable aggregates for pre-aggregation: {bad}")
    for a in aggs:
        if a.split or a.cate or a.pair or a.cond_pair:
            raise ValueError(f"aggregate {a.name} uses kernel-only features")


class PreAggTable:
    """Persistent (key, bucket) partials for UNBOUNDED window features.

    See module docstring; reference parity target is
    ``src/storage/aggregator.h:40-56`` (per-bucket aggregated state,
    incrementally maintained) re-expressed as append-only parquet
    generations merged by re-aggregation.
    """

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.dir = state_dir
        with open(os.path.join(state_dir, _META)) as f:
            self.meta = json.load(f)
        self.spec = WindowSpec(**self.meta["spec"])
        self.aggs = [Agg(**{**a, "split": tuple(a["split"]) if a["split"] else None,
                            "pair": tuple(a["pair"]) if a["pair"] else None,
                            "cond_pair": tuple(a["cond_pair"]) if a["cond_pair"] else None})
                     for a in self.meta["aggs"]]
        self.bucket_ms = int(self.meta["bucket_ms"])

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(cls, spark: SparkSession, state_dir: str, spec: WindowSpec,
               aggs: list[Agg], bucket_ms: int = 3_600_000) -> "PreAggTable":
        _check_spec(spec, aggs)
        os.makedirs(state_dir, exist_ok=True)
        if os.path.exists(os.path.join(state_dir, _META)):
            raise FileExistsError(f"pre-agg state already exists at {state_dir}")
        meta = {
            "spec": {**asdict(spec),
                     "partition_by": list(spec.partition_by),
                     "tiebreak": list(spec.tiebreak)},
            "aggs": [asdict(a) for a in aggs],
            "bucket_ms": int(bucket_ms),
            "generations": [],
            "watermark_ms": None,
        }
        with open(os.path.join(state_dir, _META), "w") as f:
            json.dump(meta, f, indent=1)
        return cls(spark, state_dir)

    @classmethod
    def open(cls, spark: SparkSession, state_dir: str) -> "PreAggTable":
        return cls(spark, state_dir)

    def _gen_dirs(self) -> list[str]:
        return [os.path.join(self.dir, g["dir"]) for g in self.meta["generations"]]

    def _save_meta(self) -> None:
        with open(os.path.join(self.dir, _META), "w") as f:
            json.dump(self.meta, f, indent=1)

    # -- state reads ---------------------------------------------------------

    def partials(self) -> DataFrame | None:
        """Merged (key, bucket) partials across all generations —
        the pre-agg table a long-window query plans against."""
        dirs = self._gen_dirs()
        if not dirs:
            return None
        keys = list(self.spec.partition_by)
        raw = self.spark.read.parquet(*dirs)
        if len(dirs) == 1:
            return raw
        return raw.groupBy(*keys, _B).agg(*merge_exprs(self.aggs),
                                          F.max(_WM).alias(_WM))

    def key_watermarks(self) -> DataFrame | None:
        """Per-key high-watermark (max ingested order ms) — derived
        from the partials, so it costs a scan of metadata-sized state,
        never of history."""
        P = self.partials()
        if P is None:
            return None
        keys = list(self.spec.partition_by)
        return P.groupBy(*keys).agg(F.max(_WM).alias("__pa_wm__"))

    def append_tail(self, df: DataFrame) -> None:
        """Idempotent catch-up: ingest only the rows of ``df`` STRICTLY
        newer than their key's watermark (new keys ingest whole).
        ``df`` may be the full current table — already-ingested history
        is filtered by the per-key watermark join, so re-running after
        new data lands appends only the new buckets."""
        wmk = self.key_watermarks()
        if wmk is None:
            new = df
        else:
            keys = list(self.spec.partition_by)
            ord_ms = _order_ms(df, self.spec.order_by)
            wside = F.broadcast(wmk) if self._carry_small() else wmk
            new = (df.join(wside, on=keys, how="left")
                   .filter(F.col("__pa_wm__").isNull() | (ord_ms > F.col("__pa_wm__")))
                   .drop("__pa_wm__"))
        self.append(new)

    # -- append ---------------------------------------------------------------

    def append(self, df: DataFrame) -> DataFrame:
        """Ingest ``df`` (O(new) work) and return its long-window
        feature rows (input columns + one column per aggregate),
        exactly what ``long_window_agg`` over the full history would
        emit for these rows.

        Contract: ordered appends — ``min(order key)`` of ``df`` must
        be ≥ the state's high-watermark (the reference's aggregator
        re-aggregates out-of-order inserts; here they raise so a 100 TB
        backfill fails fast instead of silently double-counting).
        Rows with NULL order keys are skipped (reference buffer rule).
        """
        spec, aggs, keys = self.spec, self.aggs, list(self.spec.partition_by)
        work = df.filter(F.col(spec.order_by).isNotNull())
        ord_ms = _order_ms(work, spec.order_by)
        work = work.withColumn(_B, (ord_ms / F.lit(self.bucket_ms)).cast("long"))

        wm = self.meta["watermark_ms"]
        wmk = self.key_watermarks()
        if wmk is not None:
            # PER-KEY ordered-append validation (the reference's
            # aggregator orders per key/index, not globally): one tiny
            # job over new-chunk keys × the metadata-sized partials
            viol = (work.withColumn("__o__", ord_ms)
                    .join(wmk, on=keys, how="inner")
                    .filter(F.col("__o__") < F.col("__pa_wm__"))
                    .select(*keys, "__o__", "__pa_wm__").limit(1).collect())
            if viol:
                v = viol[0]
                raise ValueError(
                    f"out-of-order append: key {tuple(v[k] for k in keys)} "
                    f"has order {v['__o__']} < its watermark {v['__pa_wm__']}; "
                    f"pre-agg state requires per-key ordered appends "
                    f"(rebuild or compact from raw history for corrections)")

        hist = self.partials()
        own = work.groupBy(*keys, _B).agg(
            *partial_exprs(aggs), F.max(ord_ms).alias(_WM))

        # ---- features for the appended rows (before merging them in) ----
        # carry for a row in bucket b = HISTORY partials over buckets
        # ≤ b (full buckets before + the same-bucket head — a complete
        # prefix because appends are ordered) ⊕ THIS CHUNK's partials
        # over buckets < b. One cumulative window serves both via an
        # even/odd sort key: history buckets at s=2β, own buckets at
        # s=2β+1 — the prefix s ≤ 2b is exactly {hist β ≤ b, own β < b}.
        pcols = partial_cols(aggs)
        _S = "__pa_s__"
        own_side = own.select(*keys, (F.col(_B) * 2 + 1).alias(_S), *pcols)
        if hist is not None:
            hist_side = hist.select(*keys, (F.col(_B) * 2).alias(_S), *pcols)
        else:
            hist_side = own_side.limit(0)
        # anchor rows at s=2b for every data bucket, so the join lands
        # even when history has no row at bucket b
        probe = (work.select(*keys, (F.col(_B) * 2).alias(_S)).distinct()
                 .join(hist_side.select(*keys, _S), on=keys + [_S], how="left_anti")
                 .select(*keys, _S, *[F.lit(None).alias(c) for c in pcols]))
        allb = hist_side.unionByName(probe).unionByName(own_side)
        wcum = (Window.partitionBy(*keys).orderBy(_S)
                .rowsBetween(Window.unboundedPreceding, 0))
        carry = (allb.select(*keys, _S, *carry_exprs(aggs, wcum))
                 .filter(F.col(_S) % 2 == 0))
        if self._carry_small():
            carry = F.broadcast(carry)
        joined = (work.withColumn(_S, F.col(_B) * 2)
                  .join(carry, on=keys + [_S], how="left"))

        order_cols = [F.col(spec.order_by)] + [F.col(c) for c in spec.tiebreak]
        wrun = (Window.partitionBy(*keys, _B).orderBy(*order_cols)
                .rowsBetween(Window.unboundedPreceding, 0))
        feats = combine_cols(running_cols(joined, aggs, wrun), aggs, df.schema)
        feats = feats.select(*df.columns, *[a.name for a in aggs])

        # ---- write this generation's partials (new rows only) ----
        gen = len(self.meta["generations"])
        gen_dir = f"gen={gen}"
        path = os.path.join(self.dir, gen_dir)
        t0 = time.time()
        own.write.mode("errorifexists").parquet(path)
        written = self.spark.read.parquet(path)
        stats = written.select(
            F.count(F.lit(1)).alias("pairs"), F.max(_WM).alias("wm")).collect()[0]
        self.meta["generations"].append({
            "dir": gen_dir,
            "pairs": stats["pairs"],
            "wall_sec": round(time.time() - t0, 3),
        })
        if stats["wm"] is not None:
            new_wm = int(stats["wm"])
            self.meta["watermark_ms"] = new_wm if wm is None else max(wm, new_wm)
        self._save_meta()
        return feats

    def _carry_small(self) -> bool:
        # partials are keys × buckets — metadata-sized vs raw history;
        # broadcast unless the manifest says the state itself is huge
        pairs = sum(g["pairs"] for g in self.meta["generations"])
        return pairs <= 2_000_000

    # -- maintenance ------------------------------------------------------------

    def compact(self) -> int:
        """Fold all generations into one (bounded metadata / read
        fan-in); returns the number of merged (key, bucket) rows."""
        merged = self.partials()
        if merged is None or len(self.meta["generations"]) <= 1:
            return 0 if merged is None else self.meta["generations"][0]["pairs"]
        tmp = os.path.join(self.dir, "_compact_tmp")
        merged.write.mode("overwrite").parquet(tmp)
        import shutil

        for g in self._gen_dirs():
            shutil.rmtree(g)
        final = os.path.join(self.dir, "gen=0")
        os.rename(tmp, final)
        n = self.spark.read.parquet(final).count()
        self.meta["generations"] = [{"dir": "gen=0", "pairs": n, "wall_sec": 0.0}]
        self._save_meta()
        return n


# ---------------------------------------------------------------------------
# request-mode serving over materialized partials — the batch analogue
# of the reference's long-window optimized DEPLOY
# (OPTIONS(long_windows=...), docs/en/openmldb_sql/deployment_manage/
# DEPLOY_STATEMENT.md:110-160; online pre-agg read path aggregator.cc)
# ---------------------------------------------------------------------------

_SERVE_FUNCS = frozenset(
    ["sum", "count", "avg", "min", "max",
     "sum_where", "count_where", "avg_where", "min_where", "max_where"])


def long_window_serveable(spec: WindowSpec, aggs: list, history) -> bool:
    """True when (spec, aggs) can be served from bucket partials:
    decomposable aggregates over plain columns, and a frame that is
    either UNBOUNDED..CURRENT ROW or a bounded ROWS_RANGE ms offset
    (the reference's long-window limitation list). ``*_where`` conds
    must be evaluable on the history side."""
    if spec.maxsize or spec.exclude_current_time or spec.exclude_current_row \
            or spec.end_preceding or spec.end_is_offset \
            or spec.open_preceding or spec.open_end:
        return False
    if spec.preceding is not None and spec.frame != "rows_range":
        return False  # row-count frames can't bucket-prune
    hist_cols = set(history.columns)
    for a in aggs:
        if a.func not in _SERVE_FUNCS or a.split or a.cate or a.pair or a.cond_pair:
            return False
        if a.cond and a.cond not in hist_cols:
            return False
        base = a.func[:-6] if a.func.endswith("_where") else a.func
        if base in ("sum", "avg"):
            from pyspark.sql import types as T

            if a.col is None or a.col not in hist_cols \
                    or not isinstance(history.schema[a.col].dataType,
                                      (T.ByteType, T.ShortType, T.IntegerType,
                                       T.LongType, T.FloatType, T.DoubleType,
                                       T.DecimalType)):
                return False
        elif a.col is not None and a.col not in hist_cols:
            return False
    return True


def serve_long_window(requests, history, state: PreAggTable,
                      spec: WindowSpec, aggs: list,
                      req_id: str = "__req_id__"):
    """Point-in-time long-window features for ``requests`` using the
    materialized bucket partials in ``state`` — FULL buckets inside the
    frame come from the (metadata-sized, broadcast) pre-agg table;
    only the EDGE buckets are read from raw history, with a pushable
    global time bound so a 10^12-turn table scans O(requests ×
    bucket_width) rows instead of full history. Each request sees
    stored rows + itself, never sibling requests (per-request
    isolation by construction — the reference's serving contract).

    Frames: UNBOUNDED..CURRENT ROW, or bounded ROWS_RANGE [t-Δ, t].
    Returns ``requests`` with one column per aggregate appended."""
    from functools import reduce
    from operator import and_

    from pyspark.sql import types as T

    from openmldb_spark.operators.long_window import (
        merge_exprs as _merge, partial_cols as _pcols, partial_exprs as _pexprs)
    from openmldb_spark.operators.window import _result_type

    W = state.bucket_ms
    keys = list(spec.partition_by)
    bounded = spec.preceding is not None

    a_ms = _order_ms(requests, spec.order_by)
    r = (requests
         .withColumn("__a__", a_ms)
         .withColumn("__b__", (F.col("__a__") / F.lit(W)).cast("long")))
    if bounded:
        r = r.withColumn("__lo__", F.col("__a__") - F.lit(int(spec.preceding)))
        r = r.withColumn("__b0__", (F.col("__lo__") / F.lit(W)).cast("long"))
    r = r.select(req_id, *keys, "__a__", "__b__",
                 *(["__lo__", "__b0__"] if bounded else []))

    pcols = _pcols(aggs)

    # ---- carry: full buckets strictly inside the frame, from partials
    P = state.partials()
    if P is not None:
        cond = reduce(and_, [F.col(f"r.{k}").eqNullSafe(F.col(f"p.{k}"))
                             for k in keys])
        cond = cond & (F.col(f"p.{_B}") < F.col("r.__b__"))
        if bounded:
            cond = cond & (F.col(f"p.{_B}") > F.col("r.__b0__"))
        # partials are metadata-sized relative to history, but at
        # 10^12-turn scale keys × buckets can still exceed broadcast
        # limits — broadcast only under the recorded pair count
        Pside = F.broadcast(P.alias("p")) if state._carry_small() \
            else P.alias("p")
        carry = (r.alias("r")
                 .join(Pside, cond, "left")
                 .groupBy(f"r.{req_id}")
                 .agg(*_merge(aggs)))
        carry = carry.select(F.col(f"r.{req_id}").alias(req_id),
                             *[F.col(c).alias(f"__car_{c}") for c in pcols])
    else:
        carry = None

    # ---- edge buckets from raw history, globally time-pruned
    # (driver-side min over the SERVING batch — metadata-sized)
    lo_col = "__b0__" if bounded else "__b__"
    gmin = r.agg(F.min(F.col(lo_col) * F.lit(W)).alias("g")).collect()[0]["g"]
    h_ms = _order_ms(history, spec.order_by)
    H = history.withColumn("__hms__", h_ms) \
               .withColumn("__hb__", (h_ms / F.lit(W)).cast("long"))
    if gmin is not None:
        H = H.filter(F.col("__hms__") >= gmin)
    econd = reduce(and_, [F.col(f"r.{k}").eqNullSafe(F.col(f"h.{k}"))
                          for k in keys])
    in_edge = F.col(f"h.__hb__") == F.col("r.__b__")
    if bounded:
        in_edge = in_edge | (F.col(f"h.__hb__") == F.col("r.__b0__"))
    econd = econd & in_edge & (F.col("h.__hms__") <= F.col("r.__a__"))
    if bounded:
        econd = econd & (F.col("h.__hms__") >= F.col("r.__lo__"))
    edge = (r.alias("r").join(H.alias("h"), econd, "inner")
            .groupBy(f"r.{req_id}")
            .agg(*[e for e in _pexprs(aggs)]))
    edge = edge.select(F.col(f"r.{req_id}").alias(req_id),
                       *[F.col(c).alias(f"__edg_{c}") for c in pcols])

    # ---- fold: carry ⊕ edge ⊕ the request row itself (current row)
    out = requests.join(edge, on=req_id, how="left")
    if carry is not None:
        out = out.join(carry, on=req_id, how="left")
    else:
        for c in pcols:
            out = out.withColumn(f"__car_{c}", F.lit(None))

    int_wrap = (T.ByteType, T.ShortType, T.IntegerType)
    for i, a in enumerate(aggs):
        base = a.func[:-6] if a.func.endswith("_where") else a.func
        own = F.col(a.col) if a.col else F.lit(1)
        gate = F.col(a.cond) if a.cond else F.lit(True)
        own = F.when(gate.eqNullSafe(F.lit(True)), own)
        rt = _result_type(a, requests.schema[a.col].dataType if a.col
                          else T.LongType())
        cs, cc, cm = f"__car___s{i}__", f"__car___c{i}__", f"__car___m{i}__"
        es, ec, em = f"__edg___s{i}__", f"__edg___c{i}__", f"__edg___m{i}__"
        if base in ("sum", "avg"):
            s = (F.coalesce(F.col(cs), F.lit(0)) + F.coalesce(F.col(es), F.lit(0))
                 + F.coalesce(own, F.lit(0)))
            s = F.when(F.col(cs).isNotNull() | F.col(es).isNotNull()
                       | own.isNotNull(), s)
            c = (F.coalesce(F.col(cc), F.lit(0)) + F.coalesce(F.col(ec), F.lit(0))
                 + F.when(own.isNotNull(), 1).otherwise(0))
            if base == "avg":
                e = F.when(c > 0, s.cast("double") / c)
            else:
                dt = requests.schema[a.col].dataType
                if isinstance(dt, int_wrap):
                    bits = {T.ByteType: 8, T.ShortType: 16,
                            T.IntegerType: 32}[type(dt)]
                    e = (F.pmod(s + F.lit(2 ** (bits - 1)), F.lit(2 ** bits))
                         - 2 ** (bits - 1)).cast(dt)
                else:
                    e = s.cast(rt)
        elif base == "count":
            e = (F.coalesce(F.col(cc), F.lit(0)) + F.coalesce(F.col(ec), F.lit(0))
                 + F.when(own.isNotNull(), 1).otherwise(0)).cast("long")
        elif base == "min":
            e = F.least(F.col(cm), F.col(em), own.cast(rt)).cast(rt)
        else:
            e = F.greatest(F.col(cm), F.col(em), own.cast(rt)).cast(rt)
        out = out.withColumn(a.name, e)
    return out.select(*requests.columns, *[a.name for a in aggs])
