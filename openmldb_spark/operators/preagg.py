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

__all__ = ["PreAggTable"]

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
        if wm is not None:
            # one tiny job over the new chunk; at scale this is a
            # min() over the append, not a history scan
            lo = work.select(F.min(ord_ms).alias("o")).collect()[0]["o"]
            if lo is not None and lo < wm:
                raise ValueError(
                    f"out-of-order append: min order {lo} < watermark {wm}; "
                    f"pre-agg state requires ordered appends (rebuild or "
                    f"compact from raw history for corrections)")

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
