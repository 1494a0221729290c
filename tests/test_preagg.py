"""Incremental pre-agg state (operators/preagg.py) — append-then-read
equals full recompute, and appends touch only new buckets.

Reference parity target: insert-time bucket aggregation
(src/storage/aggregator.h:40-56) as append-only parquet generations.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from openmldb_spark.operators.long_window import long_window_agg
from openmldb_spark.operators.preagg import PreAggTable
from openmldb_spark.operators.window import Agg, WindowSpec

HOUR = 3_600_000

SPEC = WindowSpec(partition_by=("k",), order_by="ts", frame="rows_range",
                  preceding=None, tiebreak=("rid",))
AGGS = [
    Agg("sum", "v", "sv"),
    Agg("count", "v", "cv"),
    Agg("avg", "v", "av"),
    Agg("min", "v", "mn"),
    Agg("max", "v", "mx"),
    Agg("sum_where", "v", "sw", cond="flag"),
]


def _mkdf(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "ts", "rid", "v", "flag"])
    pdf["v"] = pdf["v"].astype("float64")
    return spark.createDataFrame(pdf.astype({"ts": "int64", "rid": "int64"}))


def _dataset():
    """3 time-ordered chunks over 2 keys × 30 points spanning ~5 buckets,
    with NULL values, a false-flag mix, and intra-bucket multiplicity."""
    import random

    rnd = random.Random(7)
    rows = []
    rid = 0
    for step in range(30):
        for k in ("a", "b"):
            ts = step * 17 * 60_000 + (3 if k == "b" else 0)  # 17-min grid
            v = None if step % 9 == 4 and k == "a" else rnd.randint(-50, 50)
            rows.append((k, ts, rid, v, rnd.random() < 0.5))
            rid += 1
    rows.sort(key=lambda r: r[1])
    n = len(rows)
    return rows[: n // 3], rows[n // 3: 2 * n // 3], rows[2 * n // 3:]


def _collect(df):
    return sorted(
        ((r.k, r.ts, r.rid,
          r.sv, r.cv, None if r.av is None else round(r.av, 9), r.mn, r.mx, r.sw)
         for r in df.collect())
    )


def test_append_equals_full_recompute(spark, tmp_path):
    c1, c2, c3 = _dataset()
    full = _mkdf(spark, c1 + c2 + c3)

    t = PreAggTable.create(spark, str(tmp_path / "state"), SPEC, AGGS, bucket_ms=HOUR)
    feats = []
    for chunk in (c1, c2, c3):
        feats.append(_collect(t.append(_mkdf(spark, chunk))))
    got = sorted(x for f in feats for x in f)

    exp = _collect(long_window_agg(full, SPEC, AGGS, bucket_ms=HOUR))
    assert got == exp


def test_append_touches_only_new_buckets(spark, tmp_path):
    c1, c2, c3 = _dataset()
    state = str(tmp_path / "state")
    t = PreAggTable.create(spark, state, SPEC, AGGS, bucket_ms=HOUR)
    t.append(_mkdf(spark, c1))

    gen0 = os.path.join(state, "gen=0")
    before = {f: os.path.getmtime(os.path.join(gen0, f))
              for f in os.listdir(gen0) if f.endswith(".parquet")}

    t.append(_mkdf(spark, c2))

    # prior generation untouched — append is O(new), never a rewrite
    after = {f: os.path.getmtime(os.path.join(gen0, f))
             for f in os.listdir(gen0) if f.endswith(".parquet")}
    assert before == after

    # the new generation holds exactly chunk 2's (key, bucket) pairs
    meta = json.load(open(os.path.join(state, "_preagg_meta.json")))
    pairs_c2 = len({(k, ts // HOUR) for (k, ts, *_rest) in c2})
    assert meta["generations"][1]["pairs"] == pairs_c2
    # and the state's watermark advanced to chunk 2's max ts
    assert meta["watermark_ms"] == max(ts for (_k, ts, *_r) in c2)


def test_out_of_order_append_raises(spark, tmp_path):
    c1, c2, _ = _dataset()
    t = PreAggTable.create(spark, str(tmp_path / "state"), SPEC, AGGS, bucket_ms=HOUR)
    t.append(_mkdf(spark, c2))
    with pytest.raises(ValueError, match="out-of-order"):
        t.append(_mkdf(spark, c1))


def test_compact_preserves_results(spark, tmp_path):
    c1, c2, c3 = _dataset()
    state = str(tmp_path / "state")
    t = PreAggTable.create(spark, state, SPEC, AGGS, bucket_ms=HOUR)
    f1 = _collect(t.append(_mkdf(spark, c1)))
    f2 = _collect(t.append(_mkdf(spark, c2)))
    n = t.compact()
    assert len(t.meta["generations"]) == 1 and n > 0

    f3 = _collect(t.append(_mkdf(spark, c3)))
    got = sorted(f1 + f2 + f3)
    exp = _collect(long_window_agg(_mkdf(spark, c1 + c2 + c3), SPEC, AGGS, bucket_ms=HOUR))
    assert got == exp


def test_reopen_from_disk(spark, tmp_path):
    c1, c2, c3 = _dataset()
    state = str(tmp_path / "state")
    t = PreAggTable.create(spark, state, SPEC, AGGS, bucket_ms=HOUR)
    f1 = _collect(t.append(_mkdf(spark, c1)))

    t2 = PreAggTable.open(spark, state)
    assert t2.spec == SPEC and t2.aggs == AGGS
    f2 = _collect(t2.append(_mkdf(spark, c2 + c3)))
    exp = _collect(long_window_agg(_mkdf(spark, c1 + c2 + c3), SPEC, AGGS, bucket_ms=HOUR))
    assert sorted(f1 + f2) == exp


def test_rejects_non_decomposable(spark, tmp_path):
    with pytest.raises(ValueError, match="non-decomposable"):
        PreAggTable.create(spark, str(tmp_path / "s"), SPEC,
                           [Agg("distinct_count", "v", "d")])
