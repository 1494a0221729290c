"""DEPLOY ... OPTIONS(long_windows="w:1h") — the reference's
long-window optimization (DEPLOY_STATEMENT.md:110-160; pre-agg storage
aggregator.h:40-56) served from materialized bucket partials: full
buckets come from the pre-agg state, only edge buckets are read from
raw history, and the state catches up incrementally as data arrives.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

HOUR = 3_600_000


def _engine(spark):
    from openmldb_spark.sql import SqlEngine

    return SqlEngine(spark)


def _hist_rows(lo, hi):
    # conv c1 every 17 min, conv c2 every 40 min; v carries the index
    rows = [("c1", i * 17 * 60_000, float(i), "user") for i in range(lo, hi)]
    rows += [("c2", i * 40 * 60_000, float(100 + i), "tool")
             for i in range(lo, hi)]
    return rows


_SCHEMA = "conv_id string, ts bigint, v double, role string"

_SQL = ("SELECT conv_id, ts, sum(v) OVER w AS sv, count(v) OVER w AS cv, "
        "avg(v) OVER w AS av, min(v) OVER w AS mn, max(v) OVER w AS mx "
        "FROM conv_hist "
        "WINDOW w AS (PARTITION BY conv_id ORDER BY ts "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")

_SQL_BOUNDED = ("SELECT conv_id, ts, sum(v) OVER w AS sv, count(v) OVER w AS cv "
                "FROM conv_hist "
                "WINDOW w AS (PARTITION BY conv_id ORDER BY ts "
                "ROWS_RANGE BETWEEN 2h PRECEDING AND CURRENT ROW)")


def _reqs(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _collect(df):
    cols = [c for c in df.columns if c not in ("role",)]
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.fixture()
def engines(spark):
    """(optimized engine, baseline engine) over identical data."""
    out = []
    for _ in range(2):
        e = _engine(spark)
        e.sql("create table conv_hist (conv_id string, ts bigint, "
              "v double, role string)")
        out.append(e)
    return out


def _insert(engines, rows):
    vals = ", ".join(f"('{c}', {t}, {v}, '{r}')" for c, t, v, r in rows)
    for e in engines:
        e.sql(f"insert into conv_hist values {vals}")


def test_long_windows_matches_generic_path(engines, spark):
    opt, base = engines
    opt.sql(f'DEPLOY d OPTIONS(long_windows="w:1h") {_SQL}')
    base.sql(f"DEPLOY d {_SQL}")
    _insert(engines, _hist_rows(0, 30))

    reqs = _reqs(spark, [("c1", 9 * HOUR, 50.0, "user"),
                         ("c2", 9 * HOUR, 60.0, "user"),
                         ("c3", 9 * HOUR, 70.0, "user")])  # unseen key
    got = _collect(opt.request("d", reqs))
    exp = _collect(base.request("d", reqs))
    assert got == exp
    # the optimized path actually built pre-agg state
    assert ("d", "w") in opt._lw_states
    assert opt._lw_states[("d", "w")]["t"].meta["generations"]


def test_long_windows_incremental_catchup(engines, spark):
    opt, base = engines
    opt.sql(f'DEPLOY d OPTIONS(long_windows="w:1h") {_SQL}')
    base.sql(f"DEPLOY d {_SQL}")
    _insert(engines, _hist_rows(0, 20))

    r1 = _reqs(spark, [("c1", 6 * HOUR, 5.0, "user")])
    assert _collect(opt.request("d", r1)) == _collect(base.request("d", r1))
    state = opt._lw_states[("d", "w")]["t"]
    n_gens = len(state.meta["generations"])

    # later data arrives (increasing ts — the reference's contract)
    _insert(engines, _hist_rows(20, 30))
    r2 = _reqs(spark, [("c1", 9 * HOUR, 5.0, "user"),
                       ("c2", 9 * HOUR, 6.0, "user")])
    assert _collect(opt.request("d", r2)) == _collect(base.request("d", r2))
    # catch-up appended a generation holding ONLY the new rows' buckets
    gens = state.meta["generations"]
    assert len(gens) == n_gens + 1
    new_pairs = len({("c1", (i * 17 * 60_000) // HOUR) for i in range(20, 30)}
                    | {("c2", (i * 40 * 60_000) // HOUR) for i in range(20, 30)})
    assert gens[-1]["pairs"] == new_pairs


def test_long_windows_bounded_rows_range(engines, spark):
    opt, base = engines
    opt.sql(f'DEPLOY d OPTIONS(long_windows="w:1h") {_SQL_BOUNDED}')
    base.sql(f"DEPLOY d {_SQL_BOUNDED}")
    _insert(engines, _hist_rows(0, 30))

    reqs = _reqs(spark, [("c1", 5 * HOUR + 1, 50.0, "user"),
                         ("c1", 8 * HOUR, 51.0, "user"),
                         ("c2", 7 * HOUR, 60.0, "user")])
    got = _collect(opt.request("d", reqs))
    exp = _collect(base.request("d", reqs))
    assert got == exp


def test_long_windows_multi_request_isolation(engines, spark):
    """Two requests on one key: each sees stored rows + itself only —
    the serve path is per-request by construction; the generic path
    uses INSTANCE_NOT_IN_WINDOW."""
    opt, base = engines
    opt.sql(f'DEPLOY d OPTIONS(long_windows="w:1h") {_SQL}')
    base.sql(f"DEPLOY d {_SQL}")
    _insert(engines, _hist_rows(0, 12))

    reqs = _reqs(spark, [("c1", 4 * HOUR, 1000.0, "user"),
                         ("c1", 4 * HOUR, 2000.0, "user")])
    got = _collect(opt.request("d", reqs))
    exp = _collect(base.request("d", reqs))
    assert got == exp
    # sums must differ by exactly the request's own v — no cross-leak
    svs = sorted(r[2] for r in got)
    assert svs[1] - svs[0] == 1000.0


def test_long_windows_option_is_a_hint(engines, spark):
    """long_windows is an optimization hint (the reference's corpus
    deploys with row-count buckets onto pre-loaded tables): windows
    that can't take the pre-agg path are silently evaluated on the
    generic path, never an error."""
    opt, base = engines
    # row-count bucket + unknown window name → both ignored
    opt.sql(f'DEPLOY d1 OPTIONS(long_windows="w:100,nope:1h") {_SQL}')
    assert opt.deployments["d1"]["long_windows"] == {}
    # interval bucket on a pre-loaded table is fine: state builds
    # lazily from stored history at the first request
    _insert(engines, _hist_rows(0, 8))
    opt.sql(f'DEPLOY d2 OPTIONS(long_windows="w:1h") {_SQL}')
    base.sql(f"DEPLOY d2 {_SQL}")
    reqs = _reqs(spark, [("c1", 3 * HOUR, 5.0, "user")])
    assert _collect(opt.request("d2", reqs)) == _collect(base.request("d2", reqs))
    assert _collect(opt.request("d1", reqs)) == _collect(base.request("d2", reqs))
