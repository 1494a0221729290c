"""Unit tests for the DML/IO statement surface added in round 4:
DELETE, SELECT INTO OUTFILE, LOAD DATA INFILE, DROP TABLE, dual
online/offline stores (execute_mode), CREATE INDEX TTL visibility,
SHOW VARIABLES / DESC, and multi-database namespaces.

Reference semantics: DELETE_STATEMENT.md, SELECT_INTO_STATEMENT.md,
LOAD_DATA_STATEMENT.md, CREATE_INDEX_STATEMENT.md, and the
function/out_in + integration_test/out_in corpus files (which also run
end-to-end in test_reference_cases.py — these tests pin the engine API
behavior directly).
"""

from __future__ import annotations

import pytest

from openmldb_spark.sql import SqlEngine


@pytest.fixture()
def eng(spark):
    e = SqlEngine(spark)
    df = spark.createDataFrame(
        [(1, "aa", 100), (2, "bb", 200), (3, None, 300)],
        "id int, c1 string, ts bigint")
    e.register("t0", df)
    return e


def test_delete_by_key(eng):
    eng.sql("delete from t0 where c1='aa'")
    assert sorted(r.id for r in eng.sql("select * from t0").collect()) == [2, 3]


def test_delete_null_bucket(eng):
    # key = NULL addresses the NULL bucket, not three-valued UNKNOWN
    eng.sql("delete from t0 where c1=null")
    assert sorted(r.id for r in eng.sql("select * from t0").collect()) == [1, 2]


def test_delete_timestamp_ms_literal(spark):
    e = SqlEngine(spark)
    e.register("t", spark.sql(
        "select 1 as id, timestamp_millis(1590738989000) as c7 union all "
        "select 2, timestamp_millis(1590738990000)"))
    e.sql("delete from t where c7=1590738989000")
    assert [r.id for r in e.sql("select * from t").collect()] == [2]


def test_outfile_load_roundtrip_csv(eng, tmp_path):
    out = f"{tmp_path}/t0.csv"
    eng.sql(f"select * from t0 into outfile '{out}'")
    eng.register("t1", eng.sql("select * from t0").limit(0))
    eng.sql(f"load data infile '{out}' into table t1")
    got = sorted((r.id, r.c1, r.ts) for r in eng.sql("select * from t1").collect())
    assert got == [(1, "aa", 100), (2, "bb", 200), (3, None, 300)]


def test_outfile_parquet_roundtrip(eng, tmp_path):
    out = f"{tmp_path}/t0.parquet"
    eng.sql(f"select * from t0 into outfile '{out}' options(format='parquet')")
    eng.register("t2", eng.sql("select * from t0").limit(0))
    eng.sql(f"load data infile '{out}' into table t2 options(format='parquet')")
    assert eng.sql("select * from t2").count() == 3


def test_load_error_if_exists_guard(eng, tmp_path):
    out = f"{tmp_path}/t0.csv"
    eng.sql(f"select * from t0 into outfile '{out}'")
    with pytest.raises(ValueError, match="already has data"):
        eng.sql(f"load data infile '{out}' into table t0 "
                f"options(mode='error_if_exists')")


def test_offline_store_isolation(eng, tmp_path):
    # offline statements must not see or touch online rows
    out = f"{tmp_path}/t0.csv"
    eng.sql(f"select * from t0 into outfile '{out}'")
    eng.sql("set @@execute_mode = 'offline'")
    assert eng.sql("select * from t0").count() == 0  # offline starts empty
    eng.sql(f"load data infile '{out}' into table t0 options(mode='append')")
    assert eng.sql("select * from t0").count() == 3
    eng.sql("set @@execute_mode = 'online'")
    assert eng.sql("select * from t0").count() == 3  # online untouched


def test_drop_table(eng):
    eng.sql("drop table t0")
    with pytest.raises(ValueError, match="unknown table"):
        eng.sql("select * from t0")


def test_show_variables_and_desc(eng):
    eng.sql("set @@SESSION.execute_mode = 'online'")
    rows = eng.sql("show variables").collect()
    assert ("execute_mode", "online") in [(r[0], r[1]) for r in rows]
    d = {r.Field: r.Type for r in eng.sql("desc t0").collect()}
    assert d == {"id": "int", "c1": "string", "ts": "bigint"}


def test_create_index_ttl_read_time(spark):
    e = SqlEngine(spark)
    e.sql("create table tt (id int, k string, v int, ts timestamp, "
          "index(key=(k), ts=ts))")
    e.sql("insert into tt values (1,'a',1,1000),(2,'a',2,2000),(3,'a',3,3000)")
    e.sql("CREATE INDEX ix2 ON tt (k) OPTIONS (ts=ts, ttl=2, ttl_type=latest)")
    assert sorted(r.id for r in e.sql("select * from tt").collect()) == [2, 3]
    # TTL applies at read time: a later insert expires the oldest
    e.sql("insert into tt values (4,'a',4,4000)")
    assert sorted(r.id for r in e.sql("select * from tt").collect()) == [3, 4]


def test_show_tables_and_databases(spark):
    e = SqlEngine(spark)
    e.register("ta", spark.range(1))
    e.register("tb", spark.range(1))
    assert [r.Tables for r in e.sql("show tables").collect()] == ["ta", "tb"]
    e.sql("create database d1")
    e.register("tc", spark.range(1), db="d1")
    assert [r.Database for r in e.sql("show databases").collect()] == ["d1"]
    e.sql("use d1")
    assert [r.Tables for r in e.sql("show tables").collect()] == ["tc"]


def test_multi_database_namespace(spark):
    e = SqlEngine(spark)
    e.sql("create database dbx")
    e.register("tx", spark.range(3).selectExpr("id"), db="dbx")
    assert e.sql("select * from dbx.tx").count() == 3
    e.sql("use dbx")
    assert e.sql("select * from tx").count() == 3
    e.sql("drop database dbx")
    with pytest.raises(ValueError):
        e.sql("select * from tx")


def test_job_management_surface(spark, tmp_path):
    """SHOW JOBS / SHOW JOB id / STOP JOB id — the TaskManager job
    registry (docs/en/openmldb_sql/task_manage/*; JobInfo.java:32).
    The engine runs jobs synchronously, so LOAD DATA / SELECT INTO
    land in a FINAL_STATE immediately."""
    import pytest

    from openmldb_spark.sql import SqlEngine

    eng = SqlEngine(spark)
    eng.sql("create table jt (a int, b string)")
    eng.sql("insert into jt values (1, 'x'), (2, 'y')")
    out = str(tmp_path / "out.parquet")
    eng.sql(f"select * from jt into outfile '{out}' options(format='parquet')")
    eng.sql(f"load data infile '{out}' into table jt "
            f"options(format='parquet', mode='append')")

    jobs = {r.job_id: r for r in eng.sql("show jobs").collect()}
    assert len(jobs) == 2
    assert jobs[1].job_type == "ExportOfflineData"
    assert jobs[2].job_type == "ImportOnlineData"
    assert all(j.state == "finished" and j.component == "TaskManager"
               for j in jobs.values())

    one = eng.sql("show job 2").collect()
    assert len(one) == 1 and one[0].parameter == out

    # STOP on a finished job is a no-op returning the row
    assert eng.sql("stop job 2").collect()[0].state == "finished"
    with pytest.raises(ValueError, match="not found"):
        eng.sql("show job 99")

    # failed jobs are recorded with the error
    with pytest.raises(Exception):
        eng.sql("load data infile '/nope.csv' into table jt")
    j3 = eng.sql("show job 3").collect()[0]
    assert j3.state == "failed" and j3.error
