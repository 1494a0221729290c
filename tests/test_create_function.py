"""SQL CREATE FUNCTION surface (VERDICT r3 #9): register and call
Python-backed UDFs through ``SqlEngine.sql`` only — the PySpark
analogue of the reference's dynamic-library UDF registration
(ddl/CREATE_FUNCTION.md, udf_develop_guide.md)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def eng(spark):
    from openmldb_spark.sql import SqlEngine

    e = SqlEngine(spark)
    df = spark.createDataFrame(
        [(1, "alpha", 10), (2, "bravo", 20), (3, "charlie", 30)],
        "id int, name string, v int")
    e.register("t1", df)
    return e


def test_create_function_from_py_file(eng, tmp_path):
    impl = tmp_path / "udfs.py"
    impl.write_text("def cut2(s):\n    return None if s is None else s[:2]\n")
    eng.sql(f"CREATE FUNCTION cut2(x STRING) RETURNS STRING "
            f"OPTIONS (FILE='{impl}')")
    rows = sorted((r.id, r.c) for r in
                  eng.sql("select id, cut2(name) as c from t1").collect())
    assert rows == [(1, "al"), (2, "br"), (3, "ch")]


def test_create_function_prebound_and_symbol(eng, tmp_path):
    eng.register_py_udf("add_one", lambda x, y: None if x is None or y is None else x + y)
    eng.sql("CREATE FUNCTION add_one(x INT, y INT) RETURNS INT")
    rows = sorted((r.id, r.s) for r in
                  eng.sql("select id, add_one(id, v) as s from t1").collect())
    assert rows == [(1, 11), (2, 22), (3, 33)]

    impl = tmp_path / "impl.py"
    impl.write_text("def _mul(a, b):\n    return a * b\n")
    eng.sql(f"CREATE FUNCTION mul2(x INT, y INT) RETURNS BIGINT "
            f"OPTIONS (FILE='{impl}', SYMBOL='_mul')")
    rows = sorted((r.id, r.m) for r in
                  eng.sql("select id, mul2(id, v) as m from t1").collect())
    assert rows == [(1, 10), (2, 40), (3, 90)]


def test_create_aggregate_function(eng):
    eng.register_py_udf("special_sum", lambda s: s.sum() + 1)
    eng.sql("CREATE AGGREGATE FUNCTION special_sum(x BIGINT) RETURNS BIGINT")
    rows = eng.sql("select special_sum(v) as s from t1 group by 1=1").collect()
    assert len(rows) == 1 and rows[0].s == 61


def test_create_function_so_rejected(eng):
    with pytest.raises(ValueError, match="native libraries"):
        eng.sql("CREATE FUNCTION cut2(x STRING) RETURNS STRING "
                "OPTIONS (FILE='libtest_udf.so')")


def test_create_function_missing_impl(eng):
    with pytest.raises(ValueError, match="no implementation"):
        eng.sql("CREATE FUNCTION nosuch(x INT) RETURNS INT")


def test_show_and_drop_function(spark):
    """SHOW FUNCTIONS / DROP FUNCTION [IF EXISTS] (ddl/DROP_FUNCTION.md)
    + SHOW JOBLOG (task_manage/SHOW_JOBLOG.md)."""
    import pytest

    from openmldb_spark.sql import SqlEngine

    eng = SqlEngine(spark)
    eng.register_py_udf("trip", lambda x: None if x is None else x * 3)
    eng.sql("create function trip(x int) returns int")
    fns = eng.sql("show functions").collect()
    assert [(r.name, r.is_aggregate) for r in fns] == [("trip", False)]
    eng.sql("drop function trip")
    assert eng.sql("show functions").count() == 0
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("drop function trip")
    eng.sql("drop function if exists trip")  # no-op

    eng.sql("create table jl (a int)")
    eng.sql("insert into jl values (1)")
    import tempfile

    out = tempfile.mkdtemp() + "/x.parquet"
    eng.sql(f"select * from jl into outfile '{out}' options(format='parquet')")
    log = eng.sql("show joblog 1").collect()[0].log
    assert "ExportOfflineData" in log and "state=finished" in log
    with pytest.raises(ValueError, match="not found"):
        eng.sql("show joblog 9")
