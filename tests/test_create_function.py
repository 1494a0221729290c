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
