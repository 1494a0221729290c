"""DDL surface: CREATE TABLE / INSERT INTO through the SQL front-end
(reference nodes/CreateTablePlan.scala, InsertPlan.scala) — create,
insert, and query an engine table via SQL only."""

from __future__ import annotations


def _engine(spark):
    from openmldb_spark.sql import SqlEngine

    return SqlEngine(spark)


def test_create_insert_query(spark):
    eng = _engine(spark)
    eng.sql("CREATE TABLE ddl_t (id int, name string, ts timestamp, "
            "v double, index(key=id, ts=ts))")
    assert eng.index_ts["ddl_t"] == "ts"
    eng.sql("INSERT INTO ddl_t VALUES (1, 'a', timestamp(1000), 1.5), "
            "(2, 'b', timestamp(2000), 2.5)")
    eng.sql("INSERT INTO ddl_t (id, name) VALUES (3, 'c')")
    out = eng.sql("select id, name, v from ddl_t").orderBy("id").collect()
    assert [(r.id, r.name, r.v) for r in out] == [
        (1, "a", 1.5), (2, "b", 2.5), (3, "c", None)]


def test_create_as_select_and_insert_select(spark):
    eng = _engine(spark)
    eng.sql("CREATE TABLE src (id int, v int)")
    eng.sql("INSERT INTO src VALUES (1, 10), (2, 20)")
    eng.sql("CREATE TABLE dst AS SELECT id, v * 2 as v2 FROM src")
    eng.sql("INSERT INTO dst SELECT id + 10 as id, v as v2 FROM src")
    rows = eng.sql("select id, v2 from dst").orderBy("id").collect()
    assert [(r.id, r.v2) for r in rows] == [
        (1, 20), (2, 40), (11, 10), (12, 20)]


def test_alias_shadows_database_name(spark):
    """A statement alias (or FROM table) that collides with a
    registered database name must win: ``t1.c1`` with alias t1 is a
    column reference even when database t1 holds a table c1
    (ADVICE r4: _flatten_db_names alias collision)."""
    from openmldb_spark.sql import SqlEngine

    eng = SqlEngine(spark)
    eng.register("c1", spark.createDataFrame([(9,)], "x int"), db="t1")
    eng.sql("create database main_db")
    eng.sql("use main_db")
    eng.sql("create table base (c1 int, k int)")
    eng.sql("insert into base values (5, 1)")
    # alias qualification — NOT the db table
    assert eng.sql("select t1.c1 from base t1").collect()[0][0] == 5
    # unaliased table-name qualification — also shadowed
    assert eng.sql("select base.c1 from base").collect()[0][0] == 5
    # genuine cross-db reference still flattens to the db table
    assert eng.sql("select x from t1.c1").collect()[0][0] == 9


def test_show_variables_defaults(spark):
    """SHOW VARIABLES reports the canonical variable set with defaults
    (reference docs SET_STATEMENT.md; cases/integration_test/ddl/
    test_execute_mode.yaml), with explicit SETs overlaid."""
    eng = _engine(spark)
    rows = {r.Variable_name: r.Value
            for r in eng.sql("SHOW VARIABLES").collect()}
    assert rows == {"enable_trace": "false", "execute_mode": "online",
                    "job_timeout": "20000", "sync_job": "false"}
    eng.sql('SET @@SESSION.execute_mode = "online"')
    eng.sql("SET @@job_timeout = '99'")
    rows = {r.Variable_name: r.Value
            for r in eng.sql("SHOW VARIABLES").collect()}
    assert rows["execute_mode"] == "online"
    assert rows["job_timeout"] == "99"
    assert rows["enable_trace"] == "false"


def test_implicit_select_alias(spark):
    """ZetaSQL implicit alias: ``expr alias`` without AS (reference
    corpus test_online_batch_config.yaml id 4 uses
    ``count(*) total_count``)."""
    eng = _engine(spark)
    eng.sql("CREATE TABLE ia_t (id int, v int)")
    eng.sql("INSERT INTO ia_t VALUES (1, 10), (2, 20), (3, 30)")
    out = eng.sql("select count(*) total_count from ia_t").collect()
    assert out[0].total_count == 3
    out = eng.sql("select sum(v) s, max(v) mx from ia_t").collect()
    assert (out[0].s, out[0].mx) == (60, 30)
    # reserved tails must NOT be eaten as aliases
    out = eng.sql(
        "select id, sum(v) over w as sv from ia_t "
        "window w as (partition by id order by id "
        "rows between unbounded preceding and current row)").collect()
    assert {r.sv for r in out} == {10, 20, 30}
