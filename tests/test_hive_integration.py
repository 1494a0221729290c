"""Docker-less Hive-catalog integration: a real Derby-metastore Hive
session (Spark's embedded metastore) exercising the engine's catalog
surfaces — write_table / auto_load('hive://db.tbl') / read_table —
end-to-end in a SUBPROCESS (a Hive-enabled session cannot share the
JVM with the plain test session)."""

from __future__ import annotations

import subprocess
import sys
import tempfile

_SCRIPT = r"""
import os, sys, tempfile
d = tempfile.mkdtemp(prefix="omldb_hive")
os.chdir(d)
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", f"{{d}}/warehouse")
    .config("spark.driver.extraJavaOptions", f"-Dderby.system.home={{d}}/derby")
    .config("spark.ui.enabled", "false")
    .enableHiveSupport().getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from openmldb_spark.sources.io import auto_load, hive_available, read_table, write_table

assert hive_available(spark), "hive catalog not active"
spark.sql("CREATE DATABASE IF NOT EXISTS feat")
df = spark.createDataFrame(
    [(1, "a", 1.5), (2, "b", 2.5)], "id int, name string, v double")
write_table(df, "feat.turns", mode="overwrite")
write_table(spark.createDataFrame([(3, "c", 3.5)], df.schema), "feat.turns")

got = auto_load(spark, "hive://feat.turns")
rows = sorted((r.id, r.name, r.v) for r in got.collect())
assert rows == [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)], rows

# declared-schema validation through the catalog route
from pyspark.sql import types as T
schema = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("name", T.StringType()),
    T.StructField("v", T.DoubleType()),
])
assert auto_load(spark, "hive://feat.turns", schema=schema).count() == 3

assert read_table(spark, "feat.turns").count() == 3
print("HIVE_INTEGRATION_OK")
"""


def test_hive_derby_catalog_roundtrip():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_SCRIPT.format(repo=repo))
        path = f.name
    r = subprocess.run([sys.executable, path], capture_output=True, text=True,
                       timeout=420)
    assert "HIVE_INTEGRATION_OK" in r.stdout, (
        f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-2000:]}")
