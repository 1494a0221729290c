"""Sources & sinks — the reference's LOAD DATA / SELECT INTO surface.

Parity targets:
- ``LOAD DATA`` (``java/openmldb-batch/.../nodes/LoadDataPlan.scala``,
  ``utils/DataSourceUtil.scala:91-100``): csv/parquet files or catalog
  sources (hive/iceberg), with **schema validation against the declared
  table schema** — no silent inference drift.
- ``SELECT INTO OUTFILE`` (``nodes/SelectIntoPlan.scala:35-67``):
  csv/parquet writes with mode control.

Iceberg needs its runtime jars on the classpath; in this sandbox they
are absent, so the Iceberg catalog helper degrades to a clear error
(and the parquet path is the tested default). On a real cluster, pass
``iceberg_catalog_conf()`` values into the SparkSession builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "load_data",
    "select_into",
    "iceberg_available",
    "iceberg_catalog_conf",
    "read_table",
    "write_table",
]


class SchemaMismatch(ValueError):
    pass


def _validate(df: DataFrame, schema: T.StructType, source: str) -> DataFrame:
    """LOAD DATA validates file schema against the declared schema
    (LoadDataPlan.scala:52-57): same column names; types coercible."""
    got = {f.name: f.dataType for f in df.schema.fields}
    want = {f.name: f.dataType for f in schema.fields}
    missing = [c for c in want if c not in got]
    extra = [c for c in got if c not in want]
    if missing or extra:
        raise SchemaMismatch(
            f"{source}: schema mismatch — missing columns {missing}, unexpected {extra}"
        )
    from pyspark.sql import functions as F

    return df.select(*[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields])


def load_data(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    header: bool = True,
    delimiter: str = ",",
    null_value: str | None = None,
) -> DataFrame:
    """LOAD DATA INFILE analogue: read + validate against the declared
    schema (never infer-and-hope)."""
    fmt = fmt.lower()
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "csv":
        reader = spark.read.option("header", str(header).lower()).option("delimiter", delimiter)
        if null_value is not None:
            reader = reader.option("nullValue", null_value)
        # read as declared schema directly — csv has no embedded types
        df = reader.schema(schema).csv(path)
        return df
    elif fmt == "json":
        df = spark.read.schema(schema).json(path)
        return df
    else:
        raise ValueError(f"unsupported LOAD DATA format {fmt!r}")
    return _validate(df, schema, path)


def select_into(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",  # error | overwrite | append (reference modes)
    header: bool = True,
    delimiter: str = ",",
    partition_by: list[str] | None = None,
) -> None:
    """SELECT ... INTO OUTFILE analogue."""
    fmt = fmt.lower()
    writer = df.write.mode({"error": "errorifexists"}.get(mode, mode))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", str(header).lower()).option("delimiter", delimiter).csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported SELECT INTO format {fmt!r}")


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def iceberg_catalog_conf(name: str = "ice", warehouse: str = "/tmp/ice_warehouse") -> dict[str, str]:
    """SparkSession conf for a hadoop-catalog Iceberg setup (reference:
    docs/en/integration/offline_data_sources/iceberg.md). Requires the
    iceberg-spark-runtime jar on the classpath."""
    return {
        f"spark.sql.catalog.{name}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{name}.type": "hadoop",
        f"spark.sql.catalog.{name}.warehouse": warehouse,
    }


def read_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Catalog-or-files table reader: Iceberg/hive table if the catalog
    resolves it, else ``{sf_dir}/{name}.parquet``."""
    if sf_dir is None:
        return spark.table(name)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_table(df: DataFrame, name: str, mode: str = "append") -> None:
    """Iceberg-first writer (``df.writeTo`` v2 API); falls back to
    ``saveAsTable`` for session-catalog tables."""
    try:
        if mode == "overwrite":
            df.writeTo(name).createOrReplace()
        else:
            df.writeTo(name).append()
    except Exception:  # noqa: BLE001 — v1 session catalog fallback
        df.write.mode(mode).saveAsTable(name)
