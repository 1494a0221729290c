"""Sources & sinks — the reference's LOAD DATA / SELECT INTO surface.

Parity targets:
- ``LOAD DATA`` (``java/openmldb-batch/.../nodes/LoadDataPlan.scala``,
  ``utils/DataSourceUtil.scala:91-100``): csv/parquet files or catalog
  sources (hive/iceberg), with **schema validation against the declared
  table schema** — no silent inference drift.
- ``SELECT INTO OUTFILE`` (``nodes/SelectIntoPlan.scala:35-67``):
  csv/parquet writes with mode control.

Iceberg needs its runtime jars on the classpath; in this sandbox they
are absent (see ICEBERG.md for the probe log), so ``read_iceberg`` /
``auto_load('iceberg://…')`` route filesystem-path tables through the
pure-Python iceberg-lite format (sources/iceberg_lite.py — snapshots,
time travel, footer-stat pruning) and catalog names through
``spark.table`` (the real runtime, when its jar is present — pass
``iceberg_catalog_conf()`` values into the SparkSession builder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "load_data",
    "auto_load",
    "select_into",
    "iceberg_available",
    "iceberg_catalog_conf",
    "read_iceberg",
    "hive_available",
    "hive_catalog_conf",
    "tidb_catalog_conf",
    "s3_conf",
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


def hive_available(spark: SparkSession) -> bool:
    try:
        return spark.conf.get("spark.sql.catalogImplementation", "in-memory") == "hive"
    except Exception:  # noqa: BLE001
        return False


def hive_catalog_conf(metastore_uri: str | None = None) -> dict[str, str]:
    """SparkSession conf for Hive-metastore tables (reference:
    docs/en/integration/offline_data_sources/hive.md — the builder also
    needs ``.enableHiveSupport()``)."""
    conf = {"spark.sql.catalogImplementation": "hive"}
    if metastore_uri:
        conf["spark.hadoop.hive.metastore.uris"] = metastore_uri
    return conf


def tidb_catalog_conf(pd_addresses: str, tidb_addr: str, tidb_port: int = 4000,
                      user: str = "root", password: str = "",
                      catalog: str = "tidb_catalog") -> dict[str, str]:
    """SparkSession conf for TiDB via TiSpark (reference:
    docs/en/integration/offline_data_sources/tidb.md — needs the
    tispark-assembly + mysql-connector jars on the classpath)."""
    return {
        "spark.sql.extensions": "org.apache.spark.sql.TiExtensions",
        f"spark.sql.catalog.{catalog}": "org.apache.spark.sql.catalyst.catalog.TiCatalog",
        f"spark.sql.catalog.{catalog}.pd.addresses": pd_addresses,
        "spark.tispark.pd.addresses": pd_addresses,
        "spark.sql.tidb.addr": tidb_addr,
        "spark.sql.tidb.port": str(tidb_port),
        "spark.sql.tidb.user": user,
        "spark.sql.tidb.password": password,
    }


def s3_conf(access_key: str, secret_key: str, endpoint: str | None = None) -> dict[str, str]:
    """Hadoop s3a conf (reference docs/en/integration/
    offline_data_sources/s3.md — taskmanager spark.default.conf); with
    this set, s3a:// paths work in every file reader/writer here."""
    conf = {
        "spark.hadoop.fs.s3a.access.key": access_key,
        "spark.hadoop.fs.s3a.secret.key": secret_key,
    }
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    return conf


def _tidb_schema_map(df: DataFrame, schema: T.StructType) -> DataFrame:
    """TiDB surfaces every integer as BIGINT; narrow back to the
    declared width (DataSourceUtil.getMappingSchemaColumnsForTidb)."""
    from pyspark.sql import functions as F

    narrow = (T.IntegerType, T.ShortType)
    cols = []
    for a, b in zip(df.schema.fields, schema.fields):
        if a.name != b.name:
            raise SchemaMismatch(f"tidb schema mismatch: {a.name} != {b.name}")
        if a.dataType == b.dataType:
            cols.append(F.col(b.name))
        elif isinstance(a.dataType, T.LongType) and isinstance(b.dataType, narrow):
            cols.append(F.col(a.name).cast(b.dataType).alias(b.name))
        else:
            raise SchemaMismatch(
                f"tidb schema mismatch: {a.name} {a.dataType} !~ {b.dataType}")
    return df.select(*cols)


def auto_load(
    spark: SparkSession,
    uri: str,
    schema: T.StructType | None = None,
    fmt: str | None = None,
    **file_opts,
) -> DataFrame:
    """LOAD DATA's source router (``DataSourceUtil.autoLoad``): catalog
    URIs read via ``spark.table`` (``hive://db.tbl``, ``tidb://db.tbl``,
    ``iceberg://cat.db.tbl`` / any ``<catalog>.db.tbl``), everything
    else as files (``file://`` / ``hdfs://`` / ``s3a://`` paths honour
    the session's Hadoop conf — see ``s3_conf``)."""
    scheme, _, rest = uri.partition("://")
    if rest and scheme.lower() == "iceberg":
        from .iceberg_lite import IcebergLiteTable

        if IcebergLiteTable.exists(rest):
            df = IcebergLiteTable.load(rest).read(spark)
            return _validate(df, schema, uri) if schema is not None else df
    if rest and scheme.lower() in ("hive", "iceberg", "tidb"):
        name = rest
        df = spark.table(name)
        if schema is not None:
            if scheme.lower() == "tidb":
                return _tidb_schema_map(df, schema)
            return _validate(df, schema, uri)
        return df
    if schema is None:
        raise ValueError("file sources need a declared schema (no silent inference)")
    return load_data(spark, uri, schema, fmt=fmt or "parquet", **file_opts)


def read_iceberg(spark: SparkSession, location_or_name: str,
                 snapshot_id=None,
                 predicates: dict[str, tuple] | None = None) -> DataFrame:
    """Iceberg reader: a filesystem path holding an iceberg-lite table
    plans from its own metadata (snapshot + footer-stat pruning); a
    catalog name goes to ``spark.table`` (real runtime)."""
    from .iceberg_lite import IcebergLiteTable

    if IcebergLiteTable.exists(location_or_name):
        return IcebergLiteTable.load(location_or_name).read(
            spark, snapshot_id=snapshot_id, predicates=predicates)
    if snapshot_id is not None:
        return spark.read.option("snapshot-id", snapshot_id).table(location_or_name)
    return spark.table(location_or_name)


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
