from openmldb_spark.sql.engine import SqlEngine

__all__ = ["SqlEngine"]
