from openmldb_spark.plans.backfill import backfill_features

__all__ = ["backfill_features"]
