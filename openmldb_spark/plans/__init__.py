from openmldb_spark.plans.backfill import AsOfSource, FeatureWindow, backfill_features
from openmldb_spark.plans.checkpoint import CheckpointedPipeline, Stage

__all__ = ["backfill_features", "AsOfSource", "FeatureWindow", "CheckpointedPipeline", "Stage"]
