from openmldb_spark.operators.window import WindowSpec, Agg, window_agg
from openmldb_spark.operators.last_join import last_join
from openmldb_spark.operators.long_window import long_window_agg
from openmldb_spark.operators.sessionize import sessionize
from openmldb_spark.operators.skew import window_agg_skewed

__all__ = ["WindowSpec", "Agg", "window_agg", "last_join", "long_window_agg",
           "sessionize", "window_agg_skewed"]
