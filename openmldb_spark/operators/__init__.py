from openmldb_spark.operators.window import WindowSpec, Agg, window_agg
from openmldb_spark.operators.last_join import last_join
from openmldb_spark.operators.sessionize import sessionize

__all__ = ["WindowSpec", "Agg", "window_agg", "last_join", "sessionize"]
