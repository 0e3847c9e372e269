from mini_feature_store_spark.operators.rolling import (  # noqa: F401
    backfill_features_join_form,
    backfill_features_window_form,
)
from mini_feature_store_spark.operators.point_in_time import (  # noqa: F401
    point_in_time_join,
)
from mini_feature_store_spark.operators.latest import latest_per_key  # noqa: F401
