from mini_feature_store_spark.pipelines.batch_inference import (  # noqa: F401
    BatchInferenceConfig,
    run_batch_inference,
)
from mini_feature_store_spark.pipelines.backfill import (  # noqa: F401
    BackfillConfig,
    run_backfill,
    run_backfill_incremental,
)
from mini_feature_store_spark.pipelines.consistency import (  # noqa: F401
    online_offline_diff,
)
from mini_feature_store_spark.pipelines.pit_join import (  # noqa: F401
    PointInTimeJoinConfig,
    run_pit_join,
)
from mini_feature_store_spark.pipelines.online_sync import (  # noqa: F401
    FileKVStore,
    OnlineSyncConfig,
    run_online_sync,
)
