from mini_feature_store_spark.streaming.ingest import (  # noqa: F401
    deduplicated_stream,
    purchase_click_attribution_stream,
    read_event_stream,
    sessionized_activity,
    sliding_event_counts,
    stream_online_sync,
    windowed_event_counts,
)
