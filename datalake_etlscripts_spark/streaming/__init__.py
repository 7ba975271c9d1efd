from datalake_etlscripts_spark.streaming.ingest import (  # noqa: F401
    fold_batch_views,
    run_streaming_cdc_mirror,
    run_streaming_feature_store,
    run_streaming_scd2,
    run_streaming_minibatch_kmeans,
    run_streaming_sensor_alerts,
    run_streaming_trending_terms,
    run_streaming_ingest,
    run_streaming_ingest_with_views,
    streaming_merge_batch,
    windowed_event_counts,
)
