from datalake_etlscripts_spark.streaming.ingest import (  # noqa: F401
    run_streaming_ingest,
    streaming_merge_batch,
    windowed_event_counts,
)
