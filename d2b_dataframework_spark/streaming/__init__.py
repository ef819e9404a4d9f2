from d2b_dataframework_spark.streaming.microbatch import (  # noqa: F401
    EVENTS_SCHEMA_DDL,
    poll_connector_stream,
    run_available_now,
    stream_files,
    to_date_sharded_sink,
    windowed_kpis,
)
