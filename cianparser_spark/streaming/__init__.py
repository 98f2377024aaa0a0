from cianparser_spark.streaming.streams import (  # noqa: F401
    EVENTS_SCHEMA,
    admission_stream,
    crawl_metrics_stream,
    event_window_counts,
    first_wins_stream,
)
