from cianparser_spark.streaming.streams import (  # noqa: F401
    EVENTS_SCHEMA,
    crawl_metrics_stream,
    event_window_counts,
    first_wins_stream,
)
