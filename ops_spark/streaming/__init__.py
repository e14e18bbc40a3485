from ops_spark.streaming.runner import (
    documents_stream,
    events_stream,
    run_bounded,
)

__all__ = ["documents_stream", "events_stream", "run_bounded"]
