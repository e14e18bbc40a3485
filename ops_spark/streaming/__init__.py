from ops_spark.streaming.runner import events_stream, run_bounded

__all__ = ["events_stream", "run_bounded"]
