"""spark_cdc.streaming — Structured Streaming CDC ingestion."""

from spark_cdc.streaming.enrich import AsofEnrichRunner, dim_history
from spark_cdc.streaming.sessionize import sessionize_batch, sessionize_stream
from spark_cdc.streaming.stream_runner import MultiTableStreamRunner, StreamRunner

__all__ = [
    "AsofEnrichRunner",
    "MultiTableStreamRunner",
    "StreamRunner",
    "dim_history",
    "sessionize_batch",
    "sessionize_stream",
]
