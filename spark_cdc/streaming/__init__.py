"""spark_cdc.streaming — Structured Streaming CDC ingestion."""

from spark_cdc.streaming.sessionize import sessionize_batch, sessionize_stream
from spark_cdc.streaming.stream_runner import MultiTableStreamRunner, StreamRunner

__all__ = [
    "MultiTableStreamRunner",
    "StreamRunner",
    "sessionize_batch",
    "sessionize_stream",
]
