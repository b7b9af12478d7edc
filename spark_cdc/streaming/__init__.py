"""spark_cdc.streaming — Structured Streaming CDC ingestion."""

from spark_cdc.streaming.stream_runner import StreamRunner

__all__ = ["StreamRunner"]
