"""Event-time windowed streaming aggregation (SURVEY.md §2.7 C10).

The reference has no event-time windowing anywhere — SURVEY.md marks
it out-of-scope-but-supported. This module supplies the supported
part: tumbling-window counts with a watermark that bounds state and
drops late events, for monitoring change-event rates per table/op in
flight (the streaming analogue of the reference's per-cycle counters,
/root/reference/etl/core/pipeline.py:204-210).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Tumbling-window counts over an event-time stream.

    Works on both streaming and batch DataFrames (same plan — handy for
    oracle checks: batch mode must equal streaming append-mode output
    once the watermark has passed).
    """
    group_cols = group_cols if group_cols is not None else ["op"]
    src = stream
    if stream.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("win"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
        )
    )


def run_windowed_monitor(
    spark,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "cdc_monitor",
    window: str = "1 minute",
    watermark: str = "5 minutes",
    max_files_per_trigger: int | None = None,
):
    """Attach a windowed monitor to a change-log directory; results
    land in an in-memory sink table named ``query_name`` (swap for a
    lake/console sink in production)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    agg = windowed_event_counts(stream, window=window, watermark=watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
