"""C10: event-time windowed aggregation — streaming (availableNow +
watermark) equals the batch computation of the same plan on every
window the watermark has closed."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cdc.cdc.envelope import CHANGE_SCHEMA
from spark_cdc.sources.changelog import generate_change_log
from spark_cdc.streaming.windows import run_windowed_monitor, windowed_event_counts


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    # 2000 events, ts advancing 1s per 8 lsn → ~250s of event time
    log = generate_change_log(spark, n_events=2000, n_convs=30, seed=19)
    src = str(tmp_path / "src")
    # four lsn-quartile files written in order: with one file per
    # trigger the watermark advances monotonically (no late data)
    for i in range(4):
        (
            log.where((F.col("lsn") >= i * 500) & (F.col("lsn") < (i + 1) * 500))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    q = run_windowed_monitor(
        spark,
        src,
        CHANGE_SCHEMA,
        str(tmp_path / "ckpt"),
        query_name="win_test",
        window="1 minute",
        watermark="30 seconds",
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["op"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_test").collect()
    }
    want = {
        (r["window_start"], r["op"]): r["n_events"]
        for r in windowed_event_counts(
            spark.read.parquet(src), window="1 minute"
        ).collect()
    }
    # every emitted (closed) window matches the batch truth, and the
    # watermark must have closed at least the first couple of windows
    assert len(got) >= 3, f"windows emitted: {len(got)}"
    assert all(want[k] == v for k, v in got.items())
