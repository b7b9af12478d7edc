"""Custom stateful streaming operator (applyInPandasWithState):
conversation sessionization. Stream output must equal the batch
gaps-and-islands oracle on identical input once the watermark has
closed every session — the engine's stream==batch discipline."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from spark_cdc.streaming.sessionize import sessionize_batch, sessionize_stream

BASE = datetime.datetime(2024, 3, 5, 10, 0, 0)


def _events(spark):
    """Three conversations: a has two sessions (gap > 10 min between
    event 3 and 4), b one session, plus out-of-order arrivals."""
    rows = []
    # conv a, session 1: 10:00, 10:02, 10:05
    for m in (0, 2, 5):
        rows.append(("a", BASE + datetime.timedelta(minutes=m)))
    # conv a, session 2: 10:30, 10:31  (25 min gap)
    for m in (30, 31):
        rows.append(("a", BASE + datetime.timedelta(minutes=m)))
    # conv b, one session: 10:01, 10:04 (delivered out of order below)
    rows.append(("b", BASE + datetime.timedelta(minutes=4)))
    rows.append(("b", BASE + datetime.timedelta(minutes=1)))
    return spark.createDataFrame(rows, "conv_id string, ts timestamp")


def test_sessionize_batch_oracle(spark):
    out = {
        (r["conv_id"], r["session_start"].minute, r["session_end"].minute, r["n_events"])
        for r in sessionize_batch(_events(spark), gap="10 minutes").collect()
    }
    assert out == {("a", 0, 5, 3), ("a", 30, 31, 2), ("b", 1, 4, 2)}


def test_sessionize_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev = _events(spark)
    ev.repartition(1).write.mode("overwrite").parquet(src)
    # sentinel far-future event advances the watermark past every real
    # session's timeout so event-time timeouts fire and emit them
    spark.createDataFrame(
        [("zz_sentinel", BASE + datetime.timedelta(days=2))],
        "conv_id string, ts timestamp",
    ).repartition(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("conv_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = sessionize_stream(stream, gap="10 minutes", watermark="0 seconds")
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_test")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["conv_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_test").collect()
        if r["conv_id"] != "zz_sentinel"
    }
    want = {
        (r["conv_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(ev, gap="10 minutes").collect()
    }
    assert got == want
