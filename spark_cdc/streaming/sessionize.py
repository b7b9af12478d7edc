"""Custom stateful streaming operator: conversation sessionization via
``applyInPandasWithState`` (SURVEY.md §2.7 — the designed-for shape for
operators Spark's built-ins can't express).

A "session" is a burst of change events for one conversation separated
by ≥ ``gap`` of event-time silence — the activity unit an operator
wants for monitoring hot conversations (the Zipf tail the north rule
calls out) and for driving targeted compaction. Tumbling windows can't
express it (variable length); ``session_window`` can't carry custom
per-key state across triggers with arbitrary merge logic. This is the
canonical ``applyInPandasWithState`` use:

- state per ``conv_id``: (session_start, last_ts, n_events);
- a new event within ``gap`` of ``last_ts`` extends the open session;
- an event beyond the gap EMITS the closed session and opens a new one;
- watermark-driven timeout emits the final open session once no
  earlier event can arrive (GroupStateTimeout.EventTimeTimeout).

Arrow-batched per group — no per-row Python (each group's events
arrive as pandas DataFrames).

The same function doubles as a batch operator via
``sessionize_batch`` (pure DataFrame window form) — tested equal on
identical input, the stream==batch oracle discipline used across this
engine.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)

_US = 1_000_000


def _session_fn(gap_seconds: float):
    gap_us = int(gap_seconds * _US)

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (conv_id,) = key
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            # watermark passed the open session's horizon → final emit
            if state.exists:
                s, l, n = state.get
                closed.append((s, l, n))
            state.remove()
        else:
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us, last_us, n = None, None, 0
            ts_us = (
                pd.concat([p["ts"] for p in pdfs])
                .dropna()
                .sort_values()
                .astype("int64")
                // 1000  # pandas ns → µs
            )
            for t in ts_us:
                t = int(t)
                if start_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us <= gap_us:
                    last_us, n = max(last_us, t), n + 1
                else:
                    closed.append((start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
            if start_us is not None:
                state.update((start_us, last_us, n))
                # timeout once event time passes last_ts + gap
                state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        if not closed:
            return iter(())
        out = pd.DataFrame(closed, columns=["s", "l", "n"])
        return iter(
            [
                pd.DataFrame(
                    {
                        "conv_id": conv_id,
                        "session_start": pd.to_datetime(out["s"], unit="us"),
                        "session_end": pd.to_datetime(out["l"], unit="us"),
                        "n_events": out["n"].astype("int64"),
                    }
                )
            ]
        )

    return fn


def sessionize_stream(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization: one stateful group per conv_id,
    event-time timeout closes idle sessions."""
    gap_seconds = _duration_seconds(gap)
    src = stream.withWatermark(ts_col, watermark).select("conv_id", F.col(ts_col).alias("ts"))
    return src.groupBy("conv_id").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(df: DataFrame, gap: str = "30 minutes", ts_col: str = "ts") -> DataFrame:
    """Batch oracle for :func:`sessionize_stream`: the classic
    gaps-and-islands window form (lag → new-session flag → running sum
    as session id → per-session aggregate). Pure Column expressions."""
    gap_seconds = _duration_seconds(gap)
    w = Window.partitionBy("conv_id").orderBy(ts_col)
    # unix_micros instead of a double cast: TIMESTAMP_NTZ (what parquet
    # scans yield) can't cast to double in Spark 4; the ltz cast is a
    # fixed-offset reinterpretation, so gap DIFFERENCES are unaffected
    ep = F.unix_micros(F.col("ts").cast("timestamp")).cast("double") / F.lit(1e6)
    flagged = (
        df.select("conv_id", F.col(ts_col).alias("ts"))
        .where(F.col("ts").isNotNull())
        .withColumn(
            "_new",
            (
                F.coalesce(ep - F.lag(ep).over(w), F.lit(float("inf")))
                > gap_seconds
            ).cast("long"),
        )
        .withColumn("_sid", F.sum("_new").over(w))
    )
    return (
        flagged.groupBy("conv_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sid")
    )


def _duration_seconds(s: str) -> float:
    n, unit = s.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit]
    return float(n) * mult
