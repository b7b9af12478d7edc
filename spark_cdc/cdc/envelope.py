"""CDC change-event envelope: schema + parsing.

The analogue of the Debezium-unwrapped messages the reference consumed
(`ExtractNewRecordState` + ``op``/``db``/``table`` metadata,
/root/reference/stream_etl/main.py:52-56; JSON deserialization,
/root/reference/stream_etl/core/consumer.py:48). Events carry:

- ``op`` ∈ {c, r, u, d} — create / snapshot-read / update / delete,
  dispatched like /root/reference/stream_etl/core/processor.py:186-217
  (``r`` treated as ``c``, processor.py:196; unlike the reference we
  apply ``d`` instead of dropping it, processor.py:214-217);
- ``lsn`` — global log sequence number (what Kafka offsets provided
  implicitly, consumer.py:95-105);
- ``op_seq`` — per-key sequence, the dedup tie-breaker;
- the transcript payload (conv_id, turn_idx, role, text, tool, ts).

Raw events may arrive as JSON strings with messy values (string
decimals, polymorphic timestamps — reference processor.py:41-141);
``parse_envelope_json`` normalizes them with pure Column expressions
(vectorized, JVM-side — never per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_cdc.functions.parsers import parse_timestamp_any

KEY_COLUMNS = ["conv_id", "turn_idx"]

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op_seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        *PAYLOAD_SCHEMA.fields,
    ]
)

# What arrives on the wire before normalization: ts polymorphic
# (ISO string | epoch s | ms | µs), op possibly absent.
RAW_JSON_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), True),
        T.StructField("op_seq", T.LongType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.StringType(), True),
    ]
)


def parse_envelope_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse raw JSON change events into the typed envelope.

    Column-expression-only normalization:
    - ``op`` defaults to 'c' (reference processor.py:432) and 'r' is
      folded into 'c' (processor.py:196);
    - ``ts`` accepts ISO strings and epoch seconds/millis/micros via
      magnitude heuristics (processor.py:93-100 re-expressed
      vectorized, see functions/parsers.py).
    """
    parsed = df.select(
        F.from_json(F.col(value_col).cast("string"), RAW_JSON_SCHEMA).alias("e")
    ).select("e.*")
    return normalize_envelope(parsed)


def normalize_envelope(df: DataFrame) -> DataFrame:
    out = (
        df.withColumn("op", F.coalesce(F.col("op"), F.lit("c")))
        .withColumn("op", F.when(F.col("op") == "r", F.lit("c")).otherwise(F.col("op")))
        .withColumn("ts", parse_timestamp_any(F.col("ts")))
        .withColumn("lsn", F.col("lsn").cast("long"))
        .withColumn("op_seq", F.col("op_seq").cast("long"))
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
    )
    return out.select([f.name for f in CHANGE_SCHEMA.fields if f.name in out.columns])
