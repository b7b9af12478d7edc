"""A9 incremental rollup: maintaining over any batch split equals
recompute-from-scratch; exactly-once on batch-id redelivery."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_cdc.lake.table import LakeTable
from spark_cdc.operators.rollup import IncrementalRollup

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("impressions", T.LongType(), True),
        T.StructField("clicks", T.LongType(), True),
    ]
)


def _measures():
    return {
        "impressions": F.count(F.when(F.col("event_type") == "view", 1)),
        "clicks": F.count(F.when(F.col("event_type") == "click", 1)),
    }


def test_rollup_equals_recompute(spark, tmp_table_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    table = LakeTable.create(spark, tmp_table_path, SCHEMA, key_columns=["user_id"], num_buckets=4)
    roll = IncrementalRollup(table, ["user_id"], _measures())
    # three uneven micro-batches
    for i, (lo, hi) in enumerate([(0, 200), (200, 750), (750, 10_000)]):
        roll.apply_batch(
            events.where((F.col("event_id") >= lo) & (F.col("event_id") < hi)), batch_id=i
        )
    got = {r["user_id"]: (r["impressions"], r["clicks"]) for r in roll.read().collect()}
    want = {
        r["user_id"]: (r["impressions"], r["clicks"])
        for r in events.groupBy("user_id")
        .agg(*[m.cast("long").alias(n) for n, m in _measures().items()])
        .collect()
    }
    assert got == want
    # ratio derived on read, never stored (trap 1): ctr from counts
    ctr = (
        roll.read()
        .select(F.try_divide("clicks", F.nullif("impressions", F.lit(0))).alias("ctr"))
        .count()
    )
    assert ctr == len(want)


def test_rollup_exactly_once(spark, tmp_table_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    table = LakeTable.create(spark, tmp_table_path, SCHEMA, key_columns=["user_id"], num_buckets=2)
    roll = IncrementalRollup(table, ["user_id"], _measures())
    roll.apply_batch(events, batch_id=0)
    before = sorted(tuple(r) for r in roll.read().collect())
    roll.apply_batch(events, batch_id=0)  # redelivery: must not double-count
    assert sorted(tuple(r) for r in roll.read().collect()) == before
