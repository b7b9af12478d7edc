"""Dead-letter routing: malformed change events land in a quarantine
lake table with lineage; the main table only ever sees valid rows, and
nothing is fabricated (reference contrast: processor.py:66-68 turned
malformed numerics into a literal 1.0)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from spark_cdc.cdc.apply import apply_batch, replay_changes_df
from spark_cdc.cdc.envelope import KEY_COLUMNS, PAYLOAD_SCHEMA
from spark_cdc.cdc.quarantine import DeadLetterSink, default_envelope_rules, split_quarantine
from spark_cdc.lake.table import LakeTable

CHANGES_DDL = (
    "lsn long, op_seq long, op string, conv_id string, turn_idx int, "
    "role string, text string, tool string, ts timestamp"
)


def _mixed_batch(spark):
    """4 valid rows + 3 invalid (null key, bad op, null ts)."""
    rows = [
        (1, 1, "c", "a", 0, "user", "hello", None, "2024-03-05 10:00:00"),
        (2, 2, "c", "a", 1, "assistant", "hi", None, "2024-03-05 10:00:01"),
        (3, 3, "u", "a", 0, "user", "hello!!", None, "2024-03-05 10:00:02"),
        (4, 4, "c", "b", 0, "user", "yo", None, "2024-03-05 10:00:03"),
        (5, 5, "c", None, 0, "user", "no key", None, "2024-03-05 10:00:04"),
        (6, 6, "zap", "c", 0, "user", "bad op", None, "2024-03-05 10:00:05"),
        (7, 7, "c", "d", 0, "user", "no ts", None, None),
    ]
    df = spark.createDataFrame(
        [(l, s, o, c, t, r, x, tl, ts) for l, s, o, c, t, r, x, tl, ts in rows],
        "lsn long, op_seq long, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string, ts string",
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_split_rules(spark):
    good, bad = split_quarantine(_mixed_batch(spark), default_envelope_rules(KEY_COLUMNS))
    assert good.count() == 4
    reasons = {r["lsn"]: r["_q_reason"] for r in bad.collect()}
    assert reasons == {5: "null_key:conv_id", 6: "invalid_op", 7: "unparseable_ts"}


def test_quarantine_end_to_end(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD_SCHEMA, key_columns=KEY_COLUMNS, num_buckets=4
    )
    sink = DeadLetterSink(spark, str(tmp_path / "dlq"))
    batch = _mixed_batch(spark)
    apply_batch(table, batch, batch_id=0, source_id="s1", quarantine=sink)

    # main table == replay of only the valid rows (no fabrication, no leakage)
    valid = batch.where(F.col("lsn") <= 4)
    oracle = replay_changes_df(valid, KEY_COLUMNS).select("conv_id", "turn_idx", "text")
    got = table.read().select("conv_id", "turn_idx", "text")
    assert got.exceptAll(oracle).count() == 0 and oracle.exceptAll(got).count() == 0

    dlq = {r["lsn"]: r for r in sink.read().collect()}
    assert set(dlq) == {5, 6, 7}
    assert dlq[5]["reason"] == "null_key:conv_id"
    assert dlq[5]["source_id"] == "s1" and dlq[5]["batch_id"] == 0
    # raw row preserved verbatim — the original value survives for replay
    raw = json.loads(dlq[6]["raw"])
    assert raw["op"] == "zap" and raw["text"] == "bad op"


def test_quarantine_redelivery_is_exactly_once(spark, tmp_path):
    """foreachBatch retry semantics: redelivering the same batch_id
    must not duplicate dead-lettered rows (same snapshot-property guard
    as the merge)."""
    table = LakeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD_SCHEMA, key_columns=KEY_COLUMNS, num_buckets=4
    )
    sink = DeadLetterSink(spark, str(tmp_path / "dlq"))
    batch = _mixed_batch(spark)
    apply_batch(table, batch, batch_id=0, quarantine=sink)
    apply_batch(table, batch, batch_id=0, quarantine=sink)  # redelivery
    assert sink.read().count() == 3  # not 6
    # a LATER batch with new bad rows still lands
    batch2 = batch.where(F.col("lsn").isin(5, 6)).withColumn("lsn", F.col("lsn") + 100)
    apply_batch(table, batch2, batch_id=1, quarantine=sink)
    assert sink.read().count() == 5


def test_quarantine_clean_batch_commits_nothing(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD_SCHEMA, key_columns=KEY_COLUMNS, num_buckets=4
    )
    sink = DeadLetterSink(spark, str(tmp_path / "dlq"))
    clean = _mixed_batch(spark).where(F.col("lsn") <= 4)
    snap_before = sink.table.snapshot_id
    apply_batch(table, clean, batch_id=0, quarantine=sink)
    assert sink.table.snapshot_id == snap_before  # no snapshot churn
    assert sink.read().count() == 0


def test_replay_quarantined_with_fix(spark, tmp_path):
    """Dead-lettered rows are recoverable: a fixes expression repairs
    the violation, repaired rows merge exactly-once, unrepairable rows
    are counted but neither merged nor re-duplicated into the sink."""
    from pyspark.sql import functions as F

    from spark_cdc.cdc.apply import apply_batch
    from spark_cdc.cdc.envelope import KEY_COLUMNS, PAYLOAD_SCHEMA
    from spark_cdc.cdc.quarantine import DeadLetterSink, replay_quarantined
    from spark_cdc.lake.table import LakeTable

    table = LakeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD_SCHEMA,
        key_columns=KEY_COLUMNS, num_buckets=4,
    )
    sink = DeadLetterSink(spark, str(tmp_path / "dlq"))
    sch = ("lsn long, op_seq long, op string, conv_id string, turn_idx int, "
           "role string, text string, tool string, ts timestamp")
    rows = [
        (1, 1, "c", "a", 0, "user", "good", None, "2024-01-01 00:00:00"),
        # unparseable ts -> quarantined; recoverable via a fix
        (2, 2, "c", "b", 0, "user", "fixable", None, None),
        # null key -> quarantined; NOT recoverable by the ts fix
        (3, 3, "c", None, 0, "user", "doomed", None, None),
    ]
    batch = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7],
          r[8] and __import__("datetime").datetime.fromisoformat(r[8])) for r in rows],
        sch,
    )
    apply_batch(table, batch, batch_id=0, quarantine=sink)
    assert table.read().count() == 1
    assert sink.read().count() == 2

    res, still_bad = replay_quarantined(
        sink, table,
        fixes={"ts": F.coalesce(F.col("ts"), F.lit("2024-01-01 09:00:00").cast("timestamp"))},
        batch_id=0,
    )
    assert still_bad == 1  # the null-key row stays dead
    state = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert state == {"a": "good", "b": "fixable"}
    assert sink.read().count() == 2  # no duplication into the sink
    # replaying the same batch id again is a no-op (exactly-once)
    res2, _ = replay_quarantined(
        sink, table,
        fixes={"ts": F.coalesce(F.col("ts"), F.lit("2024-01-01 09:00:00").cast("timestamp"))},
        batch_id=0,
    )
    assert res2.skipped
