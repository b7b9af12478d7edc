"""CDC envelope: JSON wire parsing + normalization (op defaulting,
'r'→'c' folding, polymorphic ts) — reference processor.py semantics
as column expressions — plus the Kafka frame shape end-to-end into a
merge (the jar is absent in this sandbox; the parse/routing layer the
kafka source would feed is what these tests pin)."""

from __future__ import annotations

import datetime
import json

from spark_cdc.cdc.envelope import (
    CHANGE_SCHEMA,
    KAFKA_FRAME_SCHEMA,
    KEY_COLUMNS,
    PAYLOAD_SCHEMA,
    parse_envelope_json,
    parse_kafka_frames,
)


def test_parse_envelope_json(spark):
    base = datetime.datetime(2024, 3, 5, 10, 11, 12, tzinfo=datetime.timezone.utc)
    epoch = int(base.timestamp())
    msgs = [
        {"lsn": 1, "op_seq": 1, "op": "c", "conv_id": "a", "turn_idx": 0,
         "role": "user", "text": "hi", "ts": "2024-03-05T10:11:12Z"},
        {"lsn": 2, "op_seq": 2, "op": "r", "conv_id": "a", "turn_idx": 1,
         "role": "assistant", "text": "yo", "ts": str(epoch * 1000)},
        # missing op → defaults to 'c' (processor.py:432); epoch seconds
        {"lsn": 3, "op_seq": 3, "conv_id": "b", "turn_idx": 0,
         "role": "user", "text": "x", "ts": str(epoch)},
        {"lsn": 4, "op_seq": 4, "op": "d", "conv_id": "b", "turn_idx": 0,
         "ts": str(epoch * 1_000_000)},
    ]
    raw = spark.createDataFrame([(json.dumps(m),) for m in msgs], "value string")
    out = parse_envelope_json(raw)
    assert [f.name for f in out.schema.fields] == [f.name for f in CHANGE_SCHEMA.fields]
    rows = {r["lsn"]: r for r in out.collect()}
    want_ts = base.replace(tzinfo=None)
    assert rows[1]["op"] == "c" and rows[1]["ts"] == want_ts
    assert rows[2]["op"] == "c"  # 'r' folded to 'c'
    assert rows[2]["ts"] == want_ts  # epoch millis
    assert rows[3]["op"] == "c"  # default
    assert rows[3]["ts"] == want_ts  # epoch seconds
    assert rows[4]["op"] == "d" and rows[4]["text"] is None
    assert rows[4]["ts"] == want_ts  # epoch micros


def _kafka_frames(spark, msgs, topic="dbserver.public.transcripts", lsn_from_offset=False):
    rows = []
    for i, m in enumerate(msgs):
        key = json.dumps({"conv_id": m.get("conv_id")}).encode()
        rows.append(
            (
                key,
                json.dumps(m).encode(),
                topic,
                0,
                100 + i,
                datetime.datetime(2024, 3, 5, 10, 0, i),
            )
        )
    return spark.createDataFrame(rows, KAFKA_FRAME_SCHEMA)


def test_parse_kafka_frames_shape_and_routing(spark):
    """(key binary, value binary, topic, partition, offset, timestamp)
    — the exact frame format("kafka") produces — parses into the typed
    envelope; lsn/op_seq default to the Kafka offset, missing ts
    backfills from the broker timestamp, topic routes to a table."""
    msgs = [
        {"op": "c", "conv_id": "a", "turn_idx": 0, "role": "user",
         "text": "hi", "ts": "2024-03-05T10:11:12Z"},
        # no lsn/op_seq/ts at all → offset + broker-timestamp backfill
        {"op": "u", "conv_id": "a", "turn_idx": 0, "role": "user",
         "text": "hi!!"},
    ]
    env = parse_kafka_frames(
        _kafka_frames(spark, msgs),
        topic_table_map={"dbserver.public.transcripts": "transcripts"},
    )
    rows = sorted(env.collect(), key=lambda r: r["lsn"])
    assert [r["_table"] for r in rows] == ["transcripts", "transcripts"]
    assert rows[0]["lsn"] == 100 and rows[1]["lsn"] == 101  # offsets
    assert rows[0]["ts"] == datetime.datetime(2024, 3, 5, 10, 11, 12)
    assert rows[1]["ts"] == datetime.datetime(2024, 3, 5, 10, 0, 1)  # broker ts
    # unmapped topic → last dot segment
    other = parse_kafka_frames(_kafka_frames(spark, msgs[:1], topic="x.y.events"))
    assert other.collect()[0]["_table"] == "events"


def test_kafka_offset_fallback_is_partition_aware(spark):
    """Kafka offsets are only unique per topic-partition: the lsn/op_seq
    fallback folds the partition into the high bits so colliding
    offsets across partitions can't mis-order latest-version-wins
    resolution (round-2 advisory)."""
    frames = spark.createDataFrame(
        [
            (b"k", json.dumps({"op": "c", "conv_id": "a", "turn_idx": 0,
                               "text": "p0"}).encode(),
             "t.x.transcripts", 0, 7, datetime.datetime(2024, 3, 5, 10, 0, 0)),
            (b"k", json.dumps({"op": "u", "conv_id": "a", "turn_idx": 0,
                               "text": "p1"}).encode(),
             "t.x.transcripts", 1, 7, datetime.datetime(2024, 3, 5, 10, 0, 0)),
        ],
        KAFKA_FRAME_SCHEMA,
    )
    rows = sorted(parse_kafka_frames(frames).collect(), key=lambda r: r["lsn"])
    assert rows[0]["lsn"] == 7                      # partition 0
    assert rows[1]["lsn"] == (1 << 40) + 7          # partition 1, same offset
    assert rows[0]["lsn"] != rows[1]["lsn"]


def test_kafka_frames_end_to_end_merge(spark, tmp_path):
    """Kafka-shaped frames → envelope → topic routing → exactly-once
    MERGE: the full ingress path the reference's consumer thread
    implemented (consumer.py:41-109), minus only the broker."""
    from spark_cdc.cdc.apply import apply_batch_routed
    from spark_cdc.lake.table import LakeTable

    msgs = [
        {"op": "c", "conv_id": "a", "turn_idx": 0, "role": "user",
         "text": "v1", "ts": "2024-03-05T10:00:00Z"},
        {"op": "u", "conv_id": "a", "turn_idx": 0, "role": "user",
         "text": "v2", "ts": "2024-03-05T10:00:05Z"},
        {"op": "c", "conv_id": "b", "turn_idx": 0, "role": "user",
         "text": "keep", "ts": "2024-03-05T10:00:01Z"},
        {"op": "d", "conv_id": "b", "turn_idx": 0,
         "ts": "2024-03-05T10:00:09Z"},
    ]
    env = parse_kafka_frames(
        _kafka_frames(spark, msgs),
        topic_table_map={"dbserver.public.transcripts": "transcripts"},
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD_SCHEMA,
        key_columns=KEY_COLUMNS, num_buckets=4,
    )
    res = apply_batch_routed({"transcripts": table}, env, batch_id=0)
    assert res["transcripts"].batch_keys == 2
    state = {(r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()}
    assert state == {("a", 0): "v2"}  # update applied, delete applied
    # redelivery of the same batch id is a no-op (exactly-once)
    res2 = apply_batch_routed({"transcripts": table}, env, batch_id=0)
    assert res2["transcripts"].skipped
