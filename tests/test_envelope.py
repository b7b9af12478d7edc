"""CDC envelope: JSON wire parsing + normalization (op defaulting,
'r'→'c' folding, polymorphic ts) — reference processor.py semantics
as column expressions."""

from __future__ import annotations

import datetime
import json

from spark_cdc.cdc.envelope import CHANGE_SCHEMA, parse_envelope_json


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
