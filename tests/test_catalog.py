"""SQL facade: spark.sql over attached lake views, incl. time travel
and MoR on-read resolution through the view."""

from __future__ import annotations

import datetime

from spark_cdc.cdc.apply import apply_batch
from spark_cdc.cdc.envelope import CHANGE_SCHEMA, PAYLOAD_SCHEMA
from spark_cdc.catalog import attach, attach_all, refresh
from spark_cdc.lake.table import LakeTable


def _ev(lsn, op, conv, turn, text, day):
    return (lsn, lsn, op, conv, turn, "user", text, None, datetime.datetime(2024, 1, day))


def test_sql_over_attached_views(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD_SCHEMA,
        key_columns=["conv_id", "turn_idx"], num_buckets=4,
    )
    apply_batch(t, spark.createDataFrame(
        [_ev(1, "c", "c1", 0, "a", 1), _ev(2, "c", "c2", 0, "b", 1)], CHANGE_SCHEMA),
        batch_id=0, mode="mor", collect_lineage=False)
    snap1 = t.snapshot_id
    apply_batch(t, spark.createDataFrame(
        [_ev(3, "u", "c1", 0, "a2", 2), _ev(4, "d", "c2", 0, None, 2)], CHANGE_SCHEMA),
        batch_id=1, mode="mor", collect_lineage=False)

    handle = attach(spark, "transcripts", str(tmp_path / "t"))
    attach(spark, "transcripts_then", str(tmp_path / "t"), snapshot_id=snap1)
    # current view: MoR multi-generation rows resolve + tombstone hidden
    rows = {r["conv_id"]: r["text"] for r in
            spark.sql("SELECT conv_id, text FROM transcripts").collect()}
    assert rows == {"c1": "a2"}
    # time-travel view pinned at snapshot 1
    then = {r["conv_id"]: r["text"] for r in
            spark.sql("SELECT conv_id, text FROM transcripts_then").collect()}
    assert then == {"c1": "a", "c2": "b"}
    # aggregate SQL straight through the view
    assert spark.sql("SELECT count(*) AS n FROM transcripts").first()["n"] == 1

    # views snapshot at attach time; refresh re-pins to head
    apply_batch(t if handle is None else handle, spark.createDataFrame(
        [_ev(5, "c", "c3", 0, "c", 3)], CHANGE_SCHEMA),
        batch_id=2, mode="mor", collect_lineage=False)
    assert spark.sql("SELECT count(*) AS n FROM transcripts").first()["n"] == 1
    refresh(spark, "transcripts", handle)
    assert spark.sql("SELECT count(*) AS n FROM transcripts").first()["n"] == 2


def test_attach_all(spark, tmp_path):
    for name in ("x", "y"):
        t = LakeTable.create(
            spark, str(tmp_path / name), PAYLOAD_SCHEMA,
            key_columns=["conv_id", "turn_idx"], num_buckets=2,
        )
        apply_batch(t, spark.createDataFrame(
            [_ev(1, "c", f"{name}1", 0, name, 1)], CHANGE_SCHEMA),
            batch_id=0, collect_lineage=False)
    handles = attach_all(spark, {"vx": str(tmp_path / "x"), "vy": str(tmp_path / "y")})
    assert set(handles) == {"vx", "vy"}
    got = spark.sql(
        "SELECT a.text AS tx, b.text AS ty FROM vx a CROSS JOIN vy b"
    ).first()
    assert (got["tx"], got["ty"]) == ("x", "y")
