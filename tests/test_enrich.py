"""Stream-side temporal enrichment: dim_history SCD-2 derivation
(tombstoned deletes, last-writer-per-instant) and AsofEnrichRunner's
stream==batch equality + redelivery idempotence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_cdc.operators.temporal import asof_join
from spark_cdc.streaming.enrich import AsofEnrichRunner, dim_history

DIM_LOG = [
    # (dim_id, ts, op, val, op_seq)
    ("a", 1.0, "c", "a-v1", 0),
    ("a", 5.0, "u", "a-v2", 1),
    ("a", 5.0, "u", "a-v2b", 2),   # same instant: op_seq 2 must win
    ("a", 9.0, "d", "dead", 3),    # tombstone: val must read NULL
    ("a", 12.0, "c", "a-v3", 4),   # re-created after the delete
    ("b", 2.0, "c", "b-v1", 5),
]
DIM_SCHEMA = "dim_id string, ts double, op string, val string, op_seq int"

EVENTS = [
    # (event_id, dim_id, ts)
    (1, "a", 0.5),    # before any version → NULL
    (2, "a", 5.0),    # exact tie → a-v2b (op_seq winner)
    (3, "a", 10.0),   # after delete, before re-create → NULL (tombstone)
    (4, "a", 20.0),   # after re-create → a-v3
    (5, "b", 3.0),    # → b-v1
    (6, "c", 7.0),    # key with no history → NULL
]
EV_SCHEMA = "event_id int, dim_id string, ts double"


def _history(spark):
    return dim_history(
        spark.createDataFrame(DIM_LOG, DIM_SCHEMA), keys=["dim_id"], on="ts"
    )


def test_dim_history_tombstones_and_tie_break(spark):
    h = {(r["dim_id"], r["ts"]): r["val"] for r in _history(spark).collect()}
    assert h[("a", 5.0)] == "a-v2b"      # last writer at the instant
    assert h[("a", 9.0)] is None         # delete → tombstone version
    assert h[("a", 12.0)] == "a-v3"
    assert len(h) == 5                   # the two t=5 versions collapsed


EXPECTED = {1: None, 2: "a-v2b", 3: None, 4: "a-v3", 5: "b-v1", 6: None}


def test_batch_asof_over_history(spark):
    ev = spark.createDataFrame(EVENTS, EV_SCHEMA)
    got = asof_join(ev, _history(spark), on="ts", by=["dim_id"])
    assert {r["event_id"]: r["val"] for r in got.collect()} == EXPECTED


def _run_stream(spark, tmp_path, fresh_checkpoint=False):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / ("ckpt2" if fresh_checkpoint else "ckpt"))
    if not os.path.isdir(src):
        ev = spark.createDataFrame(EVENTS, EV_SCHEMA)
        for i in range(3):  # 3 files → 3 micro-batches at 1 file/trigger
            ev.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
                "append"
            ).parquet(src)
    runner = AsofEnrichRunner(
        spark,
        history=lambda: _history(spark),  # re-read per trigger (live dim)
        source_dir=src,
        checkpoint_dir=ckpt,
        out_dir=out,
        schema=spark.createDataFrame(EVENTS, EV_SCHEMA).schema,
        on="ts",
        by=["dim_id"],
        max_files_per_trigger=1,
    )
    runner.run_available()
    return runner


def test_stream_enrich_equals_batch(spark, tmp_path):
    runner = _run_stream(spark, tmp_path)
    got = runner.read_enriched()
    want = asof_join(
        spark.createDataFrame(EVENTS, EV_SCHEMA), _history(spark),
        on="ts", by=["dim_id"],
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert {r["event_id"]: r["val"] for r in got.collect()} == EXPECTED


def test_stream_enrich_redelivery_idempotent(spark, tmp_path):
    runner = _run_stream(spark, tmp_path)
    first = sorted(map(tuple, runner.read_enriched().collect()))
    # same source, FRESH checkpoint → every batch is redelivered with
    # the same ids; per-batch dynamic partition overwrite must leave
    # the output byte-identical, not doubled
    runner2 = _run_stream(spark, tmp_path, fresh_checkpoint=True)
    again = sorted(map(tuple, runner2.read_enriched().collect()))
    assert again == first


def test_enrich_cli(spark, tmp_path):
    # python -m spark_cdc enrich: stream → as-of join against a lake-
    # resident history table → per-batch partitioned output
    from spark_cdc.__main__ import main
    from spark_cdc.lake.table import LakeTable

    hist_df = dim_history(
        spark.createDataFrame(DIM_LOG, DIM_SCHEMA), keys=["dim_id"], on="ts"
    )
    hpath = str(tmp_path / "hist")
    t = LakeTable.create(
        spark, hpath, hist_df.schema, key_columns=["dim_id", "ts"], num_buckets=4
    )
    t.append(hist_df)
    src = str(tmp_path / "src")
    spark.createDataFrame(EVENTS, EV_SCHEMA).coalesce(1).write.parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rc = main([
        "enrich", "--source", src, "--history-table", hpath,
        "--checkpoint", ckpt, "--out", out, "--on", "ts", "--by", "dim_id",
    ])
    assert rc == 0
    got = {r["event_id"]: r["val"] for r in spark.read.parquet(out).collect()}
    assert got == EXPECTED
