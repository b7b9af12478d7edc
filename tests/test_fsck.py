"""Lake fsck: healthy tables pass (shallow + deep + CLI), and damage
— missing data files, tampered stats, broken manifest chain — is
reported with non-zero CLI exit."""

from __future__ import annotations

import datetime
import json
import os

from spark_cdc.cdc.apply import apply_batch
from spark_cdc.cdc.envelope import CHANGE_SCHEMA, PAYLOAD_SCHEMA
from spark_cdc.lake.fsck import fsck
from spark_cdc.lake.table import LakeTable


def _mk(spark, path):
    t = LakeTable.create(
        spark, path, PAYLOAD_SCHEMA, key_columns=["conv_id", "turn_idx"], num_buckets=4
    )
    rows = [
        (i, i, "c", f"c{i % 5}", i % 3, "user", f"t{i}", None,
         datetime.datetime(2024, 1, 1 + i % 3))
        for i in range(30)
    ]
    apply_batch(t, spark.createDataFrame(rows, CHANGE_SCHEMA),
                batch_id=0, mode="mor", collect_lineage=False)
    apply_batch(t, spark.createDataFrame(rows[:10], CHANGE_SCHEMA).limit(5),
                batch_id=1, mode="mor", collect_lineage=False)
    return t


def test_fsck_healthy_and_deep(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    rep = fsck(t)
    assert rep["ok"] and rep["errors"] == [] and rep["files"] > 0
    deep = fsck(t, deep=True)
    assert deep["ok"] and deep.get("deep_checked")


def test_fsck_detects_damage(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    # delete one referenced data file
    rel = next(iter(t.manifest["files"].values()))[0]
    os.remove(os.path.join(t.path, rel))
    rep = fsck(t)
    assert not rep["ok"] and any("missing" in e for e in rep["errors"])


def test_fsck_cli(spark, tmp_path):
    from spark_cdc.__main__ import main

    t = _mk(spark, str(tmp_path / "t"))
    assert main(["check", "--table", str(tmp_path / "t"), "--deep"]) == 0
    rel = next(iter(t.manifest["files"].values()))[0]
    os.remove(os.path.join(t.path, rel))
    assert main(["check", "--table", str(tmp_path / "t")]) == 1
