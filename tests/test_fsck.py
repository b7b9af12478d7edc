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


def test_fsck_corrupt_head_manifest_reports_not_crashes(spark, tmp_path, capsys):
    """The exact damage fsck exists for must yield a report + exit 1,
    never a traceback: truncated/invalid-JSON head manifest (raises
    ValueError, not OSError) both via fsck() on a loaded table and via
    the `check` CLI, whose LakeTable.load happens before fsck runs."""
    from spark_cdc.lake.table import META_DIR
    from spark_cdc.__main__ import main

    t = _mk(spark, str(tmp_path / "t"))
    mpath = os.path.join(t.path, META_DIR, f"snap-{t.snapshot_id}.json")
    with open(mpath, "w") as f:
        f.write('{"truncated": ')  # invalid JSON
    rep = fsck(t)  # table object loaded before the damage
    assert not rep["ok"]
    assert any("unreadable" in e for e in rep["errors"])
    # CLI path: load itself fails on the corrupt manifest → report + 1
    assert main(["check", "--table", str(tmp_path / "t")]) == 1
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["ok"] is False


def test_fsck_missing_version_file_cli(spark, tmp_path, capsys):
    from spark_cdc.lake.table import META_DIR, VERSION_FILE
    from spark_cdc.__main__ import main

    _mk(spark, str(tmp_path / "t"))
    os.remove(os.path.join(str(tmp_path / "t"), META_DIR, VERSION_FILE))
    assert main(["check", "--table", str(tmp_path / "t")]) == 1
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["ok"] is False
