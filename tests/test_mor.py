"""Merge-on-read mode: same final state as copy-on-write, resolved
reads, compaction folds deltas, late-old-batch safety, exactly-once."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cdc.cdc.apply import apply_batch, replay_changes_df
from spark_cdc.cdc.envelope import KEY_COLUMNS, PAYLOAD_SCHEMA
from spark_cdc.lake.maintenance import compact
from spark_cdc.lake.table import LakeTable
from spark_cdc.sources.changelog import generate_change_log
from tests.conftest import assert_df_equal


def _mk(spark, path):
    return LakeTable.create(spark, str(path), PAYLOAD_SCHEMA, key_columns=KEY_COLUMNS, num_buckets=4)


def test_mor_equals_cow_and_oracle(spark, tmp_path):
    log = generate_change_log(spark, n_events=3000, n_convs=50, seed=29)
    cow = _mk(spark, tmp_path / "cow")
    mor = _mk(spark, tmp_path / "mor")
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000), (2000, 3001)]):
        batch = log.where((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        apply_batch(cow, batch, batch_id=i)
        apply_batch(mor, batch, batch_id=i, mode="mor")
    assert mor.manifest["delta_buckets"], "MoR should flag delta buckets"
    expect = replay_changes_df(log, KEY_COLUMNS).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    assert_df_equal(mor.read(), expect, KEY_COLUMNS)
    assert_df_equal(cow.read(), mor.read(), KEY_COLUMNS)

    # compaction folds deltas, state unchanged, flags cleared
    state = sorted(tuple(r) for r in mor.read().collect())
    compact(mor, max_files_per_bucket=10_000)
    assert not mor.manifest["delta_buckets"]
    assert sorted(tuple(r) for r in mor.read(resolve=False).collect()) == state
    # cow merge on top of a compacted mor table still correct
    extra = generate_change_log(spark, n_events=500, n_convs=50, seed=30).withColumn(
        "lsn", F.col("lsn") + 10_000
    ).withColumn("op_seq", F.col("op_seq") + 10_000).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 DAY")
    )
    apply_batch(mor, extra, batch_id=3)
    full = log.unionByName(extra)
    assert_df_equal(
        mor.read(),
        replay_changes_df(full, KEY_COLUMNS).select("conv_id", "turn_idx", "role", "text", "tool", "ts"),
        KEY_COLUMNS,
    )


def test_mor_late_old_batch_and_redelivery(spark, tmp_path):
    log = generate_change_log(spark, n_events=1500, n_convs=25, seed=33)
    mor = _mk(spark, tmp_path / "t")
    new_half = log.where(F.col("lsn") >= 700)
    old_half = log.where(F.col("lsn") < 700)
    apply_batch(mor, new_half, mode="mor")
    apply_batch(mor, old_half, mode="mor")  # late old events
    apply_batch(mor, new_half, mode="mor")  # redelivery, no batch id
    expect = replay_changes_df(log, KEY_COLUMNS).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    assert_df_equal(mor.read(), expect, KEY_COLUMNS)
    # batch-id redelivery skipped entirely
    r = apply_batch(mor, old_half, batch_id=0, mode="mor")
    assert not r.skipped  # first time with ids
    r2 = apply_batch(mor, old_half, batch_id=0, mode="mor")
    assert r2.skipped


def test_mor_fast_path_no_stats(spark, tmp_path):
    log = generate_change_log(spark, n_events=1000, n_convs=20, seed=35)
    mor = _mk(spark, tmp_path / "t")
    apply_batch(mor, log, mode="mor", collect_stats=False, collect_lineage=False)
    expect = replay_changes_df(log, KEY_COLUMNS).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    assert_df_equal(mor.read(), expect, KEY_COLUMNS)
