"""Compaction + snapshot expiry are state-preserving."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_cdc.cdc.apply import apply_batch
from spark_cdc.cdc.envelope import KEY_COLUMNS, PAYLOAD_SCHEMA
from spark_cdc.lake.maintenance import compact, expire_snapshots
from spark_cdc.lake.table import LakeTable
from spark_cdc.sources.changelog import generate_change_log
from tests.conftest import assert_df_equal


def _fragment(spark, path, n_batches=6):
    """Append-mode fragmentation with DISJOINT keys per append (a
    keyed table legitimately holds one version per key outside MoR
    deltas; compaction resolves versions, so overlapping plain appends
    would collapse — that collapse is exercised in test_mor.py)."""
    log = generate_change_log(spark, n_events=1500, n_convs=25, seed=6, pct_delete=0.0)
    uniq = log.dropDuplicates(["conv_id", "turn_idx"])
    table = LakeTable.create(spark, path, PAYLOAD_SCHEMA, key_columns=KEY_COLUMNS, num_buckets=2)
    apply_batch(table, uniq.where(F.pmod("turn_idx", F.lit(n_batches)) == 0), batch_id=0)
    for i in range(1, n_batches):
        batch = uniq.where(F.pmod("turn_idx", F.lit(n_batches)) == i)
        table.append(batch.drop("op", "lsn", "op_seq"))
    return table


def test_compact_preserves_state(spark, tmp_table_path):
    table = _fragment(spark, tmp_table_path)
    before = sorted(tuple(r) for r in table.read().collect())
    compacted = compact(table, max_files_per_bucket=1)
    assert compacted, "expected fragmented buckets"
    after = sorted(tuple(r) for r in table.read().collect())
    assert before == after
    # fewer files now
    n_files = sum(len(v) for v in table.manifest["files"].values())
    assert n_files <= table.num_buckets + 1


def test_expire_snapshots(spark, tmp_table_path):
    table = _fragment(spark, tmp_table_path)
    compact(table, max_files_per_bucket=1)
    state = sorted(tuple(r) for r in table.read().collect())
    n_hist_before = len(table.history())
    res = expire_snapshots(table, keep_last=2)
    assert res["removed_manifests"] > 0 and res["removed_data_dirs"] >= 0
    # current state unaffected, reload works
    t2 = LakeTable.load(spark, table.path)
    assert sorted(tuple(r) for r in t2.read().collect()) == state
    assert len(t2.history()) == 2 < n_hist_before


def test_expire_snapshots_removes_orphan_write_dirs(spark, tmp_path):
    """A crash between data write and manifest commit leaves an orphan
    snap-dir no snapshot references; expire_snapshots GCs it (Iceberg
    remove_orphan_files semantics)."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from spark_cdc.lake.maintenance import expire_snapshots
    from spark_cdc.lake.table import DATA_DIR, LakeTable

    table = LakeTable.create(
        spark, str(tmp_path / "t"), T.StructType.fromDDL("id bigint, v string"),
        key_columns=["id"], num_buckets=2,
    )
    for i in range(5):
        table.append(
            spark.range(10).select(
                (F.col("id") + i * 10).alias("id"), F.lit(f"b{i}").alias("v")
            )
        )
    # simulate a crashed write: orphan data dir, never committed
    orphan = os.path.join(str(tmp_path / "t"), DATA_DIR, "snap99-deadbeef")
    os.makedirs(orphan)
    open(os.path.join(orphan, "part-orphan.parquet"), "wb").close()
    before = table.read().count()
    expire_snapshots(table, keep_last=2)
    assert not os.path.exists(orphan)
    assert table.read().count() == before  # live data untouched


def test_compact_selective_delta_policy(spark, tmp_path):
    """fold_all_deltas=False is the steady-state maintenance policy: a
    delta (merge-on-read) bucket compacts only once its file count
    exceeds the threshold, so a pass rewrites O(fragmented buckets) —
    lightly-touched delta buckets keep their files AND their delta
    flag, and reads stay correct through both the partial and the
    final full fold."""
    from spark_cdc.cdc.apply import replay_changes_df

    log = generate_change_log(spark, n_events=1200, n_convs=12, seed=9,
                              pct_delete=0.0).cache()
    table = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD_SCHEMA,
                             key_columns=KEY_COLUMNS, num_buckets=2)
    # batches 0-2 touch all conversations (delta files in BOTH buckets);
    # batches 3-5 are restricted to one conversation, fragmenting ONLY
    # its bucket past the threshold
    for i in range(3):
        b = log.where((F.col("lsn") % 3) == i)
        apply_batch(table, b, batch_id=i, collect_lineage=False, mode="mor")
    hot = log.where(F.col("conv_id") == "conv-0")
    for i in range(3, 6):
        b = hot.where((F.col("lsn") % 3) == i - 3).withColumn(
            "lsn", F.col("lsn") + i * 10_000
        ).withColumn("op_seq", F.col("op_seq") + i * 10_000)
        apply_batch(table, b, batch_id=i, collect_lineage=False, mode="mor")
    per_bucket = {int(b): len(fl) for b, fl in table.manifest["files"].items()}
    assert max(per_bucket.values()) > 4 >= min(per_bucket.values()), per_bucket
    before = sorted(tuple(r) for r in table.read().collect())

    folded = compact(table, max_files_per_bucket=4, fold_all_deltas=False)
    deltas = {int(b) for b in table.manifest.get("delta_buckets", [])}
    assert folded and set(folded).isdisjoint(deltas)
    assert deltas, "the lightly-touched delta bucket must survive the pass"
    assert all(
        len(table.manifest["files"].get(str(b), [])) <= 4 for b in deltas
    )
    assert sorted(tuple(r) for r in table.read().collect()) == before

    # the default full fold clears every delta flag; state still equals
    # the one-shot replay oracle
    compact(table, max_files_per_bucket=1, fold_all_deltas=True)
    assert not table.manifest.get("delta_buckets")
    assert sorted(tuple(r) for r in table.read().collect()) == before
