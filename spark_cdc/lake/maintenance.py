"""Table maintenance: compaction, tombstone GC, snapshot expiry.

The background work ClickHouse merges did implicitly for the reference
(ReplacingMergeTree part merges, init.sql:14,28) is an explicit,
schedulable operation here — like Iceberg's rewrite_data_files /
expire_snapshots procedures:

- ``compact`` rewrites buckets whose file count exceeds a threshold
  (many small files accumulate when streaming micro-batches each touch
  a bucket) and drops delete tombstones older than every retained
  reader — after compaction a late event older than the tombstone
  horizon is out of contract (standard CDC retention semantics).
- ``expire_snapshots`` deletes manifests + data files unreachable from
  the last N snapshots (time travel window).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from spark_cdc.lake.table import BUCKET_COL, DATA_DIR, META_DIR, V_DEL, LakeTable, bucket_expr


def compact(
    table: LakeTable,
    max_files_per_bucket: int = 4,
    drop_tombstones: bool = False,
    fold_all_deltas: bool = True,
) -> list[int]:
    """Rewrite over-fragmented buckets into one file each. Returns the
    bucket ids compacted. State-preserving (tested): read() before ==
    read() after.

    ``fold_all_deltas=True`` (default) folds EVERY delta-carrying
    (merge-on-read) bucket back to single-version — the full-restore
    semantics streaming callers relied on. ``False`` is the steady-state
    maintenance policy: a delta bucket compacts only once its file count
    exceeds ``max_files_per_bucket``, so each compaction pass rewrites
    O(fragmented buckets), not O(table) — lightly-touched buckets keep
    their (prunable, still-correct) delta files until they accumulate
    enough to be worth rewriting, the same incremental part-merge
    discipline as ClickHouse background merges / Iceberg binpack
    rewrite_data_files."""
    deltas = {int(b) for b in table.manifest.get("delta_buckets", [])}
    if not fold_all_deltas:
        deltas = {
            b
            for b in deltas
            if len(table.manifest["files"].get(str(b), [])) > max_files_per_bucket
        }
    fragmented = sorted(
        {
            int(b)
            for b, files in table.manifest["files"].items()
            if len(files) > max_files_per_bucket
        }
        | deltas
    )
    if not fragmented:
        return []
    # resolve=True folds multi-generation delta rows to latest-version
    df = table.read(buckets=fragmented, include_hidden=True, resolve=True)
    if drop_tombstones:
        df = df.filter(~F.coalesce(F.col(V_DEL), F.lit(False)))
    if table.bucket_column:
        df = df.withColumn(BUCKET_COL, bucket_expr(table.bucket_column, table.num_buckets))
    else:
        df = df.withColumn(BUCKET_COL, F.lit(0))
    # one file per bucket: repartition on the bucket column
    df = df.repartition(len(fragmented), BUCKET_COL)
    table.overwrite_buckets(
        df,
        fragmented,
        summary={"operation": "compact", "buckets": fragmented,
                 "dropped_tombstones": drop_tombstones},
    )
    return fragmented


def expire_snapshots(table: LakeTable, keep_last: int = 3) -> dict:
    """Delete manifests older than the last ``keep_last`` snapshots and
    any data directory no retained snapshot references."""
    history = table.history()
    retained = history[-keep_last:]
    expired = history[:-keep_last]
    live_dirs: set[str] = set()
    for m in retained:
        for files in m["files"].values():
            for rel in files:
                live_dirs.add(rel.split(os.sep)[1])  # data/<snapdir>/...
    # re-root the retained history FIRST (fsync'd tmp+replace, same
    # discipline as LakeTable._commit): a crash after deletions but
    # before the rewrite would leave retained manifests whose parent
    # chain points at deleted snap-*.json files, breaking history()/
    # time travel. Rewrite-then-delete is crash-safe in every prefix.
    if expired and retained:
        import json
        import uuid

        root = dict(retained[0])
        root["parent_id"] = None
        final = os.path.join(table.path, META_DIR, f"snap-{root['snapshot_id']}.json")
        tmp = os.path.join(table.path, META_DIR, f".snap.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(root, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)
    removed_files = 0
    data_root = os.path.join(table.path, DATA_DIR)
    for entry in list(os.listdir(data_root)):
        if entry not in live_dirs:
            shutil.rmtree(os.path.join(data_root, entry), ignore_errors=True)
            removed_files += 1
    removed_manifests = 0
    for m in expired:
        p = os.path.join(table.path, META_DIR, f"snap-{m['snapshot_id']}.json")
        if os.path.exists(p):
            os.remove(p)
            removed_manifests += 1
    return {"removed_data_dirs": removed_files, "removed_manifests": removed_manifests}
