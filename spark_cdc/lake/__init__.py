"""spark_cdc.lake — a minimal snapshot-isolated lake table format.

The sandbox ships no Iceberg/Delta jars, so the engine provides its own
table format with the same *semantics* the north rule names: atomic
snapshot commits, copy-on-write MERGE over hash-bucketed files, schema
evolution (ADD COLUMN with null backfill), time travel, and snapshot
properties used for exactly-once batch bookkeeping. On a real cluster
every call in ``LakeTable`` maps 1:1 onto an Iceberg operation
(``MERGE INTO`` / ``ALTER TABLE ADD COLUMN`` / snapshot summary
properties) — the orchestration layer above is format-agnostic.

Replaces, explicitly instead of implicitly, the semantics ClickHouse
storage engines carried in the reference
(/root/reference/etl/clickhouse_schema/init.sql:14,28 —
``ReplacingMergeTree(updated_at)`` latest-version-wins; :40,51 —
monthly partition pruning; :41,52 — the multi-column primary index
``ORDER BY (campaign_id, event_date)``, rendered here as
``zorder_compact`` + per-file zone maps + ``read(zone_between=...)``).
"""

from spark_cdc.lake.table import LakeTable
from spark_cdc.lake.merge import merge_changes
from spark_cdc.lake.maintenance import compact, expire_snapshots, zorder_compact

__all__ = ["LakeTable", "merge_changes", "compact", "expire_snapshots",
           "zorder_compact"]
