"""Op routing + batch apply (SURVEY.md §2.7 C1-C3).

The reference dispatched each change event in Python
(/root/reference/stream_etl/core/processor.py:186-217: c/r → insert,
u → insert-new-version, d → dropped) and let ClickHouse
ReplacingMergeTree converge versions later. Here the routing is a
single declarative merge:

- within the batch: latest version per key wins (dedup.py);
- against the table: newer-version-wins upsert; winning 'd' deletes
  (handled properly, unlike the reference);
- both as one Spark plan — no per-event Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_cdc.cdc.dedup import DEFAULT_ORDER, latest_version_per_key_agg
from spark_cdc.lake.merge import MergeResult, merge_changes
from spark_cdc.lake.table import LakeTable


def replay_changes_df(
    changes: DataFrame,
    keys: list[str],
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
    op_col: str = "op",
    delete_op: str = "d",
    drop_envelope: bool = True,
) -> DataFrame:
    """Pure-DataFrame full replay: final table state from a change log.

    Equivalent to merging every micro-batch in order — because the
    version order (ts, op_seq, lsn) is total per key, the fold over
    batches equals one global latest-version reduction followed by
    delete filtering. This identity (proved in tests/test_apply.py by
    comparing against incremental LakeTable merges) is what makes the
    engine's output checkable by a plain SQL window-function oracle.
    """
    winners = latest_version_per_key_agg(changes, keys, order_cols)
    alive = winners.filter(F.col(op_col) != F.lit(delete_op))
    if drop_envelope:
        alive = alive.drop(op_col, *[c for c in ("lsn", "op_seq") if c in alive.columns])
    return alive


def apply_batch(
    table: LakeTable,
    changes: DataFrame,
    batch_id: int | None = None,
    source_id: str = "default",
    normalize: dict[str, Column] | None = None,
    **merge_kwargs,
) -> MergeResult:
    """Apply one micro-batch of change events to a LakeTable.

    ``normalize`` maps column name → replacement Column expression
    (e.g. ``{"text": normalize_text(col("text"))}``) applied before the
    merge — the vectorized stand-in for the reference's per-row
    transform layer (/root/reference/etl/core/pipeline.py:54-121).
    """
    for col_name, expr in (normalize or {}).items():
        changes = changes.withColumn(col_name, expr)
    return merge_changes(
        table, changes, batch_id=batch_id, source_id=source_id, **merge_kwargs
    )
