"""Stream-side temporal enrichment: event-time as-of join of each
micro-batch against a versioned dimension (the Structured-Streaming
rendering of Flink's event-time temporal *table* join).

The reference engine has no temporal join at all (SURVEY.md §2.3); in
its stack this need shows up as "attach the campaign/advertiser row
that was current when the impression happened", which the reference
approximates by joining the *latest* dimension row
(/root/reference/etl/clickhouse_schema/kpi_views.sql:24-26) — silently
wrong whenever a dimension row was updated between the event and the
query. The correct primitive is a point-in-time join against the
dimension's *history*:

- :func:`dim_history` turns a CDC change log (or a
  ``LakeTable.read_changes`` feed) into an SCD-2-shaped history table
  ``(key, valid_from, payload...)`` — one row per version, with
  DELETE ops kept as tombstone versions (payload NULLed) so an event
  after a delete correctly enriches to NULL instead of resurrecting
  the last live version.
- :class:`AsofEnrichRunner` tails an event stream and, per micro-batch,
  runs :func:`spark_cdc.operators.temporal.asof_join` against the
  current history (a DataFrame, a LakeTable, or a zero-arg callable
  re-read every batch so a CDC-maintained history table is picked up
  live). Output lands in ``out_dir/_batch=<id>`` via per-batch
  dynamic-partition overwrite, so a redelivered batch (crash between
  write and checkpoint advance) overwrites its own output instead of
  duplicating rows — the same exactly-once discipline as the merge
  path's batch-id guard.

Scale shape: each micro-batch pays ONE hash shuffle of
batch ∪ history on the key (asof_join's union + ordered-window fill —
no join operator, no candidate-pair blow-up), so enrichment cost is
O(batch + history) per trigger regardless of how the two sides' sizes
diverge; history stays a lake-resident table maintained by the CDC
path, never re-derived per batch.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_cdc.operators.temporal import asof_join


def dim_history(
    changes: DataFrame,
    keys: list[str],
    on: str = "ts",
    payload_cols: list[str] | None = None,
    op_col: str = "op",
    delete_op: str = "d",
) -> DataFrame:
    """SCD-2 history from a CDC change log: one row per version,
    ``(keys..., on, payload...)``, ordered by event time within key.

    - create/update post-images become versions valid from their own
      event time;
    - DELETE ops become *tombstone* versions (payload columns NULLed)
      valid from the delete's time — an as-of probe after the delete
      matches the tombstone and enriches to NULL rather than
      resurrecting the pre-delete version;
    - multiple ops on one key at the same ``on`` value keep only the
      last by the feed's ``op_seq``/``lsn`` order when present (same
      tie lattice as the merge path), else an arbitrary winner —
      mirroring :func:`replay_changes_df` semantics per instant.
    """
    cols = payload_cols or [
        c for c in changes.columns
        if c not in keys and c not in (on, op_col, "op_seq", "lsn")
    ]
    versioned = changes.select(
        *keys,
        F.col(on).alias(on),
        *[
            F.when(F.col(op_col) != delete_op, F.col(c)).alias(c)
            for c in cols
        ],
        *[F.col(c) for c in ("op_seq", "lsn") if c in changes.columns],
    )
    order = [c for c in ("op_seq", "lsn") if c in versioned.columns]
    if order:
        # last writer per (key, instant) wins — max_by over a struct of
        # the tie columns; map-side combinable, one shuffle on the key
        tie = F.struct(*[F.col(c) for c in order])
        versioned = versioned.groupBy(*keys, on).agg(
            *[F.max_by(c, tie).alias(c) for c in cols]
        )
    return versioned


class AsofEnrichRunner:
    """Tail an event stream; per micro-batch, as-of join the batch
    against a versioned dimension history and write the enriched rows.

    ``history`` may be a static DataFrame, an object with ``.read()``
    (a :class:`~spark_cdc.lake.table.LakeTable`), or a zero-arg
    callable returning a DataFrame — the latter two are re-read every
    trigger, so a history table maintained by a concurrent CDC ingest
    is joined at its freshest committed snapshot.
    """

    def __init__(
        self,
        spark: SparkSession,
        history,
        source_dir: str,
        checkpoint_dir: str,
        out_dir: str,
        schema: T.StructType,
        on: str,
        by: list[str],
        right_on: str | None = None,
        right_by: list[str] | None = None,
        tolerance: float | None = None,
        source_format: str = "parquet",
        max_files_per_trigger: int | None = None,
        on_batch: Callable[[int, int], None] | None = None,
    ):
        self.spark = spark
        self._history = history
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.out_dir = out_dir
        self.schema = schema
        self.join_args = dict(
            on=on, by=by, right_on=right_on, right_by=right_by,
            tolerance=tolerance,
        )
        self.source_format = source_format
        self.max_files_per_trigger = max_files_per_trigger
        self.on_batch = on_batch

    def _history_df(self) -> DataFrame:
        h = self._history
        if callable(h):
            return h()
        if hasattr(h, "read"):
            return h.read()
        return h

    def _handle(self, batch_df: DataFrame, batch_id: int) -> None:
        enriched = asof_join(batch_df, self._history_df(), **self.join_args)
        # exactly-once without a MERGE: each batch owns the _batch=<id>
        # partition; dynamic overwrite makes redelivery idempotent
        (
            enriched.withColumn("_batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(self.out_dir)
        )
        if self.on_batch:
            # count from the just-written partition — a bare parquet
            # footer scan — instead of re-executing the whole as-of
            # join plan (incl. its quantile job on the bucketed path)
            # a second time per micro-batch
            n = (
                self.spark.read.parquet(self.out_dir)
                .where(F.col("_batch") == int(batch_id))
                .count()
            )
            self.on_batch(batch_id, n)

    def _reader(self):
        reader = self.spark.readStream.schema(self.schema).format(self.source_format)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return reader.load(self.source_dir)

    def run_available(self) -> None:
        """Process everything currently in the source dir, then stop."""
        q = (
            self._reader()
            .writeStream.foreachBatch(self._handle)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def read_enriched(self) -> DataFrame:
        """All enriched output so far (without the bookkeeping col)."""
        return self.spark.read.parquet(self.out_dir).drop("_batch")
