"""Snapshot/manifest table format over parquet.

Layout on disk::

    <root>/
      _meta/
        snap-<id>.json     # immutable snapshot manifest
        VERSION            # current snapshot id (atomically replaced)
      data/
        snap<id>/_bucket=<k>/part-*.parquet

A snapshot manifest records the full table schema, the bucket spec,
the complete file list per bucket, arbitrary properties (used by the
CDC runner for exactly-once batch-id bookkeeping) and a summary with
lineage metrics. Commit = write manifest, then atomically replace the
VERSION pointer (``os.replace``); readers resolve VERSION → manifest →
files, so they always see a consistent snapshot. Single-writer by
design (one Structured Streaming query owns a table), matching the
reference where one consumer thread owned the ClickHouse sink
(/root/reference/stream_etl/core/consumer.py:111-127).

Scale notes (100 TB design):

- Data files are hash-bucketed on the merge key's conversation id:
  ``pmod(xxhash64(conv_id), num_buckets)`` — the moral equivalent of
  Iceberg ``bucket(N, conv_id)`` hidden partitioning. A merge batch
  only reads + rewrites buckets that contain changed conversations;
  untouched buckets carry over into the new manifest by reference,
  so MERGE cost scales with the change set, not the table.
- All turns of one conversation land in one bucket → per-conversation
  operators (stitching, ordered reads) need no extra shuffle.
- The manifest is O(#files) JSON; at real scale this becomes Iceberg
  metadata, the API here does not change.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_DIR = "_meta"
DATA_DIR = "data"
VERSION_FILE = "VERSION"
BUCKET_COL = "_bucket"
# Hidden per-row columns persisted in data files; used by the MERGE
# resolution guard (latest (ts, op_seq) wins) and dropped from
# user-facing reads. ``_deleted`` rows are tombstones: a delete must
# out-version late-arriving older inserts (the reference simply
# dropped deletes, /root/reference/stream_etl/core/processor.py:214-217
# — we keep correct semantics; tombstones are GC'd by compaction).
V_TS = "_v_ts"
V_SEQ = "_v_seq"
V_DEL = "_deleted"
# write-generation (snapshot id at write time): merge-on-read delta
# files may carry several versions of one key across files; _gen breaks
# exact version ties in favour of the later write.
V_GEN = "_gen"
HIDDEN_COLS = (V_TS, V_SEQ, V_DEL, V_GEN)


class CommitConflictError(RuntimeError):
    """Optimistic-concurrency commit failure: another writer committed
    a snapshot with this id first (Iceberg ``CommitFailedException``
    analogue). The losing writer's data files are written but
    unreferenced — safe; recovery is ``refresh()`` and re-run the merge
    (idempotent under the batch-id guard), never retry the raw commit.
    May also indicate a CRASHED commit that left a manifest ahead of
    VERSION — ``fsck`` reports that case and ``check --repair`` clears
    it."""


def bucket_expr(bucket_column: str, num_buckets: int):
    """Deterministic bucket id for a key column (Iceberg-style hash bucket)."""
    return F.pmod(F.xxhash64(F.col(bucket_column)), F.lit(num_buckets)).cast("int")


def _zone_value(v):
    """Normalize a parquet-footer statistic or probe bound for zone-map
    comparison: ints/floats as-is, ASCII strings as-is, datetimes and
    dates as ISO-8601 strings (lexicographic order == chronological —
    mixed-precision safe: a shorter stamp is a prefix of, and sorts
    before, its sub-second extension). Anything else → None (never
    prune on it)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            # footers for TIMESTAMP (adjusted-to-UTC) may surface
            # tz-aware values; normalize to naive UTC so probe and
            # stat render identically (a stray "+00:00" suffix would
            # mis-order exact-boundary comparisons)
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        try:
            v = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, str):
        return v if v.isascii() else None
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return v
    return None


def _resolve_latest(df: DataFrame, keys: list[str]) -> DataFrame:
    """Latest-version-per-key over possibly-multi-generation rows:
    max_by(payload, (v_ts, v_seq, gen)) — the MoR read-path resolution.
    Hash-aggregate with map-side partial combine (skew-safe)."""
    payload = [c for c in df.columns if c not in keys]
    pay = F.struct(*[F.col(c).alias(c) for c in payload])
    ords = F.struct(
        F.coalesce(F.col(V_TS), F.to_timestamp(F.lit("1900-01-01"))).alias("o_ts"),
        F.coalesce(F.col(V_SEQ), F.lit(-1)).alias("o_seq"),
        F.coalesce(F.col(V_GEN), F.lit(-1)).alias("o_gen"),
    )
    return (
        df.groupBy(*keys)
        .agg(F.max_by(pay, ords).alias("_w"))
        .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )


class LakeTable:
    """Handle to a lake table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str, manifest: dict[str, Any]):
        self.spark = spark
        self.path = path
        self.manifest = manifest
        # wall time of the most recent data-write Spark action / manifest
        # commit — per-phase lineage for MergeResult.phases and bench
        self.last_write_ms = 0.0
        self.last_commit_ms = 0.0
        # per-file [min,max] key stats from the most recent _write_data,
        # folded into the manifest by _commit_next
        self._last_write_stats: dict[str, list] = {}
        # per-file per-column zone maps for properties["stats_columns"]
        # (multi-column file skipping beyond the bucket key)
        self._last_write_col_stats: dict[str, dict[str, list]] = {}

    # ------------------------------------------------------------- create/load
    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_columns: list[str] | None = None,
        bucket_column: str | None = None,
        num_buckets: int = 32,
        properties: dict[str, Any] | None = None,
    ) -> "LakeTable":
        if os.path.exists(os.path.join(path, META_DIR, VERSION_FILE)):
            raise ValueError(f"table already exists at {path}")
        os.makedirs(os.path.join(path, META_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, DATA_DIR), exist_ok=True)
        if key_columns and bucket_column is None:
            bucket_column = key_columns[0]
        if key_columns:
            # keyed (mergeable) tables carry hidden per-row version
            # columns used by the MERGE newer-wins guard
            names = {f.name for f in schema.fields}
            extra = [
                T.StructField(V_TS, T.TimestampType(), True),
                T.StructField(V_SEQ, T.LongType(), True),
                T.StructField(V_DEL, T.BooleanType(), True),
                T.StructField(V_GEN, T.LongType(), True),
            ]
            schema = T.StructType(
                list(schema.fields) + [f for f in extra if f.name not in names]
            )
        manifest = {
            "snapshot_id": 0,
            "parent_id": None,
            "schema": json.loads(schema.json()),
            "key_columns": key_columns or [],
            "bucket_column": bucket_column,
            "num_buckets": num_buckets,
            "files": {},
            "properties": properties or {},
            "summary": {"operation": "create"},
        }
        tbl = LakeTable(spark, path, manifest)
        tbl._commit(manifest)
        return tbl

    @staticmethod
    def load(spark: SparkSession, path: str) -> "LakeTable":
        tbl = LakeTable(spark, path, {})
        tbl.refresh()
        return tbl

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path, META_DIR, VERSION_FILE))

    def refresh(self) -> "LakeTable":
        with open(os.path.join(self.path, META_DIR, VERSION_FILE)) as f:
            snap_id = int(f.read().strip())
        self.manifest = self._read_manifest(snap_id)
        return self

    # ------------------------------------------------------------- properties
    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.manifest["schema"])

    @property
    def user_schema(self) -> T.StructType:
        return T.StructType(
            [f for f in self.schema.fields if f.name not in HIDDEN_COLS]
        )

    @property
    def key_columns(self) -> list[str]:
        return list(self.manifest["key_columns"])

    @property
    def num_buckets(self) -> int:
        return int(self.manifest["num_buckets"])

    @property
    def bucket_column(self) -> str | None:
        return self.manifest["bucket_column"]

    @property
    def snapshot_id(self) -> int:
        return int(self.manifest["snapshot_id"])

    @property
    def properties(self) -> dict[str, Any]:
        return self.manifest["properties"]

    def history(self) -> list[dict[str, Any]]:
        """All snapshot manifests, oldest first (time-travel index)."""
        out = []
        sid: int | None = self.snapshot_id
        while sid is not None:
            m = self._read_manifest(sid)
            out.append(m)
            sid = m["parent_id"]
        return list(reversed(out))

    # ------------------------------------------------------------------ read
    def read(
        self,
        snapshot_id: int | None = None,
        buckets: list[int] | None = None,
        include_hidden: bool = False,
        resolve: bool | None = None,
        key_between: tuple | None = None,
        key_in: list | None = None,
        zone_between: dict | None = None,
    ) -> DataFrame:
        """Snapshot read; optionally restricted to a bucket subset.

        Files written before a schema evolution lack the added columns;
        passing the current schema to the parquet reader null-fills
        them (Iceberg ADD COLUMN semantics).

        Merge-on-read: buckets carrying delta files (appended by
        ``merge_changes(mode='mor')``) may hold several versions of a
        key across file generations; those buckets are resolved to
        latest-version-per-key on the fly (Iceberg MoR read path).
        ``resolve`` forces/suppresses this (default: auto from the
        manifest's ``delta_buckets``).

        ``key_between=(lo, hi)`` prunes FILES via the manifest's
        per-file min/max statistics on the bucket column (files are
        written sorted by key, so ranges are tight) — the Iceberg
        data-file skipping analogue — AND applies the matching row
        predicate on the bucket column before MoR resolution. The row
        filter is load-bearing, not a convenience: a key outside the
        range may have its newest version or delete tombstone only in
        a pruned file, so an unfiltered read could resolve it to a
        stale or resurrected row from a kept file. In-range keys are
        safe by construction (every version of a key lies in a file
        whose range covers it, so no file of an in-range key is
        pruned). Files from pre-stats manifests have no recorded range
        and are kept.

        ``key_in=[v1, v2, ...]`` is the multi-point twin: keep only
        files whose [min, max] range contains at least one of the
        values, and filter rows to the value set. This is the serving
        probe for value-bucketed secondary indexes (a BM25 query's
        token list, see :mod:`spark_cdc.operators.index_maint`) —
        combined with bucket pruning via :meth:`buckets_for`, an
        n-token probe over a 10^9-doc postings table reads only the
        files that can hold those tokens' postings. Same row-filter
        safety argument as ``key_between``.
        """
        manifest = (
            self.manifest if snapshot_id is None else self._read_manifest(snapshot_id)
        )
        schema = T.StructType.fromJson(manifest["schema"])
        delta_buckets = {
            int(b)
            for b in manifest.get("delta_buckets", [])
            if buckets is None or int(b) in buckets
        }
        key_in_sorted = sorted(set(key_in)) if key_in is not None else None
        files = [
            os.path.join(self.path, f)
            for f in self.selected_files(
                manifest, buckets, key_between, key_in_sorted, zone_between
            )
        ]
        if not files:
            df = self.spark.createDataFrame([], schema)
        else:
            df = self.spark.read.schema(schema).parquet(*files)
        if key_between is not None and self.bucket_column:
            # the row-level twin of the file pruning above — without it
            # out-of-range keys could surface incorrectly resolved (see
            # docstring); pushed down to the parquet scan by Catalyst.
            lo, hi = key_between
            kc = F.col(self.bucket_column)
            df = df.where((kc >= F.lit(lo)) & (kc <= F.lit(hi)))
        if key_in_sorted is not None and self.bucket_column:
            # row-level twin of the key_in file pruning (same safety
            # argument); pushed down to the parquet scan by Catalyst
            df = df.where(F.col(self.bucket_column).isin(key_in_sorted))
        need_resolve = bool(delta_buckets) if resolve is None else resolve
        if need_resolve and self.key_columns and files:
            df = _resolve_latest(df, list(manifest["key_columns"]))
        if zone_between:
            # row-level twin of the zone-map file pruning — applied
            # AFTER MoR resolution, because a zone column is not the
            # merge key: filtering versions of a key by a mutable
            # column before resolution could drop the newest version
            # and resurrect a stale in-range one. File pruning is
            # restricted to single-version (non-delta) buckets for the
            # same reason (see selected_files), where one row per key
            # makes skipping out-of-range files trivially safe. In the
            # no-resolve case Catalyst pushes this straight to the
            # scan.
            for zc, (zlo, zhi) in zone_between.items():
                df = df.where(F.col(zc).between(F.lit(zlo), F.lit(zhi)))
        if not include_hidden:
            if V_DEL in df.columns:
                df = df.filter(~F.coalesce(F.col(V_DEL), F.lit(False)))
            df = df.drop(*[c for c in HIDDEN_COLS if c in df.columns])
        return df

    def selected_files(
        self,
        manifest: dict[str, Any] | None = None,
        buckets: list[int] | None = None,
        key_between: tuple | None = None,
        key_in: list | None = None,
        zone_between: dict | None = None,
    ) -> list[str]:
        """Relative data-file list a read with these predicates touches
        — bucket subset first, then per-file [min, max] stats on the
        bucket column (``key_between`` range / ``key_in`` membership
        via bisect over the sorted probe list), then multi-column zone
        maps (``zone_between = {col: (lo, hi)}`` against
        ``col_stats``, recorded for the table's ``stats_columns``
        property — see :func:`spark_cdc.lake.maintenance.
        zorder_compact`). Zone pruning applies only to files in
        single-version (non-delta) buckets: a zone column is not the
        merge key, so in a multi-version bucket the newest version of
        a key could live in a pruned file while a stale in-range
        version survives — delta buckets are read in full and filtered
        after MoR resolution instead. Exposed so pruning is testable
        and observable (the Iceberg ``planFiles`` analogue);
        :meth:`read` consumes exactly this list."""
        manifest = self.manifest if manifest is None else manifest
        stats = manifest.get("file_stats", {})
        col_stats = manifest.get("col_stats", {})
        delta_set = {int(b) for b in manifest.get("delta_buckets", [])}
        key_in_sorted = sorted(set(key_in)) if key_in is not None else None
        zone_norm = (
            {
                zc: (_zone_value(zlo), _zone_value(zhi))
                for zc, (zlo, zhi) in zone_between.items()
            }
            if zone_between
            else None
        )

        def overlaps(rel: str, in_delta_bucket: bool) -> bool:
            rng = stats.get(rel)
            if rng:
                if key_between is not None:
                    lo, hi = key_between
                    if rng[1] < lo or rng[0] > hi:
                        return False
                if key_in_sorted is not None:
                    # sorted probe list: bisect to the first value ≥ min
                    # and check it is ≤ max — O(log n) per file
                    import bisect

                    try:
                        i = bisect.bisect_left(key_in_sorted, rng[0])
                        if i >= len(key_in_sorted) or key_in_sorted[i] > rng[1]:
                            return False
                    except TypeError:
                        pass  # probe/stat type mismatch: never prune
            if zone_norm and not in_delta_bucket:
                per_col = col_stats.get(rel, {})
                for zc, (zlo, zhi) in zone_norm.items():
                    crng = (
                        per_col.get(zc)
                        if zc != self.bucket_column
                        else stats.get(rel)
                    )
                    if not crng or zlo is None or zhi is None:
                        continue
                    try:
                        if crng[1] < zlo or crng[0] > zhi:
                            return False
                    except TypeError:
                        continue  # mismatched probe type: never prune
            return True

        files: list[str] = []
        for b, flist in manifest["files"].items():
            if buckets is None or int(b) in buckets:
                in_delta = int(b) in delta_set
                files.extend(f for f in flist if overlaps(f, in_delta))
        return files

    def lookup(self, key_value, snapshot_id: int | None = None) -> DataFrame:
        """Point read of one bucket-key value (e.g. one conversation):
        hash to its bucket, skip files whose min/max key range misses
        it, then filter — the serving-path read. On a bucketed 100 TB
        table this touches 1/num_buckets of the metadata and, within
        the bucket, only files actually containing the key (tight
        ranges: files are written key-sorted); MoR resolution then runs
        over just those rows."""
        col = self.bucket_column
        if not col:
            raise ValueError("lookup requires a bucketed table")
        row = (
            self.spark.createDataFrame(
                [(key_value,)],
                T.StructType([T.StructField(col, self.schema[col].dataType)]),
            )
            .select(bucket_expr(col, self.num_buckets).alias("b"))
            .first()
        )
        df = self.read(
            snapshot_id=snapshot_id,
            buckets=[int(row["b"])],
            key_between=(key_value, key_value),
        )
        return df.where(F.col(col) == F.lit(key_value))

    def buckets_for(self, values: list) -> list[int]:
        """Bucket ids the given bucket-column values hash into — one
        tiny Spark job over |values| local rows (the same JVM-exact
        hash :func:`bucket_expr` writes with; never re-implemented
        driver-side where it could drift). Bounded: probe value lists
        are query-sized, not data-sized."""
        col = self.bucket_column
        if not col:
            raise ValueError("buckets_for requires a bucketed table")
        rows = self.spark.createDataFrame(
            [(v,) for v in values],
            T.StructType([T.StructField(col, self.schema[col].dataType)]),
        )
        return sorted(
            r["b"]
            for r in rows.select(bucket_expr(col, self.num_buckets).alias("b"))
            .distinct()
            .collect()
        )

    def probe(self, values: list, snapshot_id: int | None = None) -> DataFrame:
        """Multi-point serving read on the bucket column: restrict to
        the buckets the values hash into, skip files whose [min, max]
        range holds none of them, filter rows to the value set, THEN
        MoR-resolve — the plural :meth:`lookup`. On a token-bucketed
        postings table this is the reference's primary-key probe
        semantics (ClickHouse ORDER BY index, /root/reference/etl/
        clickhouse_schema/init.sql:41): an n-value probe reads
        ≤ n/num_buckets of the metadata and only matching files."""
        if not values:
            raise ValueError("probe needs at least one value")
        return self.read(
            snapshot_id=snapshot_id,
            buckets=self.buckets_for(values),
            key_in=list(values),
        )

    def _diff_sides(
        self,
        m_from: dict[str, Any],
        m_to: dict[str, Any],
        from_id: int,
        to_id: int,
        changed: list[int],
        keys: list[str],
    ):
        """(old, new) VISIBLE-row DataFrames feeding the change-feed
        outer join — with an append-only fast path.

        The general form reads BOTH complete snapshots of the changed
        buckets and lets the outer join shuffle them — O(touched-bucket
        data) twice per poll, which on a steadily-growing MoR source is
        O(table). But the common commit between two polls only APPENDS
        delta files (MoR merges); then the keys that can possibly
        differ are exactly the keys present in the appended files, so:

        - ``new side`` = resolve(old-matching rows ∪ appended rows),
        - ``old side`` = resolve(old-matching rows),

        where *old-matching* is the old snapshot semi-joined to the
        appended files' key set — the appended files are read once
        (O(change set) bytes), the old snapshot's buckets are scanned
        once WITHOUT a full-width shuffle (the semi-join broadcasts the
        key set when the appended bytes are small), and both resolves
        aggregate O(change-set keys) rows. Keys absent from the
        appended files have byte-identical file lists in both
        snapshots and therefore identical visible state — they cannot
        produce a feed row in either form, so the two forms return the
        same diff (pinned by the feed property tests + the
        cdc_change_feed oracle).

        Falls back to the general two-snapshot form whenever any bucket
        saw files removed or reordered (CoW merges, compaction,
        z-order, GC) — the prefix check below."""
        appended: list[str] = []
        append_only = True
        for b in set(m_from["files"]) | set(m_to["files"]):
            old_l = m_from["files"].get(b, [])
            new_l = m_to["files"].get(b, [])
            if new_l[: len(old_l)] != old_l:
                append_only = False
                break
            appended.extend(new_l[len(old_l):])
        if not append_only or not appended:
            return (
                self.read(snapshot_id=from_id, buckets=changed),
                self.read(snapshot_id=to_id, buckets=changed),
            )
        to_schema = T.StructType.fromJson(m_to["schema"])
        delta = self.spark.read.schema(to_schema).parquet(
            *[os.path.join(self.path, f) for f in appended]
        )
        key_set = delta.select(*keys).distinct()
        try:
            appended_bytes = sum(
                os.path.getsize(os.path.join(self.path, f)) for f in appended
            )
        except OSError:
            appended_bytes = None
        if appended_bytes is not None and appended_bytes < 64 * 1024 * 1024:
            key_set = F.broadcast(key_set)
        old_raw = self.read(
            snapshot_id=from_id, buckets=changed,
            include_hidden=True, resolve=False,
        )
        old_m = old_raw.join(key_set, keys, "left_semi")
        # evolution between the snapshots: align the old rows to the
        # new schema before the union (null-filled adds)
        for f in to_schema.fields:
            if f.name not in old_m.columns:
                old_m = old_m.withColumn(f.name, F.lit(None).cast(f.dataType))

        def visible(df):
            res = _resolve_latest(df, keys)
            if V_DEL in res.columns:
                res = res.filter(~F.coalesce(F.col(V_DEL), F.lit(False)))
            return res.drop(*[c for c in HIDDEN_COLS if c in res.columns])

        new_side = visible(
            old_m.unionByName(delta, allowMissingColumns=True)
        )
        return visible(old_m), new_side

    def read_changes(
        self,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
        include_preimage: bool = False,
    ) -> DataFrame:
        """Change data feed: the NET row-level diff between two
        snapshots (Delta ``readChangeFeed`` / Iceberg
        ``create_changelog_view(net_changes=true)`` analogue — the
        reference had no incremental-consumption story at all;
        downstream consumers re-read full tables,
        /root/reference/etl/core/pipeline.py:136-181).

        Returns user columns + ``_change_type`` ∈ {'insert',
        'update_postimage', 'delete'}; deletes carry the pre-image
        payload. A key rewritten with an identical payload (e.g. by
        compaction) produces no row, so maintenance commits net out to
        an empty feed.

        ``include_preimage=True`` returns both images per row — payload
        columns hold the post-image (null for deletes) and ``_pre_<c>``
        columns the pre-image (null for inserts) — the shape retraction
        consumers need (incremental aggregate maintenance subtracts the
        pre-image contribution and adds the post-image one, see
        :mod:`spark_cdc.operators.ivm`).

        Scale path: per-bucket file lists carry over BY REFERENCE
        across commits, so buckets whose lists are identical in both
        manifests cannot differ — the diff join reads only changed
        buckets (cost ∝ change set, not table size). Both sides are
        hash-bucketed on the same key, so the outer join co-partitions
        cleanly; no driver-side state.
        """
        to_id = self.snapshot_id if to_snapshot_id is None else to_snapshot_id
        m_from = self._read_manifest(from_snapshot_id)
        m_to = self._read_manifest(to_id)
        keys = list(m_to["key_columns"])
        if not keys:
            raise ValueError("read_changes requires a keyed (mergeable) table")
        changed = sorted(
            int(b)
            for b in set(m_from["files"]) | set(m_to["files"])
            if m_from["files"].get(b) != m_to["files"].get(b)
        )
        to_user = [
            f.name
            for f in T.StructType.fromJson(m_to["schema"]).fields
            if f.name not in HIDDEN_COLS
        ]
        pay = [c for c in to_user if c not in keys]
        to_fields = {f.name: f for f in T.StructType.fromJson(m_to["schema"]).fields}
        out_fields = [to_fields[c] for c in keys + pay]
        if include_preimage:
            out_fields += [
                T.StructField(f"_pre_{c}", to_fields[c].dataType, True) for c in pay
            ]
        schema_out = T.StructType(
            out_fields + [T.StructField("_change_type", T.StringType(), False)]
        )
        if not changed:
            return self.spark.createDataFrame([], schema_out)
        old, new = self._diff_sides(
            m_from, m_to, from_snapshot_id, to_id, changed, keys
        )
        # schema evolution between the snapshots: null-fill columns the
        # old snapshot predates (ADD COLUMN read semantics)
        for c in to_user:
            if c not in old.columns:
                old = old.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
        o = old.select(*keys, F.struct(*[F.col(c) for c in pay]).alias("_old"))
        n = new.select(*keys, F.struct(*[F.col(c) for c in pay]).alias("_new"))
        j = o.join(n, on=keys, how="full_outer")
        # struct comparison is ordering-based in Spark (null fields
        # compare equal), so `=` is already null-safe field-wise
        change = (
            F.when(F.col("_old").isNull(), F.lit("insert"))
            .when(F.col("_new").isNull(), F.lit("delete"))
            .when(F.col("_new") != F.col("_old"), F.lit("update_postimage"))
        )
        j = j.withColumn("_change_type", change).where(
            F.col("_change_type").isNotNull()
        )
        if include_preimage:
            return j.select(
                *keys,
                *[F.col(f"_new.{c}").alias(c) for c in pay],
                *[F.col(f"_old.{c}").alias(f"_pre_{c}") for c in pay],
                "_change_type",
            )
        winner = F.when(
            F.col("_change_type") == "delete", F.col("_old")
        ).otherwise(F.col("_new"))
        return (
            j.withColumn("_row", winner)
            .select(
                *keys,
                *[F.col(f"_row.{c}").alias(c) for c in pay],
                "_change_type",
            )
        )

    # ----------------------------------------------------------------- write
    def append(
        self,
        df: DataFrame,
        summary: dict[str, Any] | None = None,
        properties: dict[str, Any] | None = None,
    ) -> int:
        """Append-only write (facts / metrics tables). Bucketed if the
        table has a bucket spec, else lands in bucket 0. ``properties``
        replaces the snapshot properties in the same commit (used for
        exactly-once batch-id bookkeeping on append-only sinks)."""
        new_id = self.snapshot_id + 1
        df = self._conform(df)
        if self.bucket_column:
            df = df.withColumn(
                BUCKET_COL, bucket_expr(self.bucket_column, self.num_buckets)
            )
        else:
            df = df.withColumn(BUCKET_COL, F.lit(0))
        new_files = self._write_data(df, new_id)
        files = {k: list(v) for k, v in self.manifest["files"].items()}
        for b, fl in new_files.items():
            files.setdefault(b, []).extend(fl)
        self._commit_next(
            new_id,
            files,
            properties if properties is not None else dict(self.properties),
            summary or {"operation": "append"},
        )
        return new_id

    def overwrite_buckets(
        self,
        df: DataFrame,
        touched_buckets: list[int],
        properties: dict[str, Any] | None = None,
        summary: dict[str, Any] | None = None,
        presorted: bool = False,
    ) -> int:
        """Copy-on-write replacement of a bucket subset: ``df`` (already
        carrying ``_bucket``) becomes the new content of
        ``touched_buckets``; every other bucket carries over by
        reference. This is the commit primitive under MERGE (CoW mode)
        and compaction; replaced buckets are single-version again, so
        their delta flag clears. ``presorted`` skips the key-order
        sortWithinPartitions for callers that already arranged rows
        (z-order rewrite)."""
        new_id = self.snapshot_id + 1
        new_files = self._write_data(df, new_id, presorted=presorted)
        files = {
            b: list(fl)
            for b, fl in self.manifest["files"].items()
            if int(b) not in touched_buckets
        }
        for b, fl in new_files.items():
            files[b] = fl
        deltas = sorted(
            set(int(b) for b in self.manifest.get("delta_buckets", []))
            - set(touched_buckets)
        )
        self._commit_next(
            new_id,
            files,
            properties if properties is not None else dict(self.properties),
            summary or {"operation": "overwrite_buckets"},
            delta_buckets=deltas,
        )
        return new_id

    def append_deltas(
        self,
        df: DataFrame,
        touched_buckets: list[int] | None = None,
        properties: dict[str, Any] | None = None,
        summary: dict[str, Any] | None = None,
    ) -> int:
        """Merge-on-read commit: append ``df`` (carrying ``_bucket``) as
        delta files to ``touched_buckets`` without rewriting existing
        data. Ingest cost is O(batch); reads of flagged buckets resolve
        latest-version on the fly until :func:`spark_cdc.lake.
        maintenance.compact` folds them."""
        new_id = self.snapshot_id + 1
        new_files = self._write_data(df, new_id)
        files = {b: list(fl) for b, fl in self.manifest["files"].items()}
        for b, fl in new_files.items():
            files.setdefault(b, []).extend(fl)
        if touched_buckets is None:
            # derive from what the write actually produced (saves the
            # caller a pre-pass job)
            touched_buckets = [int(b) for b in new_files]
        deltas = sorted(
            set(int(b) for b in self.manifest.get("delta_buckets", []))
            | set(touched_buckets)
        )
        self._commit_next(
            new_id,
            files,
            properties if properties is not None else dict(self.properties),
            summary or {"operation": "append_deltas"},
            delta_buckets=deltas,
        )
        return new_id

    def add_columns(self, fields: list[T.StructField]) -> None:
        """Schema evolution: ADD COLUMN (nullable, null backfill on read).

        The reference had no schema evolution story at all (fixed column
        lists, /root/reference/etl/core/pipeline.py:136-181); the north
        rule requires it for mid-stream added columns like ``tool``.
        """
        schema = self.schema
        existing = {f.name for f in schema.fields}
        added = [f for f in fields if f.name not in existing]
        if not added:
            return
        # keep hidden version columns last for readability
        user = [f for f in schema.fields if f.name not in HIDDEN_COLS]
        hidden = [f for f in schema.fields if f.name in HIDDEN_COLS]
        new_schema = T.StructType(user + added + hidden)
        new_id = self.snapshot_id + 1
        manifest = dict(self.manifest)
        manifest.update(
            {
                "snapshot_id": new_id,
                "parent_id": self.snapshot_id,
                "schema": json.loads(new_schema.json()),
                "summary": {
                    "operation": "add_columns",
                    "columns": [f.name for f in added],
                },
            }
        )
        self._commit(manifest)

    def set_properties(self, props: dict[str, Any]) -> None:
        new_id = self.snapshot_id + 1
        manifest = dict(self.manifest)
        new_props = dict(self.properties)
        new_props.update(props)
        manifest.update(
            {
                "snapshot_id": new_id,
                "parent_id": self.snapshot_id,
                "properties": new_props,
                "summary": {"operation": "set_properties"},
            }
        )
        self._commit(manifest)

    # -------------------------------------------------------------- internals
    def _conform(self, df: DataFrame) -> DataFrame:
        """Project df onto the table schema (missing nullable cols → null)."""
        schema = self.schema
        cols = []
        for f in schema.fields:
            if f.name in df.columns:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            elif f.name == V_TS and "ts" in df.columns:
                # appended base rows adopt their payload ts as version
                cols.append(F.col("ts").cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)

    def _write_data(
        self, df: DataFrame, snapshot_id: int, presorted: bool = False
    ) -> dict[str, list[str]]:
        """Write df (with ``_bucket``) partitioned by bucket; return
        relative file paths per bucket. Wall time of the write job (the
        Spark action that executes the whole merge plan) is recorded in
        ``last_write_ms`` for per-phase lineage/bench reporting."""
        import time as _time

        t0 = _time.monotonic()
        self._last_write_stats = {}
        self._last_write_col_stats = {}
        rel_dir = os.path.join(DATA_DIR, f"snap{snapshot_id}-{uuid.uuid4().hex[:8]}")
        out_dir = os.path.join(self.path, rel_dir)
        if presorted:
            pass  # caller already ordered the partitions (e.g. z-order)
        elif self.key_columns:
            # clustered storage order within each file (the analogue of
            # the reference's ORDER BY (campaign_id, event_date) primary
            # key, init.sql:41,52; Iceberg WRITE ORDERED BY): better
            # compression + parquet min/max data skipping on the key.
            # The bucket column sorts FIRST even when it is not the
            # leading key (e.g. BM25 postings keyed (doc_id, token) but
            # bucketed by token): per-file [min,max] ranges on the
            # bucket column stay tight, so probe reads actually skip
            # files. No-op when bucket_column == key_columns[0].
            sort_cols = [BUCKET_COL]
            if self.bucket_column and self.bucket_column != self.key_columns[0]:
                sort_cols.append(self.bucket_column)
            sort_cols += [c for c in self.key_columns if c not in sort_cols]
            df = df.sortWithinPartitions(*sort_cols)
        df.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(out_dir)
        files: dict[str, list[str]] = {}
        for entry in sorted(os.listdir(out_dir)):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            bdir = os.path.join(out_dir, entry)
            files[b] = [
                os.path.join(rel_dir, entry, f)
                for f in sorted(os.listdir(bdir))
                if f.endswith(".parquet")
            ]
        self._last_write_stats = self._collect_file_stats(files)
        extra = [
            c for c in self.properties.get("stats_columns", [])
            if c != self.bucket_column and c in {f.name for f in self.schema.fields}
        ]
        if extra:
            self._last_write_col_stats = self._collect_col_stats(files, extra)
        self.last_write_ms = (_time.monotonic() - t0) * 1000
        return files

    def _collect_file_stats(self, files: dict[str, list[str]]) -> dict[str, list]:
        """Per-file [min, max] of the bucket column from parquet
        footers (files are sorted by key, so ranges are tight) —
        powers manifest-level data-file skipping (``read(key_between=
        ...)``), the Iceberg per-file column-stats analogue.

        Footers are read driver-side here (a commit writes ≤ #buckets
        files, each footer is a few KB); on a real cluster the write
        tasks return these stats with their commit messages, as
        Iceberg writers do — the manifest shape is identical. Values
        are recorded only when they serialize safely AND order
        consistently between parquet (UTF-8 bytes) and Python
        (codepoints): ints, floats, ASCII strings. Files without a
        recorded range are never pruned.
        """
        col = self.bucket_column
        if not col:
            return {}
        try:
            import pyarrow.parquet as pq
        except ImportError:
            return {}

        def safe(v):
            if isinstance(v, bytes):
                try:
                    v = v.decode("utf-8")
                except UnicodeDecodeError:
                    return None
            if isinstance(v, str):
                return v if v.isascii() else None
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                return v
            return None

        def one(rel: str):
            try:
                md = pq.read_metadata(os.path.join(self.path, rel))
            except Exception:
                return rel, None
            idx = next(
                (
                    j
                    for j in range(md.num_columns)
                    if md.row_group(0).column(j).path_in_schema == col
                ),
                None,
            ) if md.num_row_groups else None
            if idx is None:
                return rel, None
            mins, maxs = [], []
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                if st is None or not st.has_min_max:
                    return rel, None
                lo, hi = safe(st.min), safe(st.max)
                if lo is None or hi is None:
                    return rel, None
                mins.append(lo)
                maxs.append(hi)
            return rel, ([min(mins), max(maxs)] if mins else None)

        rels = [rel for fl in files.values() for rel in fl]
        out: dict[str, list] = {}
        if len(rels) > 4:
            # footer reads are independent tiny I/O; a commit writes up
            # to one file per bucket and the serial loop was a visible
            # driver-side slice of every micro-batch
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(8, len(rels))) as ex:
                results = list(ex.map(one, rels))
        else:
            results = [one(rel) for rel in rels]
        for rel, rng in results:
            if rng is not None:
                out[rel] = rng
        return out

    def _collect_col_stats(
        self, files: dict[str, list[str]], cols: list[str]
    ) -> dict[str, dict[str, list]]:
        """Per-file [min, max] zone maps for ``cols`` (the table's
        ``stats_columns`` property) from parquet footers — the
        multi-column twin of :meth:`_collect_file_stats`, powering
        ``read(zone_between=...)`` file skipping on columns OTHER than
        the bucket key (ClickHouse's multi-column ``ORDER BY
        (campaign_id, event_date)`` primary index, reference
        init.sql:41; Delta/Iceberg column-stats skipping after a
        Z-ORDER rewrite). Temporal values are normalized to ISO-8601
        strings (lexicographic == chronological), so probes must use
        matching datetime/date objects. A column missing stats in a
        file never prunes that file."""
        try:
            import pyarrow.parquet as pq
        except ImportError:
            return {}

        def one(rel: str):
            try:
                md = pq.read_metadata(os.path.join(self.path, rel))
            except Exception:
                return rel, None
            if not md.num_row_groups:
                return rel, None
            name_to_idx = {
                md.row_group(0).column(j).path_in_schema: j
                for j in range(md.num_columns)
            }
            per_col: dict[str, list] = {}
            for col in cols:
                idx = name_to_idx.get(col)
                if idx is None:
                    continue
                mins, maxs = [], []
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(idx).statistics
                    if st is None or not st.has_min_max:
                        mins = []
                        break
                    lo, hi = _zone_value(st.min), _zone_value(st.max)
                    if lo is None or hi is None:
                        mins = []
                        break
                    mins.append(lo)
                    maxs.append(hi)
                if mins:
                    per_col[col] = [min(mins), max(maxs)]
            return rel, (per_col or None)

        rels = [rel for fl in files.values() for rel in fl]
        if len(rels) > 4:
            # same independent-tiny-I/O argument as _collect_file_stats
            # (its threaded twin): a z-order rewrite emits
            # files_per_bucket × buckets files and the serial footer
            # loop was a visible driver-side slice of every OPTIMIZE
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(8, len(rels))) as ex:
                results = list(ex.map(one, rels))
        else:
            results = [one(rel) for rel in rels]
        return {rel: per_col for rel, per_col in results if per_col is not None}

    def _commit_next(
        self,
        new_id: int,
        files: dict[str, list[str]],
        properties: dict[str, Any],
        summary: dict[str, Any],
        delta_buckets: list[int] | None = None,
    ) -> None:
        manifest = dict(self.manifest)
        live = {f for fl in files.values() for f in fl}
        merged_stats = {
            **self.manifest.get("file_stats", {}),
            **self._last_write_stats,
        }
        merged_col_stats = {
            **self.manifest.get("col_stats", {}),
            **self._last_write_col_stats,
        }
        manifest.update(
            {
                "snapshot_id": new_id,
                "parent_id": self.snapshot_id,
                "files": files,
                "properties": properties,
                "summary": summary,
                "delta_buckets": (
                    delta_buckets
                    if delta_buckets is not None
                    else list(self.manifest.get("delta_buckets", []))
                ),
                "file_stats": {f: s for f, s in merged_stats.items() if f in live},
                "col_stats": {
                    f: s for f, s in merged_col_stats.items() if f in live
                },
            }
        )
        self._commit(manifest)

    def _commit(self, manifest: dict[str, Any]) -> None:
        import time as _time

        t0 = _time.monotonic()
        snap_id = manifest["snapshot_id"]
        parent = manifest.get("parent_id")
        version_path = os.path.join(self.path, META_DIR, VERSION_FILE)
        snap_path = os.path.join(self.path, META_DIR, f"snap-{snap_id}.json")
        # Optimistic concurrency (single-table, Iceberg-style): creating
        # the snapshot file with O_EXCL is the atomic claim on this
        # snapshot id — exactly one writer can win it, so a stale writer
        # fails loudly instead of silently overwriting the winner's
        # manifest (lost update). Cheap-fail first on a visibly advanced
        # VERSION; the O_EXCL create closes the remaining race window.
        if parent is not None:
            try:
                with open(version_path) as f:
                    current = int(f.read().strip())
            except (OSError, ValueError):
                current = None
            if current is not None and current != parent:
                raise CommitConflictError(
                    f"table {self.path} is at snapshot {current}, not this "
                    f"writer's base {parent}: another writer committed first. "
                    "refresh() and re-run the merge (batch-id guard makes the "
                    "retry idempotent)."
                )
        try:
            fd = os.open(snap_path, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
        except FileExistsError:
            # Re-claim is ONLY for a crashed CREATE (snap-0 written,
            # VERSION never was — the table never became visible), and
            # only once the orphan manifest is demonstrably stale. A
            # LIVE concurrent CREATE sits in exactly this state between
            # its O_EXCL claim and its VERSION write; truncating its
            # snap-0 would silently lose its commit — the lost update
            # CommitConflictError exists to prevent. 60s is orders of
            # magnitude beyond the claim→VERSION window (two fsync'd
            # small writes).
            stale_create = False
            if snap_id == 0 and not os.path.exists(version_path):
                try:
                    stale_create = (_time.time() - os.path.getmtime(snap_path)) > 60.0
                except OSError:
                    stale_create = True  # claim vanished: prior loser cleaned up
            if stale_create:
                fd = os.open(snap_path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o644)
            elif snap_id == 0 and not os.path.exists(version_path):
                raise CommitConflictError(
                    f"snapshot 0 at {self.path} was claimed "
                    "<60s ago and VERSION does not exist yet: a concurrent "
                    "CREATE is in flight (or just crashed). Retry shortly — "
                    "a stale orphan claim becomes re-claimable after 60s."
                ) from None
            else:
                raise CommitConflictError(
                    f"snapshot {snap_id} already exists at {self.path}: a "
                    "concurrent writer won this commit (refresh() and re-run "
                    "the merge), or a crashed commit left a manifest ahead of "
                    "VERSION (fsck reports it; `check --repair` clears it)."
                ) from None
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        tmp = os.path.join(self.path, META_DIR, f".VERSION.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(snap_id))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.path, META_DIR, VERSION_FILE))
        self.manifest = manifest
        self.last_commit_ms = (_time.monotonic() - t0) * 1000

    def _read_manifest(self, snap_id: int) -> dict[str, Any]:
        with open(os.path.join(self.path, META_DIR, f"snap-{snap_id}.json")) as f:
            return json.load(f)
