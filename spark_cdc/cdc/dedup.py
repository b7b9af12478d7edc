"""Latest-version-per-key deduplication (SURVEY.md §2.5 W1).

The explicit re-implementation of ClickHouse
``ReplacingMergeTree(updated_at)`` keep-newest-per-key semantics
(/root/reference/etl/clickhouse_schema/init.sql:14,28), which the
reference exercised by inserting new versions on every update
(/root/reference/stream_etl/core/processor.py:253-256, 324-327).

Three physically different, semantically identical strategies
(equivalence is pinned in tests/test_dedup.py):

1. ``latest_version_per_key`` — window ``row_number``. The textbook
   form; one full shuffle on the key, NO map-side combine, so a hot
   key concentrates on one reducer. Kept because it is the
   SQL-expressible form the DuckDB oracle checks.
2. ``latest_version_per_key_agg`` — ``groupBy(key).agg(max_by(...))``.
   Hash aggregation gives partial map-side combine for free: a key
   with 10^6 duplicate updates is reduced to ≤1 row per map task
   before the exchange. The engine default.
3. ``latest_version_per_key_salted`` — explicit two-phase salt:
   ``groupBy(key, salt)`` then ``groupBy(key)``. Spells out the
   salted-shuffle pattern the north rule names; useful where a
   sort-based fallback would disable hash-agg partial combine
   (e.g. unspillable wide payloads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ORDER = ("ts", "op_seq", "lsn")


def _ord_cols(df: DataFrame, order_cols: tuple[str, ...]):
    return [F.col(c) for c in order_cols if c in df.columns]


def latest_version_per_key(
    df: DataFrame,
    keys: list[str],
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
) -> DataFrame:
    """Window row_number == 1 variant (W1; oracle-parity form)."""
    w = Window.partitionBy(*keys).orderBy(
        *[c.desc_nulls_last() for c in _ord_cols(df, order_cols)]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _winner_structs(df: DataFrame, keys: list[str], order_cols: tuple[str, ...]):
    payload = [c for c in df.columns if c not in keys]
    pay = F.struct(*[F.col(c).alias(c) for c in payload])
    ordc = _ord_cols(df, order_cols)
    ords = F.struct(*[c.alias(f"o{i}") for i, c in enumerate(ordc)])
    return payload, pay, ords


def latest_version_per_key_agg(
    df: DataFrame,
    keys: list[str],
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
) -> DataFrame:
    """max_by hash-aggregate variant (engine default, skew-resistant)."""
    payload, pay, ords = _winner_structs(df, keys, order_cols)
    return (
        df.groupBy(*keys)
        .agg(F.max_by(pay, ords).alias("_w"))
        .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )


def latest_version_per_key_max(
    df: DataFrame,
    keys: list[str],
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
) -> DataFrame:
    """``max(struct(ord..., payload))`` variant.

    ``max`` is a DeclarativeAggregate, so this compiles to a true
    HashAggregate (vs ``max_by``'s SortAggregate) while keeping the
    partial map-side combine. Order columns are null-coalesced and
    lead the struct; payload fields only break exact version ties
    (identical events → identical rows, so the tie choice is moot).
    """
    payload = [c for c in df.columns if c not in keys]
    ordc = [c for c in order_cols if c in df.columns]
    packed = F.struct(
        *[
            F.coalesce(F.col(c), _floor_lit(df, c)).alias(f"o{i}")
            for i, c in enumerate(ordc)
        ],
        *[F.col(c).alias(c) for c in payload],
    )
    return (
        df.groupBy(*keys)
        .agg(F.max(packed).alias("_w"))
        .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )


def _floor_lit(df: DataFrame, col_name: str):
    """Smallest sentinel for a column's type (nulls must lose)."""
    dt = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[col_name]
    if dt.startswith("timestamp"):
        return F.to_timestamp(F.lit("1900-01-01"))
    if dt in ("bigint", "int", "smallint", "tinyint"):
        return F.lit(-(2**62)).cast(dt)
    if dt in ("double", "float"):
        return F.lit(float("-1e300")).cast(dt)
    return F.lit("").cast(dt)


def latest_version_per_key_salted(
    df: DataFrame,
    keys: list[str],
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
    salt_buckets: int = 16,
) -> DataFrame:
    """Explicit two-phase salted dedup.

    Phase 1 partitions on ``(key, salt)`` — a hot key fans out over
    ``salt_buckets`` reducers; phase 2 reduces the ≤``salt_buckets``
    survivors per key. The salt is derived from the total-order column
    (lsn) so it is deterministic, not random (replay-stable).
    """
    payload, pay, ords = _winner_structs(df, keys, order_cols)
    salt_src = order_cols[-1] if order_cols[-1] in df.columns else keys[0]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt_buckets))
    )
    phase1 = (
        salted.groupBy(*keys, "_salt")
        .agg(F.max_by(pay, ords).alias("_w"))
        .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )
    return latest_version_per_key_agg(phase1, keys, order_cols)
