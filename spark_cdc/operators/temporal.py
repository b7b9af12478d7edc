"""Temporal joins: as-of (point-in-time) and interval-range joins.

Two operator families Spark's built-in join strategies don't express
directly, both central to CDC analytics over a versioned lake:

- :func:`asof_join` — for every left row, THE latest right row at or
  before it in event time (``direction="backward"``; ``"forward"`` is
  the mirror), optionally per key and within a tolerance. This is the
  "join each fact to the dimension version valid at its time" /
  "attach the conversation state a message saw" query — the batch twin
  of a stream-table temporal join, and the read-side complement of this
  repo's versioned :class:`~spark_cdc.lake.table.LakeTable` (time
  travel answers "the table as of T"; asof_join answers it per-row).
- :func:`range_join` — points joined to the intervals containing them
  (``p BETWEEN start AND end``), e.g. events into campaign flights or
  messages into session windows.
- :func:`interval_join` — interval×interval overlap pairs (touching
  endpoints inclusive), e.g. concurrent sessions or overlapping
  campaign flights; the same cell decomposition with a
  meet-exactly-once rule (the cell of ``greatest(starts)``), so no
  post-hoc distinct.

Naive renderings are non-starters at scale: an as-of join written as a
``θ``-join + per-left-row max explodes candidate pairs, and Catalyst
plans a plain range predicate as BroadcastNestedLoopJoin (or a
cartesian product). The Spark-first shapes here never enumerate
candidate pairs:

- ``asof_join`` is the UNION + ordered window-fill rendering: tag both
  sides, union them, and ``last(right_payload, ignorenulls=True)`` over
  ``(key) ORDER BY (time, side)`` — ONE hash shuffle of left+right on
  the key, zero join blow-up, whatever the time-skew between sides.
  With no key — or with ``bucket_keyed=True`` for hot-key inputs — it
  range-buckets time by quantiles (so the window is per (key, bucket),
  never single-partition and never one-partition-per-hot-key) and
  heals bucket boundaries with a fully distributed carry: per-bucket
  right-side tails, prefix-scanned by a window over the tiny per-key
  bucket spine — the same boundary-exchange idea as Flint's
  time-series joins, with no driver-side collect anywhere.
- ``range_join`` buckets time into fixed-width cells, explodes each
  interval into the cells it spans, and equi-joins points to cells —
  a plain shuffled hash join Catalyst/AQE can size, with the exact
  range predicate applied to the (bounded) collisions. Each matching
  (point, interval) pair meets in exactly one cell — the point's own —
  so no post-dedup is needed.

Both are pure JVM column expressions (no UDFs), so DuckDB reproduces
them exactly (``ASOF LEFT JOIN`` / a plain range predicate) — driver
oracle entry ``j_asof_latest_order`` + tests/test_temporal.py.

Reference parity note: the reference engine has no temporal join; this
family is part of the beyond-reference training-pipeline surface
(sessionization, transcript stitching and CDC replay all need
point-in-time attachment at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _to_double(c, dtype=None):
    """Orderable numeric view of a time column (timestamp → epoch
    seconds as double; numerics cast through). TIMESTAMP_NTZ and DATE
    refuse a direct double cast, so they route through TIMESTAMP —
    the session-timezone shift this applies is identical on both
    sides, so ordering, quantile cuts and time *differences*
    (tolerance) are unaffected."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def _payload_names(right_cols, left_cols, drop, suffix):
    """Output name per right payload column; collisions with ANY left
    column get ``suffix`` (then must be unique, or we fail loudly)."""
    names = {}
    taken = set(left_cols)
    for c in right_cols:
        if c in drop:
            continue
        out = c + suffix if c in taken else c
        if out in taken or out in names.values():
            raise ValueError(f"column collision on {out!r}; pass a different suffix")
        names[c] = out
    return names


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_on: str | None = None,
    right_by: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_right",
    keep_right_on: str | None = None,
    num_range_buckets: int = 64,
    bucket_keyed: bool = False,
) -> DataFrame:
    """Point-in-time left join: every ``left`` row gains the single
    ``right`` row that is latest-at-or-before it (``backward``) or
    earliest-at-or-after it (``forward``) on the ``on`` time column,
    matching ``by`` keys exactly. Unmatched left rows keep NULL right
    columns (left-join semantics, like DuckDB ``ASOF LEFT JOIN`` /
    ``pandas.merge_asof``).

    - ``right_on`` / ``right_by``: right-side column names when they
      differ from the left's (``merge_asof``'s naming).
    - ``tolerance``: maximum allowed time gap — native units for
      numeric ``on``, SECONDS for timestamps; matches farther away are
      nulled (the left row survives).
    - ``keep_right_on``: also emit the matched right time under this
      name (for audit/gap columns).
    - Ties: an equal-time right row IS eligible (inclusive, both
      directions). Multiple right rows tied on ``(by, on)`` resolve
      arbitrarily — pre-aggregate the right side to unique keys when
      determinism matters (same contract as DuckDB ASOF).

    Scale shape: one hash shuffle of left ∪ right on ``by`` (the
    window's partitioning); cost is O((|L|+|R|) log within-key) with
    NO candidate-pair blow-up however mismatched the sides' sizes or
    time densities. Per-key history window-sorts within its partition
    — the same per-key bound as sessionization, fine for typical
    conversation/user/campaign keys; for Zipf-hot keys (one
    conversation = 10% of all rows) pass ``bucket_keyed=True`` to
    sub-partition every key by ``num_range_buckets`` quantile
    time-cells, bounding any single sort to |key|/buckets. Without
    ``by`` the same bucketed path engages automatically (never a
    single-partition global window). Bucket boundaries are healed
    distributively: the per-(key, bucket) right-side tail aggregate is
    prefix-scanned by a ``max_by``/``min_by`` window over the bucket
    spine (≤ ``num_range_buckets`` rows per key) and joined back on
    (key, bucket) — no driver-side collect, and the join side is
    spine-sized, not data-sized.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    lb = list(by or [])
    rb = list(right_by or lb)
    ron = right_on or on
    if len(lb) != len(rb):
        raise ValueError("by and right_by must have the same length")
    if on not in left.columns or ron not in right.columns:
        raise ValueError(f"missing time column {on!r}/{ron!r}")
    names = _payload_names(right.columns, left.columns, set(rb) | {ron}, suffix)
    if keep_right_on:
        if keep_right_on in left.columns or keep_right_on in names.values():
            raise ValueError(f"keep_right_on name {keep_right_on!r} collides")

    on_dt = left.schema[on].dataType
    ron_dt = right.schema[ron].dataType

    fill = F.struct(
        F.col(ron).alias("_on"), *[F.col(c).alias(o) for c, o in names.items()]
    ).alias("_asof_fill")
    fill_type = right.select(fill).schema["_asof_fill"].dataType
    lpay = [c for c in left.columns if c not in lb and c != on]

    r_side = right.select(
        *[F.col(r).alias(l) for r, l in zip(rb, lb)],
        F.col(ron).alias("_asof_on"),
        F.lit(1).alias("_asof_r"),
        fill,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
    )
    l_side = left.select(
        *lb,
        F.col(on).alias("_asof_on"),
        F.lit(0).alias("_asof_r"),
        F.lit(None).cast(fill_type).alias("_asof_fill"),
        *lpay,
    )
    u = l_side.unionByName(r_side)

    backward = direction == "backward"
    # at equal time the right row must sort BEFORE the left row so the
    # inclusive match is visible to the running last(); hence _asof_r
    # descending under both scan directions
    order = [
        F.col("_asof_on").asc() if backward else F.col("_asof_on").desc(),
        F.col("_asof_r").desc(),
    ]

    part_cols = list(lb)
    carry = None
    if not lb or bucket_keyed:
        # quantile range-buckets keep every window partition bounded
        # by |data|/buckets — required when there is no key, opt-in
        # (bucket_keyed) when keys are Zipf-hot. Cuts come from a
        # throwaway skinny union of both sides' times (one bounded
        # approxQuantile job, materialized immediately).
        cuts = (
            left.select(_to_double(F.col(on), on_dt).alias("_q"))
            .unionByName(right.select(_to_double(F.col(ron), ron_dt).alias("_q")))
            .na.drop()
            .approxQuantile("_q", [i / num_range_buckets for i in range(1, num_range_buckets)], 0.01)
        )
        cuts = sorted(set(cuts))

        def _bucket_of(c):
            # bucket = count of cuts <= t, as a lambda-free sum of
            # indicators (<= 63 adds). Deliberately NOT the
            # size(filter(array, lambda)) HOF: a lambda-bearing
            # projection pushed into a union child makes Catalyst's
            # alias-equality constraints mis-scope their references,
            # and any later join over the union dies in
            # UnionBase.rewriteConstraints (NoSuchElementException)
            # under PruneFilters.
            out = F.lit(0)
            for x in cuts:
                out = out + F.when(c >= F.lit(x), 1).otherwise(0)
            return out

        u = u.withColumn("_asof_b", _bucket_of(_to_double(F.col("_asof_on"), on_dt)))
        part_cols = lb + ["_asof_b"]
        n_buckets = len(cuts) + 1
        # distributed boundary heal: buckets partition time into
        # strictly increasing ranges, so "the match carried into
        # bucket b from outside it" is the per-(key, earlier-bucket)
        # right-side tail with the greatest time (backward; least,
        # forward). Tails aggregate the RIGHT side alone — a lineage
        # deliberately independent of the union ``u`` (self-joining a
        # filtered union of parquet sources trips a Catalyst
        # Union-constraint-rewrite NoSuchElementException under
        # PruneFilters). The bucket domain is a dense integer range
        # known on the driver, so the spine is keys-with-tails ×
        # sequence(0, n_buckets) — empty buckets included, letting one
        # max_by/min_by window prefix-scan carries across them. The
        # window sorts spines (<= num_range_buckets rows per key),
        # never data; the carry join side is spine-sized.
        agg = F.max_by if backward else F.min_by
        ext = F.max if backward else F.min
        r_t = _to_double(F.col(ron), ron_dt)
        tails = (
            right.select(
                *[F.col(r).alias(l) for r, l in zip(rb, lb)],
                _bucket_of(r_t).alias("_asof_b"),
                r_t.alias("_rt"),
                fill,
            )
            .groupBy(*part_cols)
            .agg(agg("_asof_fill", F.col("_rt")).alias("_f"), ext("_rt").alias("_fo"))
        )
        dense = F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("_asof_b")
        if lb:
            spine = tails.select(*lb).distinct().select(*lb, dense)
        else:
            spine = right.sparkSession.range(1).select(dense)
        spine = spine.join(tails, part_cols, "left")
        if backward:
            wc = (
                Window.partitionBy(*lb)
                .orderBy(F.col("_asof_b").asc())
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            best = F.max_by("_f", "_fo").over(wc)
        else:
            wc = (
                Window.partitionBy(*lb)
                .orderBy(F.col("_asof_b").asc())
                .rowsBetween(1, Window.unboundedFollowing)
            )
            best = F.min_by("_f", "_fo").over(wc)
        carry = spine.select(*part_cols, best.alias("_asof_carry"))
        if not lb:
            # unkeyed spine is <= num_range_buckets rows total
            carry = F.broadcast(carry)

    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    res = u.withColumn("_m", F.last("_asof_fill", ignorenulls=True).over(w)).where(
        F.col("_asof_r") == 0
    )
    if carry is not None:
        res = res.join(carry, part_cols, "left").withColumn(
            "_m", F.coalesce("_m", "_asof_carry")
        )
    if tolerance is not None:
        gap = (
            _to_double(F.col("_asof_on"), on_dt) - _to_double(F.col("_m._on"), ron_dt)
            if backward
            else _to_double(F.col("_m._on"), ron_dt) - _to_double(F.col("_asof_on"), on_dt)
        )
        res = res.withColumn("_m", F.when(gap <= F.lit(float(tolerance)), F.col("_m")))

    out = [
        F.col("_asof_on").alias(on) if c == on else F.col(c) for c in left.columns
    ]
    out += [F.col(f"_m.{o}").alias(o) for o in names.values()]
    if keep_right_on:
        out.append(F.col("_m._on").alias(keep_right_on))
    return res.select(*out)


def _cell_seq(s_d, e_d, wdt: float, max_cells: int, who: str):
    """Array of the time-cell indices an interval [s, e] spans, with a
    loud guard (instead of a silent 10^6-cell explode) on any single
    interval spanning >= ``max_cells`` cells."""
    span = F.floor(e_d / wdt) - F.floor(s_d / wdt)
    return F.when(
        span < F.lit(max_cells),
        F.sequence(
            F.floor(s_d / wdt).cast("long"), F.floor(e_d / wdt).cast("long")
        ),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"{who}: interval spans >= {max_cells} cells at "
                    f"bucket_width={wdt!r}; widen bucket_width"
                )
            )
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    start: str,
    end: str,
    by: list[str] | None = None,
    right_by: list[str] | None = None,
    how: str = "inner",
    point_keys: list[str] | None = None,
    bucket_width: float | None = None,
    max_cells_per_interval: int = 4096,
    suffix: str = "_right",
) -> DataFrame:
    """Join each point row to every interval containing it:
    ``points.on BETWEEN intervals.start AND intervals.end`` (inclusive
    both ends), plus exact ``by``-key equality. Output = points columns
    + interval payload (collisions suffixed).

    Instead of the range predicate Catalyst can only nested-loop, time
    is cut into ``bucket_width`` cells (default: the median interval
    length, ONE bounded ``approxQuantile`` job — cells sized so a
    typical interval spans ~2 cells): intervals explode into the cells
    they span, points map to their single cell, and the match is a
    plain equi-join on ``(by, cell)`` + the exact predicate on the
    collisions. Join fan-in per cell is data-bounded and AQE-splittable;
    an interval spanning more than ``max_cells_per_interval`` cells
    fails loudly (pick a wider ``bucket_width``) rather than silently
    exploding rows.

    ``how="left"`` keeps pointless points (NULL interval columns) and
    needs ``point_keys`` — a unique key of ``points`` — to anti-join
    the unmatched back in exactly once.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left, got {how!r}")
    if how == "left" and not point_keys:
        raise ValueError("how='left' needs point_keys (a unique key of points)")
    lb = list(by or [])
    rb = list(right_by or lb)
    if len(lb) != len(rb):
        raise ValueError("by and right_by must have the same length")
    names = _payload_names(
        intervals.columns, points.columns, set(rb), suffix
    )  # start/end kept as payload (renamed on collision)

    s_dt = intervals.schema[start].dataType
    e_dt = intervals.schema[end].dataType
    on_dt = points.schema[on].dataType
    s_d, e_d = _to_double(F.col(start), s_dt), _to_double(F.col(end), e_dt)
    if bucket_width is None:
        med, longest = intervals.select((e_d - s_d).alias("_len")).na.drop().approxQuantile(
            "_len", [0.5, 1.0], 0.01
        ) or [1.0, 1.0]
        # the longest-interval floor keeps a 2x margin under the cell
        # guard: at width=longest/max_cells the longest interval spans
        # exactly max_cells cells (floor alignment) and trips it
        bucket_width = max(
            float(med), 2.0 * float(longest) / max_cells_per_interval, 1e-9
        )
    wdt = float(bucket_width)

    ivals = intervals.select(
        *[F.col(r).alias(l) for r, l in zip(rb, lb)],
        F.col(start).alias("_rj_s"),
        F.col(end).alias("_rj_e"),
        F.struct(*[F.col(c).alias(o) for c, o in names.items()]).alias("_rj_pay"),
    ).where(F.col("_rj_s") <= F.col("_rj_e"))
    # loud guard instead of a silent 10^6-cell explode on one bad row
    ivals = ivals.withColumn(
        "_rj_cell",
        F.explode(
            _cell_seq(
                _to_double(F.col("_rj_s"), s_dt),
                _to_double(F.col("_rj_e"), e_dt),
                wdt,
                max_cells_per_interval,
                "range_join",
            )
        ),
    )

    pts = points.withColumn(
        "_rj_cell", F.floor(_to_double(F.col(on), on_dt) / wdt).cast("long")
    )
    matched = (
        pts.join(ivals, lb + ["_rj_cell"])
        .where((F.col(on) >= F.col("_rj_s")) & (F.col(on) <= F.col("_rj_e")))
        .select(
            *points.columns,
            *[F.col(f"_rj_pay.{o}").alias(o) for o in names.values()],
        )
    )
    if how == "inner":
        return matched
    unmatched = points.join(
        matched.select(*point_keys).distinct(), point_keys, "left_anti"
    ).select(
        *points.columns,
        *[
            F.lit(None).cast(matched.schema[o].dataType).alias(o)
            for o in names.values()
        ],
    )
    return matched.unionByName(unmatched)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: list[str] | None = None,
    right_by: list[str] | None = None,
    how: str = "inner",
    left_keys: list[str] | None = None,
    bucket_width: float | None = None,
    max_cells_per_interval: int = 4096,
    suffix: str = "_right",
) -> DataFrame:
    """Interval-overlap join: every (left, right) interval pair that
    overlaps — ``left_start <= right_end AND right_start <= left_end``,
    inclusive both ends (touching endpoints DO match) — plus exact
    ``by``-key equality. Output = left columns + right payload
    (collisions suffixed). The interval×interval completion of
    :func:`range_join`'s point×interval: concurrent-session analysis,
    overlapping campaign flights, conversation-window collisions.

    Same cell decomposition (Catalyst would nested-loop the raw
    overlap predicate): BOTH sides explode into the ``bucket_width``
    time-cells they span (width defaults to the median interval length
    over the two sides — one bounded ``approxQuantile`` job) and
    equi-join on ``(by, cell)``. An overlapping pair shares every cell
    of its overlap, so the exact predicate is paired with a
    dedup-by-construction rule: the pair is emitted only in the cell
    containing ``greatest(left_start, right_start)`` — the overlap's
    first instant, which lies in both sides' cell ranges exactly once.
    No post-hoc ``distinct`` over the (potentially wide) output.

    Scale shape: output-bounded plus ~2 cells per interval of explode
    at the default width; per-cell fan-in is data-bounded and
    AQE-splittable; one pathological interval fails the
    ``max_cells_per_interval`` guard loudly. ``how="left"`` keeps
    overlap-less left intervals (NULL right columns) and needs
    ``left_keys`` — a unique key of ``left``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left, got {how!r}")
    if how == "left" and not left_keys:
        raise ValueError("how='left' needs left_keys (a unique key of left)")
    lb = list(by or [])
    rb = list(right_by or lb)
    if len(lb) != len(rb):
        raise ValueError("by and right_by must have the same length")
    names = _payload_names(right.columns, left.columns, set(rb), suffix)

    ls_dt = left.schema[left_start].dataType
    le_dt = left.schema[left_end].dataType
    rs_dt = right.schema[right_start].dataType
    re_dt = right.schema[right_end].dataType
    ls_d = _to_double(F.col(left_start), ls_dt)
    le_d = _to_double(F.col(left_end), le_dt)
    if bucket_width is None:
        # throwaway skinny union: lengths from both sides feed ONE
        # bounded approxQuantile job, materialized immediately (never
        # part of the join plan)
        lens = left.select((le_d - ls_d).alias("_len")).unionByName(
            right.select(
                (
                    _to_double(F.col(right_end), re_dt)
                    - _to_double(F.col(right_start), rs_dt)
                ).alias("_len")
            )
        )
        med, longest = lens.na.drop().approxQuantile("_len", [0.5, 1.0], 0.01) or [
            1.0,
            1.0,
        ]
        bucket_width = max(
            float(med), 2.0 * float(longest) / max_cells_per_interval, 1e-9
        )
    wdt = float(bucket_width)

    l_exp = left.where(F.col(left_start) <= F.col(left_end)).withColumn(
        "_ij_cell", F.explode(_cell_seq(ls_d, le_d, wdt, max_cells_per_interval, "interval_join"))
    )
    r_exp = (
        right.select(
            *[F.col(r).alias(l) for r, l in zip(rb, lb)],
            F.col(right_start).alias("_ij_s"),
            F.col(right_end).alias("_ij_e"),
            F.struct(*[F.col(c).alias(o) for c, o in names.items()]).alias("_ij_pay"),
        )
        .where(F.col("_ij_s") <= F.col("_ij_e"))
        .withColumn(
            "_ij_cell",
            F.explode(
                _cell_seq(
                    _to_double(F.col("_ij_s"), rs_dt),
                    _to_double(F.col("_ij_e"), re_dt),
                    wdt,
                    max_cells_per_interval,
                    "interval_join",
                )
            ),
        )
    )
    overlap = (F.col(left_start) <= F.col("_ij_e")) & (F.col("_ij_s") <= F.col(left_end))
    meet_once = (
        F.floor(
            F.greatest(ls_d, _to_double(F.col("_ij_s"), rs_dt)) / wdt
        ).cast("long")
        == F.col("_ij_cell")
    )
    matched = (
        l_exp.join(r_exp, lb + ["_ij_cell"])
        .where(overlap & meet_once)
        .select(
            *left.columns,
            *[F.col(f"_ij_pay.{o}").alias(o) for o in names.values()],
        )
    )
    if how == "inner":
        return matched
    unmatched = left.join(
        matched.select(*left_keys).distinct(), left_keys, "left_anti"
    ).select(
        *left.columns,
        *[
            F.lit(None).cast(matched.schema[o].dataType).alias(o)
            for o in names.values()
        ],
    )
    return matched.unionByName(unmatched)
