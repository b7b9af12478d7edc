"""asof_join / range_join correctness vs DuckDB oracles + scale-shape
plan asserts.

DuckDB's ``ASOF LEFT JOIN`` is a native engine implementation of the
same semantics (inclusive match, left rows survive unmatched), so the
oracle here is a second independent engine — not a reimplementation.
The plan asserts pin the scale story: the keyed as-of plan contains NO
join operator at all (union + window fill, one hash shuffle), and the
range join never degenerates into BroadcastNestedLoopJoin /
CartesianProduct (the plan Catalyst picks for a raw range predicate).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_cdc.operators.temporal import asof_join, range_join

# -- fixtures: deterministic, with exact-tie times, unmatched keys, ----
# -- and payload-name collisions ---------------------------------------

LEFT = [
    # (id, k, t, v)  — v collides with a right column name
    (1, "a", 10.0, "l1"),
    (2, "a", 15.0, "l2"),
    (3, "a", 20.0, "l3"),   # exact tie with right (a, 20.0)
    (4, "a", 3.0, "l4"),    # before any right row for key a
    (5, "b", 7.0, "l5"),
    (6, "b", 100.0, "l6"),
    (7, "c", 50.0, "l7"),   # key with no right rows at all
    (8, "b", 5.0, "l8"),    # exact tie with right (b, 5.0)
]
RIGHT = [
    # (k, rt, v, w) — unique per (k, rt) so ties resolve the same way
    ("a", 5.0, 101, 1.5),
    ("a", 12.0, 102, 2.5),
    ("a", 20.0, 103, 3.5),
    ("b", 5.0, 201, 4.5),
    ("b", 30.0, 202, 5.5),
    ("d", 1.0, 301, 6.5),   # right-only key
]


def _dfs(spark):
    l = spark.createDataFrame(LEFT, "id int, k string, t double, v string")
    r = spark.createDataFrame(RIGHT, "k string, rt double, v int, w double")
    return l, r


def _duck():
    con = duckdb.connect()
    con.register("l", pd.DataFrame(LEFT, columns=["id", "k", "t", "v"]))
    con.register("r", pd.DataFrame(RIGHT, columns=["k", "rt", "v", "w"]))
    return con


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _duck_rows(con, sql, cols):
    cur = con.execute(sql)
    idx = {d[0]: i for i, d in enumerate(cur.description)}
    return sorted(tuple(r[idx[c]] for c in cols) for r in cur.fetchall())


COLS = ["id", "k", "t", "v", "v_right", "w"]


def test_asof_keyed_backward_matches_duckdb(spark):
    l, r = _dfs(spark)
    got = asof_join(l, r, on="t", by=["k"], right_on="rt")
    assert sorted(got.columns) == sorted(COLS)
    want = _duck_rows(
        _duck(),
        """SELECT l.id, l.k, l.t, l.v, r.v AS v_right, r.w
           FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.rt""",
        COLS,
    )
    assert _rows(got, COLS) == want


def test_asof_keyed_forward_matches_duckdb(spark):
    l, r = _dfs(spark)
    got = asof_join(l, r, on="t", by=["k"], right_on="rt", direction="forward")
    want = _duck_rows(
        _duck(),
        """SELECT l.id, l.k, l.t, l.v, r.v AS v_right, r.w
           FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t <= r.rt""",
        COLS,
    )
    assert _rows(got, COLS) == want


def test_asof_tolerance_nulls_far_matches(spark):
    l, r = _dfs(spark)
    got = asof_join(l, r, on="t", by=["k"], right_on="rt", tolerance=3.0)
    # oracle: plain ASOF then null out matches farther than 3.0
    want = _duck_rows(
        _duck(),
        """SELECT l.id, l.k, l.t, l.v,
                  CASE WHEN l.t - r.rt <= 3.0 THEN r.v END AS v_right,
                  CASE WHEN l.t - r.rt <= 3.0 THEN r.w END AS w
           FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.rt""",
        COLS,
    )
    assert _rows(got, COLS) == want


def test_asof_keep_right_on_gap_column(spark):
    l, r = _dfs(spark)
    got = asof_join(l, r, on="t", by=["k"], right_on="rt", keep_right_on="matched_t")
    by_id = {r["id"]: r for r in got.collect()}
    assert by_id[3]["matched_t"] == 20.0  # inclusive tie
    assert by_id[4]["matched_t"] is None
    assert by_id[6]["matched_t"] == 30.0


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_unkeyed_bucketed_matches_duckdb(spark, direction):
    # 200 left points spread over [0, 1000); right rows clustered in
    # [0, 100) only — with 16 range buckets most buckets hold no right
    # row, so the boundary-carry path does all the work (backward);
    # forward exercises the reverse scan where most lefts are unmatched
    lrows = [(i, float(i * 5 + (i % 3)), "x") for i in range(200)]
    rrows = [(float(j * 7), 1000 + j) for j in range(15)]  # 0..98
    l = spark.createDataFrame(lrows, "id int, t double, tag string")
    r = spark.createDataFrame(rrows, "rt double, rv int")
    got = asof_join(l, r, on="t", right_on="rt", direction=direction,
                    num_range_buckets=16)
    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows, columns=["id", "t", "tag"]))
    con.register("r", pd.DataFrame(rrows, columns=["rt", "rv"]))
    op = ">=" if direction == "backward" else "<="
    cols = ["id", "t", "tag", "rv"]
    want = _duck_rows(
        con, f"SELECT l.id, l.t, l.tag, r.rv FROM l ASOF LEFT JOIN r ON l.t {op} r.rt", cols
    )
    assert _rows(got, cols) == want


def test_asof_empty_right_side(spark):
    l, r = _dfs(spark)
    empty = r.where(F.lit(False))
    got = asof_join(l, empty, on="t", by=["k"], right_on="rt")
    rows = got.collect()
    assert len(rows) == len(LEFT)
    assert all(r["v_right"] is None and r["w"] is None for r in rows)
    # unkeyed path with an empty right side must also survive
    got2 = asof_join(l.drop("k"), empty.drop("k"), on="t", right_on="rt")
    assert all(r["w"] is None for r in got2.collect())


def test_asof_keyed_plan_has_no_join(spark):
    # the whole point: ONE hash shuffle (union + window), zero join
    # operators, zero candidate-pair blow-up
    l, r = _dfs(spark)
    got = asof_join(l, r, on="t", by=["k"], right_on="rt")
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_asof_collision_without_resolution_raises(spark):
    l, r = _dfs(spark)
    r2 = r.withColumn("v_right", F.lit(1))  # suffix target now taken
    with pytest.raises(ValueError, match="collision"):
        asof_join(l, r2, on="t", by=["k"], right_on="rt")


# -- range join --------------------------------------------------------

POINTS = [
    (1, "a", 5.0),
    (2, "a", 15.0),
    (3, "a", 30.0),   # inside two overlapping intervals
    (4, "b", 8.0),
    (5, "b", 200.0),  # matches nothing
    (6, "c", 1.0),    # key with no intervals
]
IVALS = [
    # (k, s, e, tag)
    ("a", 0.0, 10.0, "i1"),
    ("a", 12.0, 35.0, "i2"),
    ("a", 28.0, 40.0, "i3"),
    ("a", 50.0, 42.0, "inverted"),  # s > e: dropped
    ("b", 5.0, 8.0, "i4"),          # inclusive end: point 4 matches
]

RJ_SQL = """SELECT p.id, p.k, p.t, i.s, i.e, i.tag
            FROM p {how} JOIN i ON p.k = i.k AND p.t >= i.s AND p.t <= i.e"""


def _rj_dfs(spark):
    p = spark.createDataFrame(POINTS, "id int, k string, t double")
    i = spark.createDataFrame(IVALS, "k string, s double, e double, tag string")
    return p, i


def _rj_duck():
    con = duckdb.connect()
    con.register("p", pd.DataFrame(POINTS, columns=["id", "k", "t"]))
    con.register("i", pd.DataFrame(IVALS, columns=["k", "s", "e", "tag"]))
    return con


@pytest.mark.parametrize("width", [None, 3.0, 1000.0])
def test_range_join_inner_matches_sql(spark, width):
    p, i = _rj_dfs(spark)
    got = range_join(p, i, on="t", start="s", end="e", by=["k"], bucket_width=width)
    cols = ["id", "k", "t", "s", "e", "tag"]
    want = _duck_rows(_rj_duck(), RJ_SQL.format(how=""), cols)
    assert _rows(got, cols) == want


def test_range_join_left_keeps_unmatched_once(spark):
    p, i = _rj_dfs(spark)
    got = range_join(
        p, i, on="t", start="s", end="e", by=["k"], how="left", point_keys=["id"]
    )
    cols = ["id", "k", "t", "s", "e", "tag"]
    want = _duck_rows(_rj_duck(), RJ_SQL.format(how="LEFT"), cols)
    assert _rows(got, cols) == want


def test_range_join_cell_guard_fails_loudly(spark):
    p, i = _rj_dfs(spark)
    j = range_join(
        p, i, on="t", start="s", end="e", by=["k"],
        bucket_width=0.001, max_cells_per_interval=100,
    )
    with pytest.raises(Exception, match="widen bucket_width"):
        j.collect()


def test_range_join_plan_has_no_nested_loop(spark):
    p, i = _rj_dfs(spark)
    got = range_join(p, i, on="t", start="s", end="e", by=["k"])
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_range_join_timestamp_points(spark):
    # timestamp time columns go through the epoch-seconds cast path
    p = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30"), (2, "2024-01-01 02:00:00")],
        "id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    i = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 01:00:00", "w1")],
        "s string, e string, tag string",
    ).select(
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
        "tag",
    )
    got = range_join(p, i, on="ts", start="s", end="e")
    rows = {r["id"]: r["tag"] for r in got.collect()}
    assert rows == {1: "w1"}


# -- property-based: ANY log vs DuckDB ---------------------------------
#
# tiny key/time spaces maximize ties (left rows at exactly a right
# row's time), empty-side and all-unmatched cases; the right side is
# generated as a dict keyed on (k, t) so rows are unique per key+time
# and tie resolution is deterministic on both engines

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_keys = st.sampled_from(["a", "b"])
_times = st.integers(0, 8).map(float)

_left_rows = st.lists(st.tuples(_keys, _times), min_size=0, max_size=14)
_right_rows = st.dictionaries(
    st.tuples(_keys, _times), st.integers(0, 99), min_size=0, max_size=10
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    lrows=_left_rows,
    rrows=_right_rows,
    direction=st.sampled_from(["backward", "forward"]),
    tolerance=st.sampled_from([None, 2.0]),
    bucketed=st.booleans(),
)
def test_asof_property_any_log_matches_duckdb(
    spark, lrows, rrows, direction, tolerance, bucketed
):
    lrows = [(i, k, t) for i, (k, t) in enumerate(lrows)]
    rrows = [(k, t, v) for (k, t), v in sorted(rrows.items())]
    l = spark.createDataFrame(lrows, "id int, k string, t double")
    r = spark.createDataFrame(rrows, "k string, rt double, rv int")
    got = asof_join(l, r, on="t", by=["k"], right_on="rt",
                    direction=direction, tolerance=tolerance,
                    bucket_keyed=bucketed, num_range_buckets=4)
    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows, columns=["id", "k", "t"]))
    con.register("r", pd.DataFrame(rrows, columns=["k", "rt", "rv"]))
    op, gap = (">=", "l.t - r.rt") if direction == "backward" else ("<=", "r.rt - l.t")
    guard = f"CASE WHEN {gap} <= {tolerance} THEN r.rv END" if tolerance else "r.rv"
    cols = ["id", "k", "t", "rv"]
    want = _duck_rows(
        con,
        f"SELECT l.id, l.k, l.t, {guard} AS rv"
        f" FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t {op} r.rt",
        cols,
    )
    assert _rows(got, cols) == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    prows=_left_rows,
    irows=st.dictionaries(
        st.tuples(_keys, _times, _times), st.integers(0, 99), min_size=0, max_size=8
    ),
    width=st.sampled_from([None, 0.5, 3.0]),
    how=st.sampled_from(["inner", "left"]),
)
def test_range_join_property_any_log_matches_sql(spark, prows, irows, width, how):
    prows = [(i, k, t) for i, (k, t) in enumerate(prows)]
    irows = [(k, s, e, v) for (k, s, e), v in sorted(irows.items())]
    p = spark.createDataFrame(prows, "id int, k string, t double")
    i = spark.createDataFrame(irows, "k string, s double, e double, tag int")
    got = range_join(p, i, on="t", start="s", end="e", by=["k"], how=how,
                     point_keys=["id"] if how == "left" else None,
                     bucket_width=width)
    con = duckdb.connect()
    con.register("p", pd.DataFrame(prows, columns=["id", "k", "t"]))
    con.register("i", pd.DataFrame(irows, columns=["k", "s", "e", "tag"]))
    cols = ["id", "k", "t", "s", "e", "tag"]
    sql_how = "" if how == "inner" else "LEFT"
    want = _duck_rows(
        con,
        f"SELECT p.id, p.k, p.t, i.s, i.e, i.tag FROM p {sql_how} JOIN i"
        " ON p.k = i.k AND p.t >= i.s AND p.t <= i.e",
        cols,
    )
    assert _rows(got, cols) == want


def test_range_join_auto_width_zero_median(spark):
    # regression (hypothesis-found): with median interval length 0 the
    # auto width fell back to longest/max_cells, making the longest
    # interval span exactly max_cells cells and trip its own guard
    p = spark.createDataFrame([(1, "a", 0.0)], "id int, k string, t double")
    i = spark.createDataFrame(
        [("a", 0.0, 0.0, "z"), ("a", 0.0, 1.0, "w")],
        "k string, s double, e double, tag string",
    )
    got = range_join(p, i, on="t", start="s", end="e", by=["k"])
    assert sorted(r["tag"] for r in got.collect()) == ["w", "z"]


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_bucket_keyed_hot_key_matches_plain_and_duckdb(spark, direction):
    # Zipf-hot fixture: one key holds ~90% of both sides. bucket_keyed
    # sub-partitions that key's window into quantile time-cells; output
    # must equal the plain keyed path AND DuckDB exactly
    lrows = [(i, "hot", float(i % 97) + 0.5) for i in range(270)] + [
        (1000 + i, "cold", float(i * 3)) for i in range(30)
    ]
    rrows = [("hot", float(j * 2), j) for j in range(50)] + [
        ("cold", float(j * 11), 100 + j) for j in range(5)
    ]
    l = spark.createDataFrame(lrows, "id int, k string, t double")
    r = spark.createDataFrame(rrows, "k string, rt double, rv int")
    cols = ["id", "k", "t", "rv"]
    got = asof_join(l, r, on="t", by=["k"], right_on="rt", direction=direction,
                    bucket_keyed=True, num_range_buckets=8)
    plain = asof_join(l, r, on="t", by=["k"], right_on="rt", direction=direction)
    assert _rows(got, cols) == _rows(plain, cols)
    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows, columns=["id", "k", "t"]))
    con.register("r", pd.DataFrame(rrows, columns=["k", "rt", "rv"]))
    op = ">=" if direction == "backward" else "<="
    want = _duck_rows(
        con,
        f"SELECT l.id, l.k, l.t, r.rv FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t {op} r.rt",
        cols,
    )
    assert _rows(got, cols) == want


def test_asof_bucketed_plan_is_collect_free_and_bounded(spark):
    # the bucketed path must not degenerate: no cartesian/nested-loop,
    # and its only join is the spine-sized carry join
    l = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id int, t double"
    )
    r = spark.createDataFrame(
        [(float(j * 7), j) for j in range(20)], "rt double, rv int"
    )
    got = asof_join(l, r, on="t", right_on="rt", num_range_buckets=8)
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_asof_timestamp_ntz_bucketed_and_tolerance(spark):
    # regression: TIMESTAMP_NTZ (what parquet testdata reads as) has no
    # direct double cast — the bucketed and tolerance paths must route
    # through TIMESTAMP; a 90-minute tolerance keeps only event 1
    l = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00"), (2, "2024-01-03 00:00:00")],
        "id int, ts string",
    ).select("id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    r = spark.createDataFrame(
        [("2024-01-01 00:00:00", 7)], "rt string, rv int"
    ).select(F.col("rt").cast("timestamp_ntz").alias("rt"), "rv")
    got = asof_join(l, r, on="ts", right_on="rt", num_range_buckets=4)
    assert {x["id"]: x["rv"] for x in got.collect()} == {1: 7, 2: 7}
    tol = asof_join(l, r, on="ts", right_on="rt", tolerance=5400.0,
                    num_range_buckets=4)
    assert {x["id"]: x["rv"] for x in tol.collect()} == {1: 7, 2: None}


def test_asof_bucketed_parquet_sources_with_agg_right(spark, tmp_path):
    # regression: parquet-backed inputs + an aggregated right side +
    # the carry join used to die in Catalyst's
    # UnionBase.rewriteConstraints (NoSuchElementException under
    # PruneFilters) when the bucket column was a lambda HOF pushed
    # into the union children; the lambda-free bucket expression and
    # union-free carry lineage must keep this shape working
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(LEFT, "id int, k string, t double, v string").write.parquet(lp)
    spark.createDataFrame(RIGHT, "k string, rt double, v int, w double").write.parquet(rp)
    l = spark.read.parquet(lp)
    r = (
        spark.read.parquet(rp)
        .groupBy("k", "rt")
        .agg(F.max("v").alias("v"), F.max("w").alias("w"))
    )
    got = asof_join(l, r, on="t", by=["k"], right_on="rt",
                    bucket_keyed=True, num_range_buckets=4)
    want = _duck_rows(
        _duck(),
        """SELECT l.id, l.k, l.t, l.v, r.v AS v_right, r.w
           FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.rt""",
        COLS,
    )
    assert _rows(got, COLS) == want


# -- interval overlap join ---------------------------------------------

from spark_cdc.operators.temporal import interval_join

L_IV = [
    # (id, k, s, e)
    (1, "a", 0.0, 10.0),
    (2, "a", 10.0, 10.0),   # zero-length, touching i1's end
    (3, "a", 50.0, 60.0),   # overlaps nothing
    (4, "b", 5.0, 25.0),    # spans two right intervals
    (5, "b", 30.0, 20.0),   # inverted: dropped (matches nothing)
    (6, "c", 0.0, 99.0),    # key with no right intervals
]
R_IV = [
    # (k, s2, e2, tag)
    ("a", 8.0, 12.0, "r1"),    # overlaps 1 and 2
    ("a", 10.0, 10.0, "r2"),   # zero-length at the touch point
    ("b", 0.0, 6.0, "r3"),
    ("b", 25.0, 40.0, "r4"),   # touches 4's end inclusively
    ("b", 26.0, 24.0, "bad"),  # inverted: dropped
]

# validity (non-inverted) lives in the ON clause: inverted intervals
# never match, yet inverted LEFT rows still surface under LEFT JOIN —
# exactly the engine's contract
IJ_SQL = """SELECT l.id, l.k, l.s, l.e, r.s2, r.e2, r.tag
            FROM l {how} JOIN r ON l.k = r.k AND l.s <= r.e2 AND r.s2 <= l.e
                               AND l.s <= l.e AND r.s2 <= r.e2"""
IJ_COLS = ["id", "k", "s", "e", "s2", "e2", "tag"]


def _ij_dfs(spark):
    l = spark.createDataFrame(L_IV, "id int, k string, s double, e double")
    r = spark.createDataFrame(R_IV, "k string, s2 double, e2 double, tag string")
    return l, r


def _ij_duck():
    con = duckdb.connect()
    con.register("l", pd.DataFrame(L_IV, columns=["id", "k", "s", "e"]))
    con.register("r", pd.DataFrame(R_IV, columns=["k", "s2", "e2", "tag"]))
    return con


@pytest.mark.parametrize("width", [None, 2.0, 500.0])
def test_interval_join_inner_matches_sql(spark, width):
    l, r = _ij_dfs(spark)
    got = interval_join(l, r, "s", "e", "s2", "e2", by=["k"], bucket_width=width)
    want = _duck_rows(_ij_duck(), IJ_SQL.format(how=""), IJ_COLS)
    assert _rows(got, IJ_COLS) == want


def test_interval_join_left_keeps_unmatched_once(spark):
    l, r = _ij_dfs(spark)
    got = interval_join(
        l, r, "s", "e", "s2", "e2", by=["k"], how="left", left_keys=["id"]
    )
    want = _duck_rows(_ij_duck(), IJ_SQL.format(how="LEFT"), IJ_COLS)
    assert _rows(got, IJ_COLS) == want


def test_interval_join_plan_has_no_nested_loop(spark):
    l, r = _ij_dfs(spark)
    got = interval_join(l, r, "s", "e", "s2", "e2", by=["k"])
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_interval_join_parquet_sources(spark, tmp_path):
    # the cell join must survive parquet-backed lineage (the Catalyst
    # constraint landmine asof hit) — exploded×exploded + agg right
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(L_IV, "id int, k string, s double, e double").write.parquet(lp)
    spark.createDataFrame(R_IV, "k string, s2 double, e2 double, tag string").write.parquet(rp)
    l = spark.read.parquet(lp)
    r = spark.read.parquet(rp).groupBy("k", "s2", "e2").agg(F.max("tag").alias("tag"))
    got = interval_join(l, r, "s", "e", "s2", "e2", by=["k"])
    want = _duck_rows(_ij_duck(), IJ_SQL.format(how=""), IJ_COLS)
    assert _rows(got, IJ_COLS) == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    lrows=st.dictionaries(
        st.tuples(_keys, _times, _times), st.integers(0, 9), min_size=0, max_size=8
    ),
    rrows=st.dictionaries(
        st.tuples(_keys, _times, _times), st.integers(0, 9), min_size=0, max_size=8
    ),
    width=st.sampled_from([None, 0.5, 3.0]),
    how=st.sampled_from(["inner", "left"]),
)
def test_interval_join_property_any_log_matches_sql(spark, lrows, rrows, width, how):
    lrows = [(i, k, s, e) for i, ((k, s, e), _) in enumerate(sorted(lrows.items()))]
    rrows = [(k, s, e, v) for (k, s, e), v in sorted(rrows.items())]
    l = spark.createDataFrame(lrows, "id int, k string, s double, e double")
    r = spark.createDataFrame(rrows, "k string, s2 double, e2 double, tag int")
    got = interval_join(l, r, "s", "e", "s2", "e2", by=["k"], how=how,
                        left_keys=["id"] if how == "left" else None,
                        bucket_width=width)
    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows, columns=["id", "k", "s", "e"]))
    con.register("r", pd.DataFrame(rrows, columns=["k", "s2", "e2", "tag"]))
    cols = ["id", "k", "s", "e", "s2", "e2", "tag"]
    sql_how = "" if how == "inner" else "LEFT"
    want = _duck_rows(con, IJ_SQL.format(how=sql_how).replace("l.id,", "l.id,"), cols)
    assert _rows(got, cols) == want


def test_asof_multi_key_matches_duckdb(spark):
    lrows = [(1, "a", 1, 5.0), (2, "a", 2, 5.0), (3, "b", 1, 9.0), (4, "a", 1, 0.5)]
    rrows = [("a", 1, 1.0, 10), ("a", 2, 4.0, 20), ("b", 1, 2.0, 30), ("b", 2, 1.0, 40)]
    l = spark.createDataFrame(lrows, "id int, k1 string, k2 int, t double")
    r = spark.createDataFrame(rrows, "k1 string, k2 int, rt double, rv int")
    got = asof_join(l, r, on="t", by=["k1", "k2"], right_on="rt")
    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows, columns=["id", "k1", "k2", "t"]))
    con.register("r", pd.DataFrame(rrows, columns=["k1", "k2", "rt", "rv"]))
    cols = ["id", "k1", "k2", "t", "rv"]
    want = _duck_rows(
        con,
        "SELECT l.id, l.k1, l.k2, l.t, r.rv FROM l ASOF LEFT JOIN r"
        " ON l.k1 = r.k1 AND l.k2 = r.k2 AND l.t >= r.rt",
        cols,
    )
    assert _rows(got, cols) == want


def test_asof_bucket_keyed_window_partitions_include_cell(spark):
    # the point of bucket_keyed: the big window's partition spec must
    # contain the time-cell column alongside the key, so no single key
    # ever sorts as one partition
    l, r = _dfs(spark)
    got = asof_join(l, r, on="t", by=["k"], right_on="rt",
                    bucket_keyed=True, num_range_buckets=4)
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    import re
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    big = [s for s in specs if "_asof_on" in s]
    assert big and all("_asof_b" in s and "k#" in s for s in big), specs
