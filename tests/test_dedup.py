"""W1 dedup: three strategies agree with each other and with a DuckDB
window-function oracle, including ts ties broken by op_seq
(FIXTURES.md F2, SURVEY.md §2.5)."""

from __future__ import annotations

import duckdb

from spark_cdc.cdc.dedup import (
    latest_version_per_key,
    latest_version_per_key_agg,
    latest_version_per_key_max,
    latest_version_per_key_salted,
)
from spark_cdc.sources.changelog import generate_change_log
from tests.conftest import assert_df_equal

KEYS = ["conv_id", "turn_idx"]


def test_dedup_strategies_agree(spark):
    log = generate_change_log(spark, n_events=3000, n_convs=40, seed=7)
    w = latest_version_per_key(log, KEYS)
    a = latest_version_per_key_agg(log, KEYS)
    s = latest_version_per_key_salted(log, KEYS, salt_buckets=4)
    m = latest_version_per_key_max(log, KEYS)
    assert_df_equal(w, a, KEYS)
    assert_df_equal(w, s, KEYS)
    assert_df_equal(w, m.select(*w.columns), KEYS)
    # one row per key
    assert a.count() == a.select(*KEYS).distinct().count()


def test_dedup_matches_duckdb_oracle(spark):
    log = generate_change_log(spark, n_events=2000, n_convs=25, seed=11)
    got = latest_version_per_key_agg(log, KEYS)
    pdf = log.toPandas()
    con = duckdb.connect()
    con.register("log", pdf)
    oracle = con.execute(
        """
        SELECT lsn, op_seq, op, conv_id, turn_idx, role, text, tool, ts
        FROM (
          SELECT *, row_number() OVER (
              PARTITION BY conv_id, turn_idx
              ORDER BY ts DESC, op_seq DESC, lsn DESC) AS rn
          FROM log) WHERE rn = 1
        """
    ).fetch_df()
    got_rows = sorted(
        tuple(r) for r in got.select("conv_id", "turn_idx", "lsn", "text").collect()
    )
    want_rows = sorted(
        tuple(r)
        for r in zip(
            oracle.conv_id, oracle.turn_idx.astype(int), oracle.lsn.astype(int), oracle.text
        )
    )
    # normalize pandas NaN → None for text
    want_rows = [
        (c, t, l, None if x != x else x) if isinstance(x, float) else (c, t, l, x)
        for c, t, l, x in want_rows
    ]
    assert got_rows == want_rows


def test_ts_tie_broken_by_op_seq(spark):
    import datetime

    rows = [
        # same key, same ts — op_seq decides
        (1, 10, "c", "conv-0", 0, "user", "v1", None, datetime.datetime(2024, 1, 1)),
        (2, 30, "u", "conv-0", 0, "user", "v3", None, datetime.datetime(2024, 1, 1)),
        (3, 20, "u", "conv-0", 0, "user", "v2", None, datetime.datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows, "lsn long, op_seq long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    for fn in (
        latest_version_per_key,
        latest_version_per_key_agg,
        latest_version_per_key_salted,
        latest_version_per_key_max,
    ):
        out = fn(df, KEYS).collect()
        assert len(out) == 1 and out[0]["text"] == "v3", fn.__name__
