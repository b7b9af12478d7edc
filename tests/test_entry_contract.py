"""Mirror of the driver's correctness gate: run every ``queries()``
entry at sf0.001 and compare row-count + order-insensitive values
against its ``oracle_sql()`` DuckDB result."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

import __spark_entry__ as contract

SF_DIR = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.001")


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:
        pass
    return v


def _duck(sql):
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        p = os.path.join(SF_DIR, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


@pytest.mark.parametrize("name", sorted(contract.queries().keys()))
def test_query_contract(spark, name):
    fn = contract.queries()[name]
    df = fn(spark, SF_DIR)
    rows = df.collect()
    oracle = contract.oracle_sql().get(name)
    if oracle is None:
        assert len(rows) >= 0  # rows-only check (driver's weaker gate)
        return
    ocols, orows = _duck(oracle)
    assert sorted(df.columns) == sorted(ocols), f"{name}: column names differ"
    key = sorted(df.columns)
    got = sorted(tuple(_canon(r[c]) for c in key) for r in rows)
    want_idx = {c: i for i, c in enumerate(ocols)}
    want = sorted(tuple(_canon(r[want_idx[c]]) for c in key) for r in orows)
    assert len(got) == len(want), f"{name}: row count {len(got)} vs oracle {len(want)}"
    assert got == want, f"{name}: value mismatch; first diff: " + str(
        next(((g, w) for g, w in zip(got, want) if g != w), None)
    )


def test_entry_smoke(spark):
    df = contract.entry(spark)
    assert df.count() > 0
