"""Entries rotated out of the 50-slot driver window keep the exact
same DuckDB value gate here, so no §2 operator ever loses
value-checked evidence (w2 global sort, pivot counts, and the split
column of train_val_split — the last also lives on inside the
mixture_sample_split driver entry)."""

from __future__ import annotations

import pytest

from spark_cdc.plans.queries import RETIRED_ORACLES, RETIRED_QUERIES
from tests.test_entry_contract import SF_DIR, _canon, _duck


@pytest.mark.parametrize("name", sorted(RETIRED_QUERIES))
def test_retired_entry_contract(spark, name):
    df = RETIRED_QUERIES[name](spark, SF_DIR)
    rows = df.collect()
    ocols, orows = _duck(RETIRED_ORACLES[name])
    assert sorted(df.columns) == sorted(ocols), f"{name}: column names differ"
    key = sorted(df.columns)
    got = sorted(tuple(_canon(r[c]) for c in key) for r in rows)
    want_idx = {c: i for i, c in enumerate(ocols)}
    want = sorted(tuple(_canon(r[want_idx[c]]) for c in key) for r in orows)
    assert got == want, f"{name}: value mismatch"
