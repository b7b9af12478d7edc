"""Property-based check (hypothesis): for ANY change log, ANY split
into two merge phases, and both merge modes, the change feed between
the two snapshots is exactly the edit script from state A to state B —
applying it to A reproduces B, pre/post images match the respective
states, and no no-op rows are emitted."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_cdc.cdc.apply import apply_batch
from spark_cdc.cdc.envelope import KEY_COLUMNS, PAYLOAD_SCHEMA
from spark_cdc.lake.table import LakeTable

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)

events = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),   # conv_id
        st.integers(0, 2),                   # turn_idx
        st.sampled_from(["c", "u", "d"]),   # op
        st.integers(0, 5),                   # ts offset (seconds)
        st.integers(0, 3),                   # op_seq
        st.sampled_from(["x", "y", "z"]),   # text
    ),
    min_size=2,
    max_size=40,
)


@pytest.fixture(scope="module")
def mk_table(spark, tmp_path_factory):
    counter = [0]

    def make():
        counter[0] += 1
        path = str(tmp_path_factory.mktemp("feedprop") / f"t{counter[0]}")
        return LakeTable.create(
            spark, path, PAYLOAD_SCHEMA, key_columns=KEY_COLUMNS, num_buckets=4
        )

    return make


def _state(table, snap):
    return {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["ts"])
        for r in table.read(snapshot_id=snap).collect()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(evs=events, split=st.floats(0.1, 0.9), mode=st.sampled_from(["cow", "mor"]))
def test_feed_is_exact_edit_script(spark, mk_table, evs, split, mode):
    rows = [
        (lsn, seq, op, conv, turn, "user", text, None,
         BASE + datetime.timedelta(seconds=ts_off))
        for lsn, (conv, turn, op, ts_off, seq, text) in enumerate(evs)
    ]
    schema = (
        "lsn long, op_seq long, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string, ts timestamp"
    )
    cut = max(1, min(len(rows) - 1, int(len(rows) * split)))
    table = mk_table()
    apply_batch(table, spark.createDataFrame(rows[:cut], schema),
                batch_id=0, mode=mode, collect_lineage=False)
    snap_a = table.snapshot_id
    apply_batch(table, spark.createDataFrame(rows[cut:], schema),
                batch_id=1, mode=mode, collect_lineage=False)
    snap_b = table.snapshot_id

    state_a, state_b = _state(table, snap_a), _state(table, snap_b)
    diff = table.read_changes(snap_a, snap_b).collect()

    # applying the diff to A reproduces B exactly
    rebuilt = dict(state_a)
    for r in diff:
        k = (r["conv_id"], r["turn_idx"])
        if r["_change_type"] == "delete":
            assert rebuilt.pop(k, None) is not None, f"delete of absent key {k}"
        else:
            if r["_change_type"] == "insert":
                assert k not in rebuilt, f"insert of present key {k}"
            else:
                assert k in rebuilt, f"update of absent key {k}"
            rebuilt[k] = (r["text"], r["ts"])
    assert rebuilt == state_b

    # pre/post images match the states; no no-op rows
    pre_diff = table.read_changes(snap_a, snap_b, include_preimage=True).collect()
    assert len(pre_diff) == len(diff)
    for r in pre_diff:
        k = (r["conv_id"], r["turn_idx"])
        post = (r["text"], r["ts"])
        pre = (r["_pre_text"], r["_pre_ts"])
        if r["_change_type"] == "insert":
            assert pre == (None, None) and post == state_b[k]
        elif r["_change_type"] == "delete":
            assert pre == state_a[k]
        else:
            assert pre == state_a[k] and post == state_b[k] and pre != post
