"""Property-based SCD2 / merge invariants (hypothesis over random batch
sequences). The example tests in test_materialize.py pin specific
transitions; these pin the invariants for ARBITRARY source histories:

I1  exactly one is_current row per key present in the latest source
I2  no is_current row for keys absent from the latest source
I3  closed rows have valid_from <= valid_to; open rows have null valid_to
I4  replaying the same source (later clock) is a no-op up to clock cols
I5  merge_upsert result keys = existing ∪ incoming; incoming wins

Small deterministic profile: pyspark actions are slow, so few examples
with rich batch shapes beat many trivial ones.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_economic_indicators_eu_spark.materialize.incremental import merge_upsert
from dbt_economic_indicators_eu_spark.materialize.snapshot import scd2_merge

KEYS = ["a", "b", "c", "d"]

# one source state: subset of keys with a small int "measure" (None = null)
state_strategy = st.dictionaries(
    st.sampled_from(KEYS), st.one_of(st.none(), st.integers(0, 3)), max_size=4
)
history_strategy = st.lists(state_strategy, min_size=1, max_size=4)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _src_df(spark, state: dict):
    rows = [(k, v) for k, v in sorted(state.items())]
    return spark.createDataFrame(rows, "k string, measure int")


def _replay(spark, history):
    snap = None
    t = dt.datetime(2024, 1, 1)
    for i, state in enumerate(history):
        snap = scd2_merge(snap, _src_df(spark, state), "k", ["measure"], t + dt.timedelta(days=i))
        # materialize each step (run_snapshot reads back from parquet;
        # localCheckpoint is the in-memory equivalent for the test)
        snap = snap.localCheckpoint(eager=True)
    return snap, history[-1]


@given(history=history_strategy)
@settings(**_SETTINGS)
def test_scd2_invariants_over_random_histories(spark, history):
    snap, last = _replay(spark, history)
    rows = snap.collect()

    open_keys = sorted(r.k for r in rows if r.is_current)
    assert open_keys == sorted(last.keys())  # I1 + I2 (one open row per live key)
    assert len(open_keys) == len(set(open_keys))

    for r in rows:
        if r.is_current:
            assert r.valid_to is None  # I3 open
        else:
            assert r.valid_to is not None and r.valid_from <= r.valid_to  # I3 closed

    # open rows carry the latest measure
    for r in rows:
        if r.is_current:
            assert r.measure == last[r.k]


@given(history=history_strategy)
@settings(**_SETTINGS)
def test_scd2_replay_same_source_is_noop(spark, history):
    snap, last = _replay(spark, history)
    again = scd2_merge(
        snap, _src_df(spark, last), "k", ["measure"], dt.datetime(2025, 6, 1)
    )
    # I4: identical source later → byte-identical snapshot state
    # (repr-sort: tuples mixing None and ints are not orderable)
    assert sorted(map(repr, snap.collect())) == sorted(map(repr, again.collect()))


@given(existing=state_strategy, incoming=state_strategy)
@settings(**_SETTINGS)
def test_merge_upsert_key_union_incoming_wins(spark, existing, incoming):
    ex, inc = _src_df(spark, existing), _src_df(spark, incoming)
    out = {r.k: r.measure for r in merge_upsert(ex, inc, "k").collect()}
    assert set(out) == set(existing) | set(incoming)  # I5 keys
    for k, v in incoming.items():
        assert out[k] == v  # I5 incoming wins
    for k, v in existing.items():
        if k not in incoming:
            assert out[k] == v
