"""Semantics pins for the as-of join and bin-bucketed range join
operators — the edge cases the oracle queries can't isolate:
tie-at-boundary inclusion, no-match nulls, row atomicity of the right
payload, multi-bin intervals matching exactly once, and half-open
interval boundaries."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbt_economic_indicators_eu_spark.operators.asof import asof_join
from dbt_economic_indicators_eu_spark.operators.rangejoin import range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0, "a"),
            (1, _ts("2024-01-01T12:00:00"), 110.0, "b"),
            (2, _ts("2024-01-01T11:00:00"), 200.0, "c"),
        ],
        "key bigint, qts timestamp, px double, tag string",
    )


def test_asof_backward_basic(spark, quotes):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T11:30:00"), "t1"),  # between quotes -> 100.0
            (1, _ts("2024-01-01T12:00:00"), "t2"),  # tie -> inclusive, 110.0
            (1, _ts("2024-01-01T09:00:00"), "t3"),  # before all -> null
            (3, _ts("2024-01-01T11:00:00"), "t4"),  # key with no quotes -> null
        ],
        "key bigint, tts timestamp, trade_id string",
    )
    out = asof_join(
        trades, quotes, on=["key"], left_ts="tts", right_ts="qts", values=["px", "tag"]
    )
    got = {r["trade_id"]: (r["px"], r["tag"]) for r in out.collect()}
    assert got == {
        "t1": (100.0, "a"),
        "t2": (110.0, "b"),
        "t3": (None, None),
        "t4": (None, None),
    }


def test_asof_forward(spark, quotes):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:30:00"), "t1"),  # next quote at 12:00
            (1, _ts("2024-01-01T12:00:00"), "t2"),  # tie -> inclusive, 110.0
            (1, _ts("2024-01-01T13:00:00"), "t3"),  # after all -> null
        ],
        "key bigint, tts timestamp, trade_id string",
    )
    out = asof_join(
        trades,
        quotes,
        on=["key"],
        left_ts="tts",
        right_ts="qts",
        values=["px"],
        direction="forward",
    )
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got == {"t1": 110.0, "t2": 110.0, "t3": None}


def test_asof_row_atomicity(spark):
    """A legitimately-null value column must not be backfilled from an
    OLDER right row — all values travel as one struct."""
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 1.0, "old"),
            (1, _ts("2024-01-01T11:00:00"), None, "new"),
        ],
        "key bigint, rts timestamp, px double, tag string",
    )
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"))], "key bigint, lts timestamp"
    )
    row = asof_join(
        left, right, on=["key"], left_ts="lts", right_ts="rts", values=["px", "tag"]
    ).collect()[0]
    assert row["tag"] == "new" and row["px"] is None  # NOT (1.0, "new")


def test_asof_rejects_colliding_values(spark, quotes):
    left = quotes.select("key", F.col("qts").alias("lts"), F.lit(1.0).alias("px"))
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, quotes, on=["key"], left_ts="lts", right_ts="qts", values=["px"])


def test_asof_rejects_unknown_direction(spark, quotes):
    left = quotes.select("key", F.col("qts").alias("lts"))
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(
            left, quotes, on=["key"], left_ts="lts", right_ts="qts",
            values=["px"], direction="nearest",
        )


def test_asof_forward_matches_duckdb_oracle(spark):
    """direction='forward' vs DuckDB ``ASOF LEFT JOIN ... l.ts <= r.ts``
    (smallest right_ts >= left_ts) on a deterministic 200x60 corpus with
    exact-tie rows, no-match tails, and keys missing from the right."""
    import datetime as dtm

    import duckdb
    import pandas as pd

    base = dtm.datetime(2024, 1, 1)
    left = pd.DataFrame(
        {
            "key": [i % 7 for i in range(200)],  # keys 5,6 absent from right
            "lts": [base + dtm.timedelta(minutes=(i * 37) % 997) for i in range(200)],
            "lid": list(range(200)),
        }
    )
    right = pd.DataFrame(
        {
            "key": [i % 5 for i in range(60)],
            # multiples of 37 → guaranteed exact ties with some left rows
            "rts": [base + dtm.timedelta(minutes=(i * 111) % 997) for i in range(60)],
            "val": [float(i) * 1.5 for i in range(60)],
        }
    )
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["key"], left_ts="lts", right_ts="rts",
            values=["val"], direction="forward",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    oracle = (
        con.execute(
            "SELECT l.key, l.lts, l.lid, r.val "
            "FROM l ASOF LEFT JOIN r ON l.key = r.key AND l.lts <= r.rts"
        )
        .fetchdf()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert out["val"].isna().sum() > 0  # no-match tails actually exercised
    pd.testing.assert_frame_equal(out[["key", "lid", "val"]], oracle[["key", "lid", "val"]])


@pytest.fixture(scope="module")
def intervals(spark):
    return spark.createDataFrame(
        [
            ("w1", _ts("2024-01-01T00:00:00"), _ts("2024-01-15T00:00:00")),  # 2 bins
            ("w2", _ts("2024-01-03T00:00:00"), _ts("2024-01-04T00:00:00")),  # sub-bin
            ("w3", _ts("2024-01-05T00:00:00"), _ts("2024-01-05T00:00:00")),  # empty
        ],
        "wid string, ws timestamp, we timestamp",
    )


def test_range_join_multibin_matches_once(spark, intervals):
    facts = spark.createDataFrame(
        [
            ("f1", _ts("2024-01-02T12:00:00")),  # w1 only
            ("f2", _ts("2024-01-03T06:00:00")),  # w1 + w2
            ("f3", _ts("2024-01-10T00:00:00")),  # w1, second bin
            ("f4", _ts("2024-01-20T00:00:00")),  # nothing
        ],
        "fid string, fts timestamp",
    )
    out = range_join(facts, "fts", intervals, "ws", "we", bin_seconds=7 * 86400)
    got = sorted((r["fid"], r["wid"]) for r in out.collect())
    assert got == [("f1", "w1"), ("f2", "w1"), ("f2", "w2"), ("f3", "w1")]


def test_range_join_half_open_boundaries(spark, intervals):
    facts = spark.createDataFrame(
        [
            ("start", _ts("2024-01-03T00:00:00")),  # == w2 start -> in
            ("end", _ts("2024-01-04T00:00:00")),  # == w2 end -> out (but in w1)
        ],
        "fid string, fts timestamp",
    )
    out = range_join(facts, "fts", intervals, "ws", "we", bin_seconds=86400)
    got = sorted((r["fid"], r["wid"]) for r in out.collect())
    assert got == [("end", "w1"), ("start", "w1"), ("start", "w2")]


def test_range_join_exact_bins_at_far_dates(spark):
    """Bin ids must be int64-exact over the full timestamp domain: the
    old floor(double /) math rounds |epoch-micros| >= 2^53 (past ~year
    2255 — e.g. a 9999-12-31 open-interval sentinel) by up to 16+ µs,
    so a boundary-adjacent fact could floor into the wrong bin and
    silently drop its matching interval."""
    from dbt_economic_indicators_eu_spark.operators.rangejoin import _bin_of

    day = 86400
    probes = [
        "9999-12-30T23:59:59.999999",  # just under the sentinel boundary
        "9999-12-31T00:00:00",
        "2255-06-01T00:00:00",
        "2255-06-01T23:59:59.999999",
        "1677-09-21T00:12:43.145224",  # far past
        "2024-01-03T00:00:00",
    ]
    df = spark.createDataFrame([(p,) for p in probes], "iso string").select(
        F.col("iso"), F.to_timestamp("iso").alias("ts")
    )
    got = {
        r["iso"]: r["bin"]
        for r in df.select("iso", _bin_of(F.col("ts"), day).alias("bin")).collect()
    }
    for iso in probes:
        delta = dt.datetime.fromisoformat(iso) - dt.datetime(1970, 1, 1)
        # exact int64 ground truth: timedelta float division rounds at
        # ~2.5e17 µs — the very imprecision under test
        micros = (
            delta.days * 86_400_000_000
            + delta.seconds * 1_000_000
            + delta.microseconds
        )
        assert got[iso] == micros // (day * 1_000_000), iso


def test_range_join_rejects_collision(spark, intervals):
    facts = intervals.select(F.col("wid"), F.col("ws").alias("fts"))
    with pytest.raises(ValueError, match="collision"):
        range_join(facts, "fts", intervals, "ws", "we", bin_seconds=86400)


def test_asof_query_tie_dedup_carries_null_value(spark, monkeypatch):
    """Tie-dedup semantics pin for q_asof_join: when the winning row
    (max event_id) of a (user_id, ts) purchase tie group carries a
    NULL value, that NULL is the purchase_value — both in Spark's
    max_by and in the oracle's row_number window (DuckDB's arg_max
    would skip the NULL and fall back to a lower event_id's value;
    the oracle deliberately does not use it)."""
    from dbt_economic_indicators_eu_spark.queries import timeseries

    t = _ts("2024-01-01T10:00:00")
    ev = spark.createDataFrame(
        [
            (8, t, 1, "purchase", 5.0, "{}"),
            (10, t, 1, "purchase", None, "{}"),  # winner, NULL value
            (20, _ts("2024-01-01T11:00:00"), 1, "view", 1.0, "{}"),
        ],
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(timeseries, "load", lambda s, d, n: ev)
    out = timeseries.q_asof_join(spark, "ignored").collect()
    assert len(out) == 1
    assert out[0].purchase_event_id == 10
    assert out[0].purchase_value is None


def test_asof_null_timestamps_never_match(spark):
    """pandas merge_asof / DuckDB ASOF semantics: a NULL right_ts row
    matches nothing (it must not sort NULLS-FIRST and propagate its
    payload to unmatched left rows), and a NULL left_ts row gets a
    NULL payload in BOTH directions (under the forward scan's DESC
    order it would otherwise inherit the smallest right_ts payload)."""
    quotes = spark.createDataFrame(
        [
            (1, None, 99.0, "poison"),
            (1, _ts("2024-01-01T10:00:00"), 5.0, "real"),
        ],
        "key bigint, qts timestamp, px double, tag string",
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), "before-all"),
            (1, _ts("2024-01-01T11:00:00"), "after"),
            (1, None, "null-left"),
        ],
        "key bigint, tts timestamp, tid string",
    )
    for direction, expect in (
        ("backward", {"before-all": None, "after": 5.0, "null-left": None}),
        ("forward", {"before-all": 5.0, "after": None, "null-left": None}),
    ):
        out = {
            r.tid: r.px
            for r in asof_join(
                trades, quotes, on=["key"], left_ts="tts", right_ts="qts",
                values=["px"], direction=direction,
            ).collect()
        }
        assert out == expect, (direction, out)


def test_asof_rejects_reserved_internal_columns(spark, quotes):
    left = quotes.select(
        "key", F.col("qts").alias("lts"), F.lit(1).alias("__asof_side")
    )
    with pytest.raises(ValueError, match="internals"):
        asof_join(left, quotes, on=["key"], left_ts="lts", right_ts="qts", values=["px"])
