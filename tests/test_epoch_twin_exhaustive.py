"""Exhaustive certification of the epoch twin (queries/common.py
``epoch_micros`` over TIMESTAMP_NTZ vs the DuckDB ``epoch_us`` the
oracles pin, e.g. sessionize — queries/relational.py): both engines
must agree with exact Python integer arithmetic on a dense wall-clock
grid. Timestamp encoding is the one place this build was bitten
across rounds (TESTDATA parquet encoding changed between r1 and r2),
so the twin gets the same treatment as the tokenizer/money/minhash
contracts: a sweep, not a handful of pins.

Grid: an odd-stride sweep (hits varied time-of-day/microsecond
phases) across 1960-2100 — including pre-epoch negatives — plus
engineered boundaries: the epoch itself, leap days, year ends,
century non-leap Feb 28/Mar 1, DST-transition instants (must be
inert for NTZ), and sub-second .000001/.5/.999999 phases.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from dbt_economic_indicators_eu_spark.queries.common import epoch_micros

from pyspark.sql import functions as F

_EPOCH = dt.datetime(1970, 1, 1)


def _truth_us(d: dt.datetime) -> int:
    delta = d - _EPOCH
    return (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds


def _grid() -> list[dt.datetime]:
    out = []
    t = dt.datetime(1960, 1, 1)
    step = dt.timedelta(seconds=1_000_003, microseconds=777_777)
    while t.year < 2100:
        out.append(t)
        t = t + step
    out += [
        _EPOCH,
        _EPOCH - dt.timedelta(microseconds=1),  # -1 us (negative epoch)
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
        dt.datetime(2000, 2, 29, 23, 59, 59, 999999),  # 400-year leap
        dt.datetime(2024, 2, 29, 12, 0, 0, 1),
        dt.datetime(1900, 2, 28, 23, 59, 59),  # century NON-leap
        dt.datetime(1900, 3, 1, 0, 0, 0),
        dt.datetime(2038, 1, 19, 3, 14, 8),  # past the i32 rollover
        dt.datetime(2025, 3, 30, 2, 30, 0),  # inside an EU DST gap
        dt.datetime(2025, 10, 26, 2, 30, 0),  # inside an EU DST fold
        dt.datetime(1999, 12, 31, 23, 59, 59, 500000),
        dt.datetime(2100, 12, 31, 23, 59, 59, 999999),
    ]
    return out


def test_epoch_micros_matches_duckdb_and_truth(spark):
    ts = _grid()
    truth = [_truth_us(t) for t in ts]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts)], "i bigint, ts timestamp_ntz"
    )
    got_spark = {
        r.i: r.us
        for r in df.select("i", epoch_micros(F.col("ts")).alias("us")).collect()
    }

    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame(
            {"i": range(len(ts)), "ts": pd.Series(ts, dtype="datetime64[us]")}
        ),
    )
    got_duck = {int(i): int(us) for i, us in con.execute(
        "SELECT i, epoch_us(ts) FROM t"
    ).fetchall()}

    bad = [
        (i, ts[i].isoformat(), truth[i], got_spark[i], got_duck[i])
        for i in range(len(ts))
        if not (got_spark[i] == got_duck[i] == truth[i])
    ]
    assert not bad, (len(bad), bad[:5])


def test_epoch_micros_inert_under_session_timezone(spark):
    """The helper's whole point: NTZ wall-clock micros must not move
    with the session time zone (a naive unix_micros/cast approach
    shifts by the tz offset)."""
    probe = dt.datetime(2025, 3, 30, 2, 30, 0)  # inside the CET DST gap
    df = spark.createDataFrame([(probe,)], "ts timestamp_ntz")
    prev = spark.conf.get("spark.sql.session.timeZone")
    vals = []
    try:
        for tz in ("UTC", "Europe/Paris", "Pacific/Kiritimati", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            vals.append(
                df.select(epoch_micros(F.col("ts")).alias("us")).collect()[0].us
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert len(set(vals)) == 1 and vals[0] == _truth_us(probe), vals


def test_ltz_input_renders_in_session_zone(spark):
    """The documented LTZ coercion semantics (no engine call site
    passes LTZ; this pins the contract for a future caller): the
    result is wall-clock micros of the SESSION-ZONE rendering — the
    offset at the value's own instant, not the epoch's."""
    instant_us = _truth_us(dt.datetime(2025, 7, 1, 10, 0, 0))  # 10:00Z, summer
    df = spark.range(1).select(
        F.timestamp_micros(F.lit(instant_us)).alias("ts")  # LTZ instant
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Europe/Paris")  # CEST +2
        got = df.select(epoch_micros(F.col("ts")).alias("us")).collect()[0].us
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == instant_us + 2 * 3600 * 1_000_000  # 12:00 wall clock
