"""Pin the native F.aggregate fold semantics of q_forecast_ensemble
against a straight-line Python reference of the reference algorithms
(ES α=0.3: py_unemployment_forecast.py:41-52, Holt α=0.3 β=0.1:
:54-72, closed-form OLS: :74-104, 95% PI from std of first diffs:
:106-122, np.nanmean ensemble: :161-166).

The query is fully oracle-checked end-to-end; these tests additionally
pin the *algorithm* at unit level, so a refactor that keeps Spark/
DuckDB agreement but drifts from the reference recursions still fails.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbt_economic_indicators_eu_spark.queries.ml import (
    _ES_ALPHA,
    _HOLT_BETA,
    _HORIZON,
    _MIN_OBS_ENSEMBLE,
    _Z95,
    q_forecast_ensemble,
)


def _reference_forecast(ys: list[float]) -> dict[int, dict[str, float]]:
    """The reference recursions, written as plain loops."""
    n = len(ys)
    level = ys[0]
    for v in ys[1:]:
        level = _ES_ALPHA * v + (1 - _ES_ALPHA) * level

    l_t, b_t = ys[0], ys[1] - ys[0]
    for v in ys[1:]:
        l_prev = l_t
        l_t = _ES_ALPHA * v + (1 - _ES_ALPHA) * (l_t + b_t)
        b_t = _HOLT_BETA * (l_t - l_prev) + (1 - _HOLT_BETA) * b_t

    xs = list(range(n))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(i * v for i, v in zip(xs, ys))
    sxx = sum(i * i for i in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n

    diffs = [ys[i + 1] - ys[i] for i in range(n - 1)]
    mu = sum(diffs) / len(diffs)
    var = sum((d - mu) ** 2 for d in diffs) / (len(diffs) - 1)
    half = _Z95 * math.sqrt(var) * math.sqrt(1 + 1.0 / n)

    out = {}
    for h in range(1, _HORIZON + 1):
        f_es = level
        f_holt = l_t + h * b_t
        f_ols = intercept + slope * (n - 1 + h)
        ens = (f_es + f_holt + f_ols) / 3
        # RAW values: the engine emits unrounded folds (doctrine #3 —
        # bit-identical across engines; rounding could only reintroduce
        # a .xxxx5 boundary flip)
        out[h] = {
            "forecast_es": f_es,
            "forecast_holt": f_holt,
            "forecast_ols": f_ols,
            "forecast_ensemble": ens,
            "pi_lower": ens - half,
            "pi_upper": ens + half,
        }
    return out


def _run_on_series(spark, tmp_path, series_by_user):
    """Write a tiny events.parquet shaped like the test data (ns
    timestamps as int64 are not needed here — q_forecast_ensemble only
    consumes (user_id, ts, value) through _daily_user_series)."""
    rows = []
    for uid, ys in series_by_user.items():
        for day, v in enumerate(ys):
            # one event per day → daily_value == round(v, 2)
            rows.append((uid * 1000 + day, int((day * 86400) * 1e9), uid, "t", float(v), "{}"))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string"
    )
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir(exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    return q_forecast_ensemble(spark, sf_dir)


SERIES = [100.0, 102.5, 101.25, 103.75, 107.5, 105.0, 110.0, 108.75]


def test_fold_matches_reference_recursions(spark, tmp_path):
    got = {
        r["horizon_step"]: r
        for r in _run_on_series(spark, tmp_path, {1: SERIES}).collect()
    }
    want = _reference_forecast(SERIES)
    assert set(got) == set(range(1, _HORIZON + 1))
    for h, exp in want.items():
        for k, v in exp.items():
            assert got[h][k] == pytest.approx(v, abs=1e-9), (h, k)


def test_min_obs_guard_drops_short_series(spark, tmp_path):
    short = SERIES[: _MIN_OBS_ENSEMBLE - 1]
    df = _run_on_series(spark, tmp_path, {1: short, 2: SERIES})
    users = {r["user_id"] for r in df.collect()}
    assert users == {2}


def test_confidence_ladder(spark, tmp_path):
    by_user = {
        1: [float(100 + i) for i in range(8)],    # n=8  -> low
        2: [float(100 + i) for i in range(12)],   # n=12 -> medium
        3: [float(100 + i) for i in range(24)],   # n=24 -> high
    }
    rows = _run_on_series(spark, tmp_path, by_user).collect()
    conf = {r["user_id"]: r["confidence"] for r in rows}
    assert conf == {1: "low", 2: "medium", 3: "high"}


def test_linear_series_ols_is_exact(spark, tmp_path):
    # a perfectly linear series: OLS must extrapolate the line exactly
    ys = [50.0 + 2.0 * i for i in range(10)]
    rows = _run_on_series(spark, tmp_path, {1: ys}).collect()
    for r in rows:
        h = r["horizon_step"]
        assert r["forecast_ols"] == pytest.approx(50.0 + 2.0 * (9 + h), abs=1e-6)
        # diffs are constant → zero variance → degenerate PI collapses
        assert r["pi_lower"] == pytest.approx(r["forecast_ensemble"], abs=1e-6)
        assert r["pi_upper"] == pytest.approx(r["forecast_ensemble"], abs=1e-6)
