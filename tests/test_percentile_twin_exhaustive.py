"""Certification of the exact-percentile twin (Spark ``percentile``
vs DuckDB ``quantile_cont`` — queries/ml.py IQR, sketch_agg's exact
p50): at the QUARTER quantiles the engine actually uses (0.25, 0.5,
0.75, plus the 0/1 endpoints) the two engines are BIT-IDENTICAL on
raw, unrounded doubles over a large seeded sweep of group shapes —
because the interpolation position (n-1)*q and fraction are exact
dyadic values, both lerps compute the same double.

This is NOT true of arbitrary quantiles: while building this test,
q = 0.9 diverged by 1 ulp in ~2 % of the same groups (the position
(n-1)*0.9 itself rounds differently), which is exactly why the parity
doctrine (queries/common.py module docstring) confines percentile
twins to quarter points or rounds them at a safe digit. A future
query adding a non-dyadic quantile must round — this pin is the
tripwire's documentation.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from pyspark.sql import functions as F

_QS = [0.0, 0.25, 0.5, 0.75, 1.0]


def _corpus() -> list[tuple[int, float]]:
    rng = np.random.default_rng(3)
    rows: list[tuple[int, float]] = []
    gid = 0

    def add(vals):
        nonlocal gid
        for v in vals:
            rows.append((gid, float(v)))
        gid += 1

    # engineered: constant, singleton, two-point, tied pairs, negatives
    add([42.0] * 7)
    add([1.0])
    add([0.0, 7.5])
    add([0.0, 0.0, 7.5, 7.5])
    add([-3.13, 2.5, 2.5, 9.99])
    # seeded random: sizes 1..200, 2-decimal atoms, 30 % heavy-tie mix
    for _ in range(500):
        n = int(rng.integers(1, 200))
        vals = np.round(rng.uniform(-1000, 1000, n), 2)
        if rng.random() < 0.3:
            vals = np.repeat(vals[: max(1, n // 4)], 4)[:n]
        add(vals)
    return rows


def test_quarter_quantiles_bit_identical_across_engines(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "g bigint, v double")
    aggs = [
        F.expr(f"percentile(v, {q})").alias(f"q{i}") for i, q in enumerate(_QS)
    ]
    sp = {
        r.g: [getattr(r, f"q{i}") for i in range(len(_QS))]
        for r in df.groupBy("g").agg(*aggs).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "v"]))
    exprs = ", ".join(f"quantile_cont(v, {q})" for q in _QS)
    dd = {
        int(r[0]): list(r[1:])
        for r in con.execute(f"SELECT g, {exprs} FROM t GROUP BY g").fetchall()
    }
    # bit-exact: no tolerance at all
    bad = [(g, sp[g], dd[g]) for g in sp if sp[g] != dd[g]]
    assert not bad, (len(bad), bad[:5])
