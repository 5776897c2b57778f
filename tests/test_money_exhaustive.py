"""Exhaustive certification of the money4 sum contract
(``money4_sum_r2`` / ``money4_sum_sql`` — queries/common.py) over its
FULL documented domain, extending the engineered boundary pins in
tests/test_twin_pins.py:

1. the summand SNAP claim — ``round(x * 10000)`` recovers the exact
   integer ten-thousandths for every realistic product
   ``price * (1 - discount)`` (2-dec price x 2-dec factor): swept over
   the entire grid price in [0.00, 9999.99] x discount in
   [0.00, 0.10], 11M products, vectorized numpy (same doubles the JVM
   and DuckDB compute);
2. cross-engine agreement at EVERY half-up residue — group sums
   covering all 100 ten-thousandths residues mod 100 (the .xx00-.xx99
   boundary spectrum, including the .xx50 half exactly) at four
   magnitude bands from 0 up to ~9e8 currency units (the documented
   domain ceiling), each group split into 3 summands so the
   integer accumulation actually runs; Spark, DuckDB, and the pure
   half-up expectation must agree exactly.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from dbt_economic_indicators_eu_spark.queries.common import (
    money4_sum_r2,
    money4_sum_sql,
)


def test_snap_exact_over_realistic_product_grid():
    """round(p*(1-d)*10000) == p_cents*(100-d_hundredths) for the whole
    2-decimal grid — the claim that makes the integer accumulation
    exact. A single failing cell would mean a summand lands one
    ten-thousandth off in BOTH engines' snap."""
    pc = np.arange(0, 1_000_000, dtype=np.int64)  # price cents: 0..9999.99
    for dc in range(0, 11):  # discount hundredths: 0.00..0.10
        p = pc / 100.0
        prod = p * (1.0 - dc / 100.0)
        snapped = np.rint(prod * 10000.0).astype(np.int64)
        expect = pc * (100 - dc)
        bad = np.nonzero(snapped != expect)[0]
        assert bad.size == 0, (dc, pc[bad[:5]], snapped[bad[:5]], expect[bad[:5]])


# magnitude bands (integer ten-thousandths): zero region, a mid value,
# the live sf0.01 divergence shape, and just under the documented
# ~9e8-currency-unit ceiling (8_999_999_990_000 = ~9e8 units). Bands
# BEYOND the ceiling genuinely fail the pure-integer expectation — the
# summand snap drifts past +-0.5 ten-thousandths around ~9e11 units
# (verified while building this test), which is why the contract pins
# the ceiling where it does.
_BANDS = [0, 1_234_500, 178_148_159_350, 8_999_999_990_000]


def _split3(si: int, rng: np.random.Generator) -> tuple[int, int, int]:
    """Three non-negative integer summands with the exact target sum."""
    if si < 2:
        return si, 0, 0
    a = int(rng.integers(0, si // 2))
    b = int(rng.integers(0, si - a))
    return a, b, si - a - b


def test_halfup_residue_spectrum_matches_across_engines(spark):
    """Every residue mod 100 at every band: Spark == DuckDB == pure
    half-up integer expectation ((si + 50) // 100 cents)."""
    rng = np.random.default_rng(7)
    rows = []
    expected = {}
    gid = 0
    for base in _BANDS:
        for r in range(100):
            si = base + r
            for part in _split3(si, rng):
                rows.append((gid, part / 10000.0))
            expected[gid] = ((si + 50) // 100) / 100.0
            gid += 1
    df = spark.createDataFrame(rows, "g bigint, x double")
    got_spark = {
        row.g: row.s
        for row in df.groupBy("g").agg(money4_sum_r2(F.col("x")).alias("s")).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    got_duck = {
        int(g): s
        for g, s in con.execute(
            f"SELECT g, {money4_sum_sql('x')} FROM t GROUP BY g"
        ).fetchall()
    }
    bad = [
        (g, expected[g], got_spark[g], got_duck[g])
        for g in expected
        if not (got_spark[g] == got_duck[g] == expected[g])
    ]
    assert not bad, (len(bad), bad[:5])
