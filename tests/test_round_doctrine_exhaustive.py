"""Exhaustive certification of the rounding-parity doctrine behind
``r2``/``r4``/``r6`` (queries/common.py) and every oracle's matching
``round(x, k)``: rounding is cross-engine safe ONLY when applied
beyond the data's decimal precision — there round-k is the IDENTITY
on the value's double in both engines, so Spark's
shortest-decimal-string rounding and DuckDB's binary-value rounding
cannot disagree (they disagree in general: the money4 contract exists
precisely because round-at-the-boundary diverged live at sf0.01 —
see queries/common.py money4_sum_r2).

Sweeps the full ≤(k-1)-decimal grid for each helper — every 5-decimal
double in [0, 100) for r6 (10M values), every 3-decimal in [0, 100)
for r4, every 1-decimal in [-1000, 1000) for r2 — plus a
large-magnitude band (1e6 offset) where the double's ulp is bigger
but still far below the rounding half-step. Expected mismatches in
BOTH engines: zero. Runs as one Spark job per grid over
``spark.range`` (no data movement) and one vectorized DuckDB scan.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F


# (helper digits k, grid denominator 10^(k-1), lo, hi, offset)
_GRIDS = [
    (6, 100_000, 0, 10_000_000, 0.0),  # r6 over [0, 100) at 5 decimals
    (6, 100_000, 0, 1_000_000, 1_000_000.0),  # r6 at 1e6 magnitude
    (4, 1_000, 0, 100_000, 0.0),  # r4 over [0, 100) at 3 decimals
    (2, 10, -10_000, 10_000, 0.0),  # r2 over [-1000, 1000) at 1 decimal
]


@pytest.mark.parametrize("k,den,lo,hi,off", _GRIDS)
def test_round_beyond_precision_is_identity_in_both_engines(
    spark, k, den, lo, hi, off
):
    x = F.col("id") / F.lit(float(den)) + F.lit(off)
    n_spark = (
        spark.range(lo, hi)
        .select(x.alias("x"))
        .filter(F.round(F.col("x"), k) != F.col("x"))
        .count()
    )
    assert n_spark == 0

    n_duck = duckdb.connect().execute(
        f"SELECT count(*) FROM range({lo}, {hi}) t(i) "
        f"WHERE round(i / {float(den)} + {off!r}, {k}) != i / {float(den)} + {off!r}"
    ).fetchone()[0]
    assert n_duck == 0
