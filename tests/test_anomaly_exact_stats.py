"""Regression pins for the anomaly z-score's exact-integer statistics
(queries/ml.py q_anomaly_zscore / ORACLE_ANOMALY_ZSCORE):

1. NO catastrophic cancellation: a large near-constant series (100k
   values of 500.00 with a single 500.01) has si^2 >> 2^53, where the
   naive double form sq_d - si_d*si_d/nv loses ~half the variance;
   the decimal(38,0) numerator must reproduce the arbitrary-precision
   truth BIT-EXACTLY in both engines.
2. NaN/Infinity values don't crash the bigint cents cast in either
   engine — the finite guard skips them like NULLs (documented
   deviation from avg/stddev NaN-poisoning).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dbt_economic_indicators_eu_spark.queries.common import TABLES
from dbt_economic_indicators_eu_spark.queries.ml import (
    ORACLE_ANOMALY_ZSCORE,
    q_anomaly_zscore,
)

SRC = "/root/testdata/sf0.001"
_N = 100_000


@pytest.fixture(scope="module")
def adversarial_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_anom"))
    for t in TABLES:
        if t != "events":
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
    schema = pq.read_table(f"{SRC}/events.parquet").schema
    ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    # three adversarial values on existing rows (NaN may persist as
    # null through parquet — either way the engines must not crash)
    ev.loc[ev.index[:3], "value"] = [float("nan"), float("inf"), float("-inf")]
    big_uid = int(ev["user_id"].max()) + 10
    base = ev.iloc[0]
    big = pd.DataFrame(
        {
            "event_id": np.arange(10_000_000, 10_000_000 + _N),
            "user_id": big_uid,
            "event_type": "view",
            "ts": pd.Timestamp("2024-01-01"),
            "value": np.where(np.arange(_N) == 0, 500.01, 500.00),
        }
    )
    for col in ev.columns:
        if col not in big.columns:
            big[col] = base[col]
    allev = pd.concat([ev, big[ev.columns]], ignore_index=True)
    tbl = pa.Table.from_pandas(allev, schema=schema, preserve_index=False)
    # from_pandas silently converts NaN -> NULL; rebuild the value
    # column through pa.array so a GENUINE NaN double lands in the
    # parquet and the isnan half of the finite guard actually runs
    vcol = pa.array(allev["value"].tolist(), type=schema.field("value").type)
    tbl = tbl.set_column(tbl.column_names.index("value"), "value", vcol)
    pq.write_table(tbl, f"{d}/events.parquet")
    # the shipped file really contains the NaN (not a NULL) — else the
    # isnan guard branch goes unexercised and this pin certifies nothing
    vals = pq.read_table(f"{d}/events.parquet", columns=["value"])["value"]
    assert any(
        v.is_valid and np.isnan(v.as_py()) for v in vals.combine_chunks()
    )
    return d, big_uid


def _truth_z() -> float:
    """Ground truth for the 500.01 row's z: sums in exact Python ints,
    then MIRROR the engines' float operation order exactly — numerator
    rounds to double once, then /n/(n-1), math.sqrt (the correctly-
    rounded sqrt the engines use; var**0.5 routes through pow and may
    differ by 1 ulp on some libms), /100."""
    import math

    cents = [50001] + [50000] * (_N - 1)
    si = sum(cents)
    sq = sum(c * c for c in cents)
    numer = float(_N * sq - si * si)  # exact int -> one double rounding
    var = numer / _N / (_N - 1)
    std = math.sqrt(var) / 100
    mean = float(si) / _N / 100
    return (500.01 - mean) / std


def test_no_cancellation_and_no_nan_crash(spark, adversarial_sf):
    d, big_uid = adversarial_sf
    sdf = q_anomaly_zscore(spark, d)
    got = (
        sdf.filter(f"user_id = {big_uid} and value = 500.01")
        .select("z_score")
        .collect()[0]
        .z_score
    )
    truth = _truth_z()
    assert got == truth, (got, truth)  # bit-exact, no tolerance

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    oz = con.execute(
        f"SELECT z_score FROM ({ORACLE_ANOMALY_ZSCORE}) "
        f"WHERE user_id = {big_uid} AND value = 500.01"
    ).fetchone()[0]
    assert oz == truth, (oz, truth)

    # the NaN/Inf rows flowed through without aborting either engine
    assert sdf.count() == con.execute(
        f"SELECT count(*) FROM ({ORACLE_ANOMALY_ZSCORE})"
    ).fetchone()[0]
