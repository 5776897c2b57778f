#!/usr/bin/env python
"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB against the same parquet tables, then compares row count, column
names, and an order-insensitive value comparison (floats rounded to 9
significant-ish digits before compare). Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import os

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from dbt_economic_indicators_eu_spark.tableset import TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # canonicalize nulls BEFORE stringifying: Spark→pandas
            # yields Python None, DuckDB→pandas yields numpy NaN —
            # astype(str) would render them 'None' vs 'nan'
            df[c] = df[c].where(df[c].notna(), "<NULL>").astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("datetime"):
            # canonicalize NULLs here too: a nullable DATE column comes
            # back as object-of-datetime.date from Spark (NULL →
            # '<NULL>' above) but datetime64 from DuckDB (NULL → 'NaT'
            # under astype(str)) — identical data must not diff
            df[c] = (
                df[c].astype("datetime64[us]").astype(str).replace("NaT", "<NULL>")
            )
    # sort floats at a COARSER grain (6dp) than the 1e-9 compare
    # tolerance: sorting on the compared values directly would let
    # within-tolerance engine noise reorder rows and diff row A
    # against row B (non-float columns sort exactly, floats only
    # break remaining ties). Rows still tied on EVERY 6dp-rounded key
    # then tie-break on the exact float values (ADVICE r5): falling
    # back to pre-sort index order is engine/partition-dependent, so
    # two genuinely different rows (e.g. 0.1234561 vs 0.1234569) could
    # pair crosswise and fail the 1e-9 compare spuriously. Exact
    # values within the tie group order consistently across engines
    # whenever they differ by more than the compare tolerance — and
    # ties closer than that pass the compare either way.
    sort_frame = df.copy()
    float_cols = [
        c for c in sort_frame.columns if str(sort_frame[c].dtype).startswith("float")
    ]
    for c in float_cols:
        sort_frame[c] = sort_frame[c].round(6)
    keys = list(sort_frame.columns)
    for c in float_cols:
        exact = f"__exact_{c}"
        sort_frame[exact] = df[c]
        keys.append(exact)
    order = sort_frame.sort_values(by=keys).index
    return df.loc[order].reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Deliberately a VANILLA session (not session.get_spark): the driver's
    # harness constructs its own SparkSession without our confs, so queries
    # must be self-contained — this mirrors that environment.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = queries()
    oracles = oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd filter would otherwise run ZERO queries and exit 0 —
        # a green gate that compared nothing
        print(f"ERROR unknown query names: {sorted(unknown)}")
        return 2
    n_pass = n_fail = n_rows_only = 0
    for name, builder in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc()
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle, rows-only) [{t_spark:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: oracle SQL raised")
            traceback.print_exc()
            n_fail += 1
            continue

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"row count {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            a, b = normalize(sdf), normalize(odf)
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            except AssertionError as e:
                problems.append(f"values differ: {str(e)[:500]}")
                # show a few mismatching rows for debugging
                try:
                    neq = (a != b) & ~(a.isna() & b.isna())
                    bad_rows = neq.any(axis=1)
                    if bad_rows.any():
                        i = bad_rows.idxmax()
                        cols = [c for c in a.columns if neq.loc[i, c]]
                        print(f"      first mismatch row {i} cols {cols}:")
                        print("      spark :", a.loc[i, cols].to_dict())
                        print("      oracle:", b.loc[i, cols].to_dict())
                except Exception:
                    pass
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{t_spark:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    if n_fail:
        return 1  # real correctness failures outrank "nothing verified"
    if n_pass + n_rows_only == 0:
        return 2  # nothing verified is not a pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
