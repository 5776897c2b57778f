"""Unit tests for the Column-returning macro ports
(functions/expressions.py ↔ reference macros/calculations.sql)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from dbt_economic_indicators_eu_spark.functions.expressions import (
    rank_within_group,
    rolling_average,
    safe_divide,
    surrogate_key,
    yoy_change,
)


def test_surrogate_key_md5_byte_parity(spark):
    """Must equal md5(concat_ws('||', coalesce(cast(f as varchar),'')))
    byte-for-byte (reference macros/calculations.sql:1-13)."""
    df = spark.createDataFrame(
        [("DE", 2023), ("FR", 2024), (None, 2025)], "geo string, yr int"
    )
    got = {r["geo"]: r["k"] for r in df.select("geo", surrogate_key("geo", "yr").alias("k")).collect()}
    assert got["DE"] == hashlib.md5(b"DE||2023").hexdigest()
    assert got["FR"] == hashlib.md5(b"FR||2024").hexdigest()
    assert got[None] == hashlib.md5(b"||2025").hexdigest()  # coalesce('') on null


def test_safe_divide_null_on_zero_and_null(spark):
    df = spark.createDataFrame(
        [(10.0, 2.0), (10.0, 0.0), (10.0, None), (None, 2.0)], "num double, den double"
    )
    out = df.select(safe_divide(F.col("num"), F.col("den")).alias("q")).collect()
    assert [r["q"] for r in out] == [5.0, None, None, None]


def test_yoy_change_guards(spark):
    df = spark.createDataFrame(
        [("DE", 1, 100.0), ("DE", 2, 110.0), ("DE", 3, 0.0), ("DE", 4, 50.0)],
        "geo string, t int, v double",
    )
    out = (
        df.select("t", yoy_change(F.col("v"), F.col("t"), ["geo"]).alias("yoy"))
        .orderBy("t")
        .collect()
    )
    assert out[0]["yoy"] is None  # no prior row
    assert abs(out[1]["yoy"] - 10.0) < 1e-9
    assert abs(out[2]["yoy"] - (-100.0)) < 1e-9
    assert out[3]["yoy"] is None  # prev == 0 → null, not inf


def test_rolling_average_expanding_head(spark):
    """Expanding behavior at partition head (reference unit test
    test_rolling_average_calculation expects 7.0 / 7.1 / 7.1)."""
    df = spark.createDataFrame(
        [("FR", 1, 7.0), ("FR", 2, 7.2), ("FR", 3, 7.1)], "geo string, t int, v double"
    )
    out = (
        df.select("t", F.round(rolling_average(F.col("v"), F.col("t"), ["geo"], 12), 6).alias("a"))
        .orderBy("t")
        .collect()
    )
    assert [r["a"] for r in out] == [7.0, 7.1, 7.1]


def test_rank_within_group_gap_ties(spark):
    """rank() gap semantics (1,1,3 on ties) — NOT dense_rank
    (reference macros/calculations.sql:84-87)."""
    df = spark.createDataFrame(
        [("a", 10.0), ("b", 10.0), ("c", 5.0), ("d", 1.0)], "id string, v double"
    )
    out = {
        r["id"]: r["rk"]
        for r in df.select(
            "id", rank_within_group(F.col("v"), [F.lit(1)], ascending=False).alias("rk")
        ).collect()
    }
    assert out == {"a": 1, "b": 1, "c": 3, "d": 4}


def test_rank_ascending_nulls_last_matches_duckdb(spark):
    """ASC rank pins NULLS LAST: DuckDB's default_null_order ranks
    NULLs last on ASC (the reference's rank semantics) while Spark's
    plain asc() would sort them FIRST, handing rank 1 to a NULL-metric
    row and shifting every real rank."""
    import duckdb

    from dbt_economic_indicators_eu_spark.functions import rank_within_group

    df = spark.createDataFrame(
        [("a", 3.0), ("b", None), ("c", 1.0), ("d", 2.0)], "k string, v double"
    )
    got = {
        r["k"]: r["rk"]
        for r in df.select(
            "k", rank_within_group(F.col("v"), [F.lit(1)], ascending=True).alias("rk")
        ).collect()
    }
    want = {
        k: rk
        for k, rk in duckdb.sql(
            "SELECT k, rank() OVER (ORDER BY v ASC) rk FROM (VALUES "
            "('a', 3.0), ('b', NULL), ('c', 1.0), ('d', 2.0)) t(k, v)"
        ).fetchall()
    }
    assert got == want == {"c": 1, "d": 2, "a": 3, "b": 4}
