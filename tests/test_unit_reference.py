"""Port of the reference's 4 dbt unit tests
(models/intermediate/_intermediate__unit_tests.yml:8-134), run through
the model registry with mock-ref injection (OP-TEST-UNIT).

Mocks carry only the columns each model actually reads — the builders
``select`` explicit columns, so narrower given-rows are equivalent to
dbt's full-row mocks.
"""

from __future__ import annotations

import pytest

from dbt_economic_indicators_eu_spark.models.econ import build_registry
from dbt_economic_indicators_eu_spark.testing.unit import UnitTestFailure, mock_df, run_unit_test

GDP_SCHEMA = "country_code string, reference_year int, gdp_million_eur double, _extracted_at string"
POP_SCHEMA = "country_code string, reference_year int, population_count double"
UNEMP_ANNUAL_SCHEMA = "country_code string, reference_year int, unemployment_rate_pct double"
UNEMP_MONTHLY_SCHEMA = (
    "country_code string, country_name string, reference_year int, reference_month int, "
    "reference_date date, unemployment_rate_pct double"
)
INFL_SCHEMA = (
    "country_code string, reference_year int, reference_date date, inflation_rate_mom_pct double"
)
ANNUAL_CTX_SCHEMA = (
    "country_code string, reference_year int, gdp_million_eur double, "
    "population_count double, gdp_per_capita_eur double"
)


@pytest.fixture(scope="module")
def registry():
    return build_registry()


def test_gdp_per_capita_calculation(spark, registry):
    """_intermediate__unit_tests.yml:8-34 — normal calc, zero population
    → null (not error), 6-decimal expected literals."""
    given = {
        "stg_eurostat__gdp": mock_df(
            spark,
            [
                {"country_code": "DE", "reference_year": 2023, "gdp_million_eur": 4000000.0, "_extracted_at": "x"},
                {"country_code": "MT", "reference_year": 2023, "gdp_million_eur": 18000.0, "_extracted_at": "x"},
                {"country_code": "XX", "reference_year": 2023, "gdp_million_eur": 1000.0, "_extracted_at": "x"},
            ],
            GDP_SCHEMA,
        ),
        "stg_eurostat__population": mock_df(
            spark,
            [
                {"country_code": "DE", "reference_year": 2023, "population_count": 84000000.0},
                {"country_code": "MT", "reference_year": 2023, "population_count": 520000.0},
                {"country_code": "XX", "reference_year": 2023, "population_count": 0.0},
            ],
            POP_SCHEMA,
        ),
        "stg_eurostat__unemployment": mock_df(spark, [], UNEMP_MONTHLY_SCHEMA),
        "stg_eurostat__inflation": mock_df(spark, [], INFL_SCHEMA),
    }
    expect = mock_df(
        spark,
        [
            {"country_code": "DE", "reference_year": 2023, "gdp_per_capita_eur": 47619.047619},
            {"country_code": "MT", "reference_year": 2023, "gdp_per_capita_eur": 34615.384615},
            {"country_code": "XX", "reference_year": 2023, "gdp_per_capita_eur": None},
        ],
        "country_code string, reference_year int, gdp_per_capita_eur double",
    )
    run_unit_test(
        registry,
        spark,
        "int_country_annual_metrics",
        given,
        expect,
        compare_cols=["country_code", "reference_year", "gdp_per_capita_eur"],
    )


def test_unemployment_yoy_change(spark, registry):
    """_intermediate__unit_tests.yml:41-61 — lag-12: first year null,
    second year sees prior-year value."""
    given = {
        "stg_eurostat__unemployment": mock_df(
            spark,
            [
                {"country_code": "DE", "country_name": "Germany", "reference_year": 2022,
                 "reference_month": 6, "reference_date": "2022-06-01", "unemployment_rate_pct": 3.0},
                {"country_code": "DE", "country_name": "Germany", "reference_year": 2023,
                 "reference_month": 6, "reference_date": "2023-06-01", "unemployment_rate_pct": 2.9},
            ],
            UNEMP_MONTHLY_SCHEMA.replace("reference_date date", "reference_date string"),
        ).withColumn("reference_date", __import__("pyspark").sql.functions.to_date("reference_date")),
        "stg_eurostat__inflation": mock_df(spark, [], INFL_SCHEMA),
        "int_country_annual_metrics": mock_df(spark, [], ANNUAL_CTX_SCHEMA),
    }
    expect = mock_df(
        spark,
        [
            {"country_code": "DE", "unemployment_rate_pct": 3.0, "unemployment_rate_prev_year": None},
            {"country_code": "DE", "unemployment_rate_pct": 2.9, "unemployment_rate_prev_year": None},
        ],
        "country_code string, unemployment_rate_pct double, unemployment_rate_prev_year double",
    )
    # The reference's expect block (yml:58-61) claims prev_year=3.0 for
    # two rows 12 months apart, but its model computes a ROW-offset
    # lag(x, 12) — null over 2 rows in DuckDB and Spark alike. We assert
    # the real window semantics here; the dense-spine variant below
    # asserts the 3.0 the reference intended.
    run_unit_test(
        registry,
        spark,
        "int_country_monthly_indicators",
        given,
        expect,
        compare_cols=["country_code", "unemployment_rate_pct", "unemployment_rate_prev_year"],
    )


def test_unemployment_yoy_change_dense(spark, registry):
    """Dense 24-month spine: 2023-06 must see 2022-06's value via lag 12."""
    rows = []
    for year in (2022, 2023):
        for month in range(1, 13):
            rows.append(
                {
                    "country_code": "DE",
                    "country_name": "Germany",
                    "reference_year": year,
                    "reference_month": month,
                    "reference_date": f"{year}-{month:02d}-01",
                    "unemployment_rate_pct": 3.0 if year == 2022 else 2.9,
                }
            )
    from pyspark.sql import functions as F

    given = {
        "stg_eurostat__unemployment": mock_df(
            spark, rows, UNEMP_MONTHLY_SCHEMA.replace("reference_date date", "reference_date string")
        ).withColumn("reference_date", F.to_date("reference_date")),
        "stg_eurostat__inflation": mock_df(spark, [], INFL_SCHEMA),
        "int_country_annual_metrics": mock_df(spark, [], ANNUAL_CTX_SCHEMA),
    }
    ctx = registry.context(spark, mocks=given)
    out = {
        (r["reference_year"], r["reference_month"]): r["unemployment_rate_prev_year"]
        for r in ctx.ref("int_country_monthly_indicators").collect()
    }
    assert out[(2022, 6)] is None
    assert out[(2023, 6)] == 3.0


def test_rolling_average_calculation(spark, registry):
    """_intermediate__unit_tests.yml:68-88 — expanding 12m rolling avg
    over 3 months: 7.0 / 7.1 / 7.1."""
    from pyspark.sql import functions as F

    rows = [
        {"country_code": "FR", "country_name": "France", "reference_year": 2023,
         "reference_month": m, "reference_date": f"2023-0{m}-01", "unemployment_rate_pct": v}
        for m, v in [(1, 7.0), (2, 7.2), (3, 7.1)]
    ]
    given = {
        "stg_eurostat__unemployment": mock_df(
            spark, rows, UNEMP_MONTHLY_SCHEMA.replace("reference_date date", "reference_date string")
        ).withColumn("reference_date", F.to_date("reference_date")),
        "stg_eurostat__inflation": mock_df(spark, [], INFL_SCHEMA),
        "int_country_annual_metrics": mock_df(spark, [], ANNUAL_CTX_SCHEMA),
    }
    ctx = registry.context(spark, mocks=given)
    out = (
        ctx.ref("int_country_monthly_indicators")
        .select("reference_month", F.round("unemployment_rate_12m_avg", 6).alias("avg"))
        .orderBy("reference_month")
        .collect()
    )
    assert [r["avg"] for r in out] == [7.0, 7.1, 7.1]


def test_data_quality_flags(spark, registry):
    """_intermediate__unit_tests.yml:95-134 — 12 unemployment obs →
    complete; 6 inflation obs → incomplete."""
    from pyspark.sql import functions as F

    unemp = [
        {"country_code": "NL", "country_name": "Netherlands", "reference_year": 2023,
         "reference_month": m, "reference_date": f"2023-{m:02d}-01", "unemployment_rate_pct": 3.5}
        for m in range(1, 13)
    ]
    infl = [
        {"country_code": "NL", "reference_year": 2023,
         "reference_date": f"2023-{m:02d}-01", "inflation_rate_mom_pct": 0.5}
        for m in range(1, 7)
    ]
    given = {
        "stg_eurostat__gdp": mock_df(
            spark,
            [{"country_code": "NL", "reference_year": 2023, "gdp_million_eur": 1000000.0, "_extracted_at": "x"}],
            GDP_SCHEMA,
        ),
        "stg_eurostat__population": mock_df(
            spark,
            [{"country_code": "NL", "reference_year": 2023, "population_count": 17500000.0}],
            POP_SCHEMA,
        ),
        "stg_eurostat__unemployment": mock_df(
            spark, unemp, UNEMP_MONTHLY_SCHEMA.replace("reference_date date", "reference_date string")
        ).withColumn("reference_date", F.to_date("reference_date")),
        "stg_eurostat__inflation": mock_df(
            spark, infl, INFL_SCHEMA.replace("reference_date date", "reference_date string")
        ).withColumn("reference_date", F.to_date("reference_date")),
    }
    ctx = registry.context(spark, mocks=given)
    row = ctx.ref("int_country_annual_metrics").collect()[0]
    assert row["country_code"] == "NL"
    assert row["unemployment_observations"] == 12
    assert row["inflation_observations"] == 6
    assert row["has_complete_unemployment_data"] is True
    assert row["has_complete_inflation_data"] is False


def test_unit_failure_reports_diff(spark, registry):
    given = {
        "stg_eurostat__gdp": mock_df(
            spark,
            [{"country_code": "DE", "reference_year": 2023, "gdp_million_eur": 100.0, "_extracted_at": "x"}],
            GDP_SCHEMA,
        ),
        "stg_eurostat__population": mock_df(spark, [], POP_SCHEMA),
        "stg_eurostat__unemployment": mock_df(spark, [], UNEMP_MONTHLY_SCHEMA),
        "stg_eurostat__inflation": mock_df(spark, [], INFL_SCHEMA),
    }
    expect = mock_df(
        spark,
        [{"country_code": "DE", "reference_year": 2023, "gdp_per_capita_eur": 1.0}],
        "country_code string, reference_year int, gdp_per_capita_eur double",
    )
    with pytest.raises(UnitTestFailure):
        run_unit_test(
            registry, spark, "int_country_annual_metrics", given, expect,
            compare_cols=["country_code", "reference_year", "gdp_per_capita_eur"],
        )
