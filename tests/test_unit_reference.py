"""Port of the reference's 4 dbt unit tests
(models/intermediate/_intermediate__unit_tests.yml:8-134), driven from
the PACKAGE definitions (models/unit_tests.py) — the same data the CLI
test verb runs (`test --select test_type:unit`) — plus two variants the
yml form cannot express: a dense-spine window-semantics check and a
negative case pinning the failure report.
"""

from __future__ import annotations

import pytest

from dbt_economic_indicators_eu_spark.models.econ import build_registry
from dbt_economic_indicators_eu_spark.models.unit_tests import (
    REFERENCE_UNIT_TESTS,
    build_given,
    run_reference_unit_tests,
)
from dbt_economic_indicators_eu_spark.testing.unit import (
    UnitTestFailure,
    mock_df,
    run_unit_test,
)

GDP_SCHEMA = "country_code string, reference_year int, gdp_million_eur double, _extracted_at string"
POP_SCHEMA = "country_code string, reference_year int, population_count double"
UNEMP_MONTHLY_SCHEMA = (
    "country_code string, country_name string, reference_year int, reference_month int, "
    "reference_date string, unemployment_rate_pct double"
)
INFL_SCHEMA = (
    "country_code string, reference_year int, reference_date string, inflation_rate_mom_pct double"
)
ANNUAL_CTX_SCHEMA = (
    "country_code string, reference_year int, gdp_million_eur double, "
    "population_count double, gdp_per_capita_eur double"
)


@pytest.fixture(scope="module")
def registry():
    return build_registry()


@pytest.mark.parametrize(
    "defn", REFERENCE_UNIT_TESTS, ids=[t["name"] for t in REFERENCE_UNIT_TESTS]
)
def test_reference_unit_test(spark, registry, defn):
    """Each reference unit test, from the package definition the CLI
    runs — a failure here and a `test` verb failure are the same bug."""
    given = {name: build_given(spark, spec) for name, spec in defn["given"].items()}
    expect = build_given(spark, defn["expect"])
    run_unit_test(
        registry, spark, defn["model"], given, expect,
        compare_cols=defn["compare_cols"],
    )


def test_cli_runner_reports_all_green(spark, registry):
    report = run_reference_unit_tests(registry, spark)
    assert len(report) == len(REFERENCE_UNIT_TESTS)
    assert all(r["passed"] for r in report), report


def test_unemployment_yoy_change_dense(spark, registry):
    """Dense 24-month spine: 2023-06 must see 2022-06's value via
    lag 12 — the behavior the reference's expect block INTENDED (its
    2-row given makes the row-offset lag null; see
    models/unit_tests.py module docstring)."""
    from pyspark.sql import functions as F

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
    given = {
        "stg_eurostat__unemployment": mock_df(
            spark, rows, UNEMP_MONTHLY_SCHEMA
        ).withColumn("reference_date", F.to_date("reference_date")),
        "stg_eurostat__inflation": mock_df(spark, [], INFL_SCHEMA).withColumn(
            "reference_date", F.to_date("reference_date")
        ),
        "int_country_annual_metrics": mock_df(spark, [], ANNUAL_CTX_SCHEMA),
    }
    ctx = registry.context(spark, mocks=given)
    out = {
        (r["reference_year"], r["reference_month"]): r["unemployment_rate_prev_year"]
        for r in ctx.ref("int_country_monthly_indicators").collect()
    }
    assert out[(2022, 6)] is None
    assert out[(2023, 6)] == 3.0


def test_unit_failure_reports_diff(spark, registry):
    given = {
        "stg_eurostat__gdp": mock_df(
            spark,
            [{"country_code": "DE", "reference_year": 2023, "gdp_million_eur": 100.0, "_extracted_at": "x"}],
            GDP_SCHEMA,
        ),
        "stg_eurostat__population": mock_df(spark, [], POP_SCHEMA),
        "stg_eurostat__unemployment": mock_df(
            spark, [], UNEMP_MONTHLY_SCHEMA
        ).withColumn("reference_date", __import__("pyspark").sql.functions.to_date("reference_date")),
        "stg_eurostat__inflation": mock_df(spark, [], INFL_SCHEMA).withColumn(
            "reference_date", __import__("pyspark").sql.functions.to_date("reference_date")
        ),
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


def test_unit_float_tol_zero_is_exact_compare(spark, registry):
    """float_tol=0 means exact float comparison — it must not crash on
    log10(0) and must flag a tiny difference that default rounding
    would absorb."""
    import pytest

    from dbt_economic_indicators_eu_spark.testing.unit import (
        UnitTestFailure,
        run_unit_test,
    )

    reg = type(registry)()

    @reg.model("m")
    def m(ctx):
        return spark.createDataFrame([(0.1000000001,)], "v double")

    expect = spark.createDataFrame([(0.1,)], "v double")
    # default tolerance rounds both to 6 decimals -> passes
    run_unit_test(reg, spark, "m", given={}, expect=expect)
    # exact compare flags the 1e-10 difference
    with pytest.raises(UnitTestFailure):
        run_unit_test(reg, spark, "m", given={}, expect=expect, float_tol=0)
