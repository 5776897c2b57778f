"""The reference's dbt 1.8 unit tests as package data — OP-TEST-UNIT.

Reference: ``models/intermediate/_intermediate__unit_tests.yml`` (4
tests). dbt runs these via ``dbt test --select "test_type:unit"``; the
CLI test verb runs them through ``run_reference_unit_tests`` so a
reference user gets the same surface. ``tests/test_unit_reference.py``
drives the same definitions per-test (plus window-semantics variants).

Mocks carry only the columns each model actually reads — the builders
``select`` explicit columns, so narrower given-rows are equivalent to
dbt's full-row mocks. Dates ride in as strings and are cast per
``date_cols`` (a literal-row frame cannot carry Python dates portably).

Deviation, documented: the reference's ``test_unemployment_yoy_change``
expect block (yml:58-61) claims prev_year=3.0 for two rows 12 months
apart, but its model computes a ROW-offset ``lag(x, 12)`` — null over 2
rows in DuckDB and Spark alike. The definition here asserts the real
window semantics (both null); the dense-spine pytest variant asserts
the 3.0 the reference intended on a 24-month spine.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

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

_EMPTY_UNEMP = {"rows": [], "schema": UNEMP_MONTHLY_SCHEMA, "date_cols": ["reference_date"]}
_EMPTY_INFL = {"rows": [], "schema": INFL_SCHEMA, "date_cols": ["reference_date"]}
_EMPTY_ANNUAL = {"rows": [], "schema": ANNUAL_CTX_SCHEMA}


def _unemp_rows(spec: list[tuple]) -> list[dict]:
    return [
        {
            "country_code": cc, "country_name": cn, "reference_year": y,
            "reference_month": m, "reference_date": f"{y}-{m:02d}-01",
            "unemployment_rate_pct": v,
        }
        for cc, cn, y, m, v in spec
    ]


REFERENCE_UNIT_TESTS: list[dict[str, Any]] = [
    {
        # _intermediate__unit_tests.yml:8-34 — normal calc, zero
        # population → null (not a divide-by-zero error), null-safe
        "name": "test_gdp_per_capita_calculation",
        "model": "int_country_annual_metrics",
        "given": {
            "stg_eurostat__gdp": {
                "rows": [
                    {"country_code": "DE", "reference_year": 2023, "gdp_million_eur": 4000000.0, "_extracted_at": "x"},
                    {"country_code": "MT", "reference_year": 2023, "gdp_million_eur": 18000.0, "_extracted_at": "x"},
                    {"country_code": "XX", "reference_year": 2023, "gdp_million_eur": 1000.0, "_extracted_at": "x"},
                ],
                "schema": GDP_SCHEMA,
            },
            "stg_eurostat__population": {
                "rows": [
                    {"country_code": "DE", "reference_year": 2023, "population_count": 84000000.0},
                    {"country_code": "MT", "reference_year": 2023, "population_count": 520000.0},
                    {"country_code": "XX", "reference_year": 2023, "population_count": 0.0},
                ],
                "schema": POP_SCHEMA,
            },
            "stg_eurostat__unemployment": _EMPTY_UNEMP,
            "stg_eurostat__inflation": _EMPTY_INFL,
        },
        "expect": {
            "rows": [
                {"country_code": "DE", "reference_year": 2023, "gdp_per_capita_eur": 47619.047619},
                {"country_code": "MT", "reference_year": 2023, "gdp_per_capita_eur": 34615.384615},
                {"country_code": "XX", "reference_year": 2023, "gdp_per_capita_eur": None},
            ],
            "schema": "country_code string, reference_year int, gdp_per_capita_eur double",
        },
        "compare_cols": ["country_code", "reference_year", "gdp_per_capita_eur"],
    },
    {
        # _intermediate__unit_tests.yml:41-61 — see module docstring for
        # the documented expect-block deviation (row-offset lag 12)
        "name": "test_unemployment_yoy_change",
        "model": "int_country_monthly_indicators",
        "given": {
            "stg_eurostat__unemployment": {
                "rows": _unemp_rows([
                    ("DE", "Germany", 2022, 6, 3.0),
                    ("DE", "Germany", 2023, 6, 2.9),
                ]),
                "schema": UNEMP_MONTHLY_SCHEMA,
                "date_cols": ["reference_date"],
            },
            "stg_eurostat__inflation": _EMPTY_INFL,
            "int_country_annual_metrics": _EMPTY_ANNUAL,
        },
        "expect": {
            "rows": [
                {"country_code": "DE", "unemployment_rate_pct": 3.0, "unemployment_rate_prev_year": None},
                {"country_code": "DE", "unemployment_rate_pct": 2.9, "unemployment_rate_prev_year": None},
            ],
            "schema": "country_code string, unemployment_rate_pct double, unemployment_rate_prev_year double",
        },
        "compare_cols": ["country_code", "unemployment_rate_pct", "unemployment_rate_prev_year"],
    },
    {
        # _intermediate__unit_tests.yml:68-88 — expanding 12m rolling
        # avg over 3 months: 7.0 / 7.1 / 7.1
        "name": "test_rolling_average_calculation",
        "model": "int_country_monthly_indicators",
        "given": {
            "stg_eurostat__unemployment": {
                "rows": _unemp_rows([
                    ("FR", "France", 2023, 1, 7.0),
                    ("FR", "France", 2023, 2, 7.2),
                    ("FR", "France", 2023, 3, 7.1),
                ]),
                "schema": UNEMP_MONTHLY_SCHEMA,
                "date_cols": ["reference_date"],
            },
            "stg_eurostat__inflation": _EMPTY_INFL,
            "int_country_annual_metrics": _EMPTY_ANNUAL,
        },
        "expect": {
            "rows": [
                {"country_code": "FR", "reference_month": 1, "unemployment_rate_12m_avg": 7.0},
                {"country_code": "FR", "reference_month": 2, "unemployment_rate_12m_avg": 7.1},
                {"country_code": "FR", "reference_month": 3, "unemployment_rate_12m_avg": 7.1},
            ],
            "schema": "country_code string, reference_month int, unemployment_rate_12m_avg double",
        },
        "compare_cols": ["country_code", "reference_month", "unemployment_rate_12m_avg"],
    },
    {
        # _intermediate__unit_tests.yml:95-134 — 12 unemployment obs →
        # complete; 6 inflation obs → incomplete
        "name": "test_data_quality_flags",
        "model": "int_country_annual_metrics",
        "given": {
            "stg_eurostat__gdp": {
                "rows": [{"country_code": "NL", "reference_year": 2023, "gdp_million_eur": 1000000.0, "_extracted_at": "x"}],
                "schema": GDP_SCHEMA,
            },
            "stg_eurostat__population": {
                "rows": [{"country_code": "NL", "reference_year": 2023, "population_count": 17500000.0}],
                "schema": POP_SCHEMA,
            },
            "stg_eurostat__unemployment": {
                "rows": _unemp_rows(
                    [("NL", "Netherlands", 2023, m, 3.5) for m in range(1, 13)]
                ),
                "schema": UNEMP_MONTHLY_SCHEMA,
                "date_cols": ["reference_date"],
            },
            "stg_eurostat__inflation": {
                "rows": [
                    {"country_code": "NL", "reference_year": 2023,
                     "reference_date": f"2023-{m:02d}-01", "inflation_rate_mom_pct": 0.5}
                    for m in range(1, 7)
                ],
                "schema": INFL_SCHEMA,
                "date_cols": ["reference_date"],
            },
        },
        "expect": {
            "rows": [
                {"country_code": "NL", "unemployment_observations": 12,
                 "inflation_observations": 6,
                 "has_complete_unemployment_data": True,
                 "has_complete_inflation_data": False},
            ],
            "schema": (
                "country_code string, unemployment_observations bigint, "
                "inflation_observations bigint, has_complete_unemployment_data boolean, "
                "has_complete_inflation_data boolean"
            ),
        },
        "compare_cols": [
            "country_code", "unemployment_observations", "inflation_observations",
            "has_complete_unemployment_data", "has_complete_inflation_data",
        ],
    },
]


def build_given(spark: SparkSession, spec: dict) -> DataFrame:
    """Materialize one given/expect spec: literal rows + explicit schema,
    with string date columns cast afterwards."""
    from pyspark.sql import functions as F

    from ..testing.unit import mock_df

    df = mock_df(spark, spec["rows"], spec["schema"])
    for c in spec.get("date_cols", ()):
        df = df.withColumn(c, F.to_date(c))
    return df


def run_reference_unit_tests(
    registry, spark: SparkSession, models: set[str] | None = None
) -> list[dict]:
    """Run the reference unit tests (optionally scoped to ``models`` —
    dbt attaches each unit test to its model-under-test); one report
    row per test (``passed`` + failure detail), never raising — the
    CLI aggregates into its exit code like dbt test. A non-compare
    failure (e.g. a renamed model column breaking the select) is
    reported as a failed row with the exception text, like dbt's ERROR
    status — it must not abort the remaining tests or the singular
    layer."""
    from ..testing.unit import UnitTestFailure, run_unit_test

    report = []
    for t in REFERENCE_UNIT_TESTS:
        if models is not None and t["model"] not in models:
            continue
        detail = None
        try:
            given = {name: build_given(spark, spec) for name, spec in t["given"].items()}
            expect = build_given(spark, t["expect"])
            run_unit_test(
                registry, spark, t["model"], given, expect,
                compare_cols=t["compare_cols"],
            )
        except UnitTestFailure as e:
            detail = str(e)
        except Exception as e:  # noqa: BLE001 — dbt ERROR-status parity
            detail = f"ERROR: {type(e).__name__}: {e}"
        report.append(
            {"name": t["name"], "model": t["model"], "passed": detail is None, "detail": detail}
        )
    return report
