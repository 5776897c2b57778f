"""Semantic metrics layer (reference README.md:226-258) — each metric
cross-checked against DuckDB SQL over the SAME mart rows, so the metric
math is pinned to an independent engine, not to itself."""

from __future__ import annotations

import duckdb
import pytest

from dbt_economic_indicators_eu_spark.models.econ import build_registry
from dbt_economic_indicators_eu_spark.models.semantic import METRICS, query_metrics


@pytest.fixture(scope="module")
def ctx(spark, tmp_path_factory):
    from test_cli import _write_raw

    raw = str(tmp_path_factory.mktemp("raw"))
    _write_raw(spark, raw)
    import os

    reg = build_registry()
    for name in ("raw_gdp", "raw_unemployment", "raw_inflation", "raw_population"):
        path = os.path.join(raw, f"{name}.parquet")
        reg.source(name, lambda s, p=path: s.read.parquet(p))
    return reg.context(spark)


def _duck(df):
    con = duckdb.connect()
    con.register("t", df.toPandas())
    return con


def test_annual_metrics_match_duckdb(spark, ctx):
    out = query_metrics(
        ctx,
        ["total_gdp", "average_gdp_per_capita", "gdp_per_capita_derived", "annual_inflation"],
        group_by=["country_code", "reference_year"],
    ).toPandas()
    con = _duck(ctx.ref("int_country_annual_metrics"))
    exp = con.execute(
        """
        SELECT country_code, reference_year,
               sum(gdp_million_eur) AS total_gdp,
               avg(gdp_per_capita_eur) AS average_gdp_per_capita,
               sum(gdp_million_eur) * 1000000 / sum(population_count) AS gdp_per_capita_derived,
               avg(annual_inflation_rate_pct) AS annual_inflation
        FROM t GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    got = out.sort_values(["country_code", "reference_year"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for col in exp.columns:
        for g, e in zip(got[col].tolist(), exp[col].tolist()):
            if e != e or e is None:  # NaN/NULL: divide-by-absent population
                assert g is None or g != g
            elif isinstance(e, float):
                assert abs(g - e) < 1e-9, (col, g, e)
            else:
                assert g == e, (col, g, e)


def test_gdp_growth_and_cumulative(spark, ctx):
    out = {
        (r["country_code"], r["reference_year"]): r
        for r in query_metrics(
            ctx,
            ["gdp_growth", "cumulative_gdp_growth"],
            group_by=["country_code", "reference_year"],
        ).collect()
    }
    # _write_raw: DE 2022=3900000, 2023=4000000
    de_growth = (4000000.0 - 3900000.0) / 3900000.0 * 100
    assert out[("DE", 2022)]["gdp_growth"] is None  # no prior year
    assert abs(out[("DE", 2023)]["gdp_growth"] - de_growth) < 1e-9
    assert out[("DE", 2022)]["cumulative_gdp_growth"] == 0.0  # vs itself
    assert abs(out[("DE", 2023)]["cumulative_gdp_growth"] - de_growth) < 1e-9


def test_monthly_metrics_and_trend(spark, ctx):
    rows = query_metrics(
        ctx,
        ["unemployment_rate", "unemployment_trend", "monthly_inflation"],
        group_by=["country_code", "reference_date"],
    ).collect()
    assert rows
    by_key = {(r["country_code"], str(r["reference_date"])): r for r in rows}
    # single-reading months: rate == trend seed; trend is the expanding
    # 12m window, so month N's trend == mean of months 1..N
    de = sorted(
        (k[1], v["unemployment_rate"]) for k, v in by_key.items() if k[0] == "DE"
    )
    rates = [v for _, v in de]
    trend_last = by_key[("DE", de[-1][0])]["unemployment_trend"]
    assert abs(trend_last - sum(rates[-12:]) / min(len(rates), 12)) < 1e-9


def test_query_validation(spark, ctx):
    with pytest.raises(ValueError, match="unknown metrics"):
        query_metrics(ctx, ["nope"], group_by=["country_code"])
    with pytest.raises(ValueError, match="mix grains"):
        query_metrics(ctx, ["total_gdp", "unemployment_rate"], group_by=["country_code"])
    with pytest.raises(ValueError, match="time"):
        query_metrics(ctx, ["gdp_growth"], group_by=["country_code"])
    with pytest.raises(ValueError, match="unknown group_by"):
        query_metrics(ctx, ["total_gdp"], group_by=["nope"])


def test_where_filter_and_readme_example(spark, ctx):
    """README.md:292-296: mf query --metrics unemployment_rate
    --group-by country_code,metric_time --where country_code = 'DE'."""
    from pyspark.sql import functions as F

    rows = query_metrics(
        ctx,
        ["unemployment_rate"],
        group_by=["country_code", "reference_date"],
        where=F.col("country_code") == "DE",
    ).collect()
    assert rows and all(r["country_code"] == "DE" for r in rows)


def test_metric_registry_is_the_readme_list():
    assert set(METRICS) == {
        "total_gdp", "average_gdp_per_capita", "gdp_per_capita_derived",
        "gdp_growth", "cumulative_gdp_growth", "unemployment_rate",
        "unemployment_trend", "monthly_inflation", "annual_inflation",
    }
