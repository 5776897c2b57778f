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
    with pytest.raises(ValueError, match="no metrics requested"):
        query_metrics(ctx, [], group_by=["country_code"])
    with pytest.raises(ValueError, match="unknown metrics"):
        query_metrics(ctx, ["nope"], group_by=["country_code"])
    with pytest.raises(ValueError, match="time"):
        query_metrics(ctx, ["gdp_growth"], group_by=["country_code"])
    with pytest.raises(ValueError, match="unknown group_by"):
        query_metrics(ctx, ["total_gdp"], group_by=["nope"])
    # mixed-grain rules (ADVICE r6 #3): a monthly WINDOW metric cannot
    # roll up to the annual grain, and a mixed query runs at annual
    # metric_time — reference_date is not one of its dimensions
    with pytest.raises(ValueError, match="cannot roll up"):
        query_metrics(
            ctx, ["total_gdp", "unemployment_trend"],
            group_by=["country_code", "reference_year"],
        )
    with pytest.raises(ValueError, match="unknown group_by"):
        query_metrics(
            ctx, ["total_gdp", "unemployment_rate"],
            group_by=["country_code", "reference_date"],
        )


def test_mixed_grain_readme_example_matches_duckdb(spark, ctx):
    """The reference README's own documented mixed-grain query
    (README.md:292-296: `mf query --metrics unemployment_rate,
    gdp_growth --group-by country_code,metric_time__year`): monthly
    unemployment_rate rolls up to the annual grain and joins the
    annual YoY growth (ADVICE r6 #3)."""
    out = (
        query_metrics(
            ctx,
            ["unemployment_rate", "gdp_growth"],
            group_by=["country_code", "reference_year"],
        )
        .toPandas()
        .sort_values(["country_code", "reference_year"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("annual", ctx.ref("int_country_annual_metrics").toPandas())
    con.register("monthly", ctx.ref("int_country_monthly_indicators").toPandas())
    exp = con.execute(
        """
        WITH a AS (
          SELECT country_code, reference_year,
                 (sum(gdp_million_eur) - lag(sum(gdp_million_eur)) OVER w)
                   / lag(sum(gdp_million_eur)) OVER w * 100 AS gdp_growth
          FROM annual GROUP BY 1, 2
          WINDOW w AS (PARTITION BY country_code ORDER BY reference_year)
        ),
        m AS (
          SELECT country_code, reference_year,
                 avg(unemployment_rate_pct) AS unemployment_rate
          FROM monthly GROUP BY 1, 2
        )
        SELECT coalesce(a.country_code, m.country_code) AS country_code,
               coalesce(a.reference_year, m.reference_year) AS reference_year,
               m.unemployment_rate, a.gdp_growth
        FROM a FULL OUTER JOIN m USING (country_code, reference_year)
        ORDER BY 1, 2
        """
    ).df()
    assert len(out) == len(exp) > 0
    for col in ("unemployment_rate", "gdp_growth"):
        for g, e in zip(out[col].tolist(), exp[col].tolist()):
            if e != e or e is None:  # first year / grain absent
                assert g is None or g != g, col
            else:
                assert abs(g - e) < 1e-9, (col, g, e)
    # both grains genuinely contributed
    assert exp["unemployment_rate"].notna().any()
    assert exp["gdp_growth"].notna().any()


def test_single_monthly_metric_rolls_up_to_annual(spark, ctx):
    """MetricFlow allows querying a metric at a COARSER time grain, so
    a lone monthly metric grouped by reference_year rolls up exactly
    like the mixed path (code-review r7 finding)."""
    out = {
        (r["country_code"], r["reference_year"]): r["unemployment_rate"]
        for r in query_metrics(
            ctx, ["unemployment_rate"], group_by=["country_code", "reference_year"]
        ).collect()
    }
    con = duckdb.connect()
    con.register("monthly", ctx.ref("int_country_monthly_indicators").toPandas())
    exp = con.execute(
        "SELECT country_code, reference_year, avg(unemployment_rate_pct) "
        "FROM monthly GROUP BY 1, 2"
    ).fetchall()
    assert exp
    for cc, y, v in exp:
        assert abs(out[(cc, y)] - v) < 1e-9
    # a monthly WINDOW metric still cannot roll up, even alone
    with pytest.raises(ValueError, match="cannot roll up"):
        query_metrics(
            ctx, ["unemployment_trend"], group_by=["country_code", "reference_year"]
        )
    # two time dimensions in one query is a contradiction
    with pytest.raises(ValueError, match="two time dimensions"):
        query_metrics(
            ctx, ["unemployment_rate"],
            group_by=["reference_year", "reference_date"],
        )


def test_mixed_grain_where_must_be_shared(spark, ctx):
    """A mixed-grain where on a column only one mart carries fails with
    an actionable ValueError, not a raw AnalysisException."""
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="does not resolve against the annual mart"):
        query_metrics(
            ctx,
            ["total_gdp", "unemployment_rate"],
            group_by=["country_code", "reference_year"],
            where=F.col("reference_date") >= "2023-01-01",
        )


def test_mixed_grain_entity_only(spark, ctx):
    """A mixed query with no time dimension (entity-level rollup of
    both grains) is valid when no window metric is requested."""
    rows = query_metrics(
        ctx, ["total_gdp", "unemployment_rate"], group_by=["country_code"]
    ).collect()
    assert rows
    by_cc = {r["country_code"]: r for r in rows}
    assert by_cc["DE"]["total_gdp"] is not None
    assert by_cc["DE"]["unemployment_rate"] is not None


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


def test_windowed_metrics_match_pandas_on_random_series(spark, ctx):
    """Property-style pin on random data: gdp_growth / cumulative /
    trend over a randomized multi-entity series must equal the pandas
    reference computation (pct_change, cumulative vs first, rolling
    mean) — not just the tiny CLI fixture."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.RandomState(42)
    rows = []
    for cc in ("AA", "BB", "CC"):
        years = range(2000, 2000 + rng.randint(3, 15))
        for y in years:
            rows.append((cc, int(y), float(rng.uniform(100, 10_000))))
    pdf = pd.DataFrame(rows, columns=["country_code", "reference_year", "gdp_million_eur"])

    # mock the annual mart with just the columns the metrics read
    mart = ctx.spark.createDataFrame(
        pdf.assign(population_count=1.0, gdp_per_capita_eur=1.0,
                   annual_inflation_rate_pct=0.0)
    )
    from dbt_economic_indicators_eu_spark.plans.registry import Registry

    reg = Registry()

    @reg.model("int_country_annual_metrics")
    def m(_ctx):
        return mart

    out = query_metrics(
        reg.context(spark),
        ["gdp_growth", "cumulative_gdp_growth"],
        group_by=["country_code", "reference_year"],
    ).toPandas().set_index(["country_code", "reference_year"]).sort_index()

    g = pdf.sort_values(["country_code", "reference_year"]).set_index(
        ["country_code", "reference_year"]
    )["gdp_million_eur"]
    exp_growth = g.groupby(level=0).pct_change() * 100
    exp_cum = (g / g.groupby(level=0).transform("first") - 1) * 100
    for key in g.index:
        got_g, got_c = out.loc[key, "gdp_growth"], out.loc[key, "cumulative_gdp_growth"]
        e_g, e_c = exp_growth.loc[key], exp_cum.loc[key]
        if e_g != e_g:  # NaN: first year
            assert got_g is None or got_g != got_g
        else:
            assert abs(got_g - e_g) < 1e-9
        assert abs(got_c - e_c) < 1e-9


def test_metric_query_plan_is_one_agg_one_window(spark):
    """The scale claim in the module docstring, pinned: one shuffle for
    the groupBy plus at most one window exchange — never a per-metric
    scan or join. Measured over a FLAT mocked mart so the pin sees the
    metric layer alone, not the mart's own build plan."""
    from dbt_economic_indicators_eu_spark.plans.registry import Registry

    mart = spark.createDataFrame(
        [("AA", 2000 + i, 100.0 + i, 1.0, 1.0, 0.0) for i in range(5)],
        "country_code string, reference_year int, gdp_million_eur double, "
        "population_count double, gdp_per_capita_eur double, "
        "annual_inflation_rate_pct double",
    )
    reg = Registry()

    @reg.model("int_country_annual_metrics")
    def m(_ctx):
        return mart

    df = query_metrics(
        reg.context(spark),
        ["total_gdp", "gdp_growth", "cumulative_gdp_growth", "average_gdp_per_capita"],
        group_by=["country_code", "reference_year"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # groupBy shuffle + window shuffle, nothing else
    assert plan.count("Exchange") <= 2, plan
    assert "Join" not in plan
    # windows share one spec → one Window node regardless of metric count
    assert plan.count("Window") == 1, plan
    # map-side partial aggregation before the shuffle
    assert "partial_" in plan.lower() or "HashAggregate" in plan


def test_metric_registry_is_the_readme_list():
    assert set(METRICS) == {
        "total_gdp", "average_gdp_per_capita", "gdp_per_capita_derived",
        "gdp_growth", "cumulative_gdp_growth", "unemployment_rate",
        "unemployment_trend", "monthly_inflation", "annual_inflation",
    }
