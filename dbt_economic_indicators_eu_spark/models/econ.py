"""The reference's model DAG (SURVEY §1.4), re-expressed as registry
models: 4 staging views → 2 intermediate views → 3 marts (+ SCD2
snapshot source). Each builder returns a lazy DataFrame; `ctx.ref`
composes them into one Catalyst plan per materialized output.

Semantics per reference file (cited per model); column names match the
reference exactly so its unit tests (_intermediate__unit_tests.yml) can
be ported verbatim (testing/unit.py + tests/test_unit_reference.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.expressions import surrogate_key
from ..plans.registry import Context, Registry

_SEED_DIR = os.path.join(os.path.dirname(__file__), "..", "sources", "seeds")

COUNTRY_METADATA_SCHEMA = StructType(
    [
        StructField("country_code", StringType()),  # varchar(2) in dbt_project.yml:58-63
        StructField("country_name", StringType()),  # varchar(100)
        StructField("eu_member_since", DateType()),
        StructField("eurozone_member", BooleanType()),
        StructField("region", StringType()),
        StructField("subregion", StringType()),
    ]
)


def load_seed(spark: SparkSession, name: str = "country_metadata") -> DataFrame:
    """OP-SRC-SEED: typed CSV seed load (reference seeds/country_metadata.csv
    + declared column_types dbt_project.yml:55-63)."""
    path = os.path.join(_SEED_DIR, f"{name}.csv")
    return spark.read.csv(path, header=True, schema=COUNTRY_METADATA_SCHEMA)


def _staging_monthly(src: DataFrame, key_name: str, measure_name: str, extra: list[str]) -> DataFrame:
    """Shared monthly staging shape (stg_eurostat__unemployment.sql:22-61,
    __inflation.sql:22-54): rename, substr year/month parse, make_date,
    null/length filters, surrogate key."""
    year = F.substring("time_code", 1, 4).cast("int")
    month = F.substring("time_code", 6, 2).cast("int")
    return src.filter(
        F.col("value").isNotNull()
        & F.col("time_code").isNotNull()
        & F.col("geo_code").isNotNull()
        & (F.length("time_code") >= 7)
    ).select(
        surrogate_key(F.col("geo_code"), F.col("time_code")).alias(key_name),
        F.col("geo_code").alias("country_code"),
        F.col("geo_label").alias("country_name"),
        F.col("time_code").alias("period_code"),
        year.alias("reference_year"),
        month.alias("reference_month"),
        F.make_date(year, month, F.lit(1)).alias("reference_date"),
        F.col("value").alias(measure_name),
        *[F.col(c) for c in extra],
        F.col("dataset_code").alias("source_dataset"),
        F.col("extracted_at").alias("_extracted_at"),
    )


# the vars that gate the staging filter — exactly the three the
# reference declares (dbt_project.yml:20-26); other run-level vars
# (e.g. the engine's injectable ``now`` clock) are inert here, like
# dbt leaves unconsumed vars inert (ADVICE r6 #1)
_FILTER_VARS = ("start_year", "end_year", "focus_countries")


def _apply_project_vars(ctx: Context, df: DataFrame) -> DataFrame:
    """Project-vars filter (reference ``dbt_project.yml:20-26`` —
    ``start_year: 2010``, ``end_year: 2024``, ``focus_countries``).

    The reference DECLARES these vars but no model consumes them via
    ``var()`` (grep-verified), so default behavior must match the
    reference byte-for-byte: with no run-level filter vars set at all,
    no filter is applied (the declared defaults are as inert here as
    they are in the reference). When a run passes at least one of
    start_year / end_year / focus_countries (CLI ``--vars`` / API
    ``vars=``), the filter activates and the unspecified ones fall
    back to the project-declared defaults via dbt's var() layering
    (run override > dbt_project.yml default) — so a partial
    ``--vars '{"focus_countries": ["DE"]}'`` run gets the declared
    2010–2024 year range, not an unbounded one. An UNRELATED run-level
    var (a typo'd key, the ``now`` clock) does NOT activate the filter
    — dbt leaves unconsumed vars inert (ADVICE r6 #1). The filter
    lands at the staging SELECT, so Catalyst pushes it into the
    raw-source scan (partition/row-group pruning at 100 TB, not a
    post-join filter)."""
    if not any(k in ctx.vars for k in _FILTER_VARS):
        return df
    start = ctx.var("start_year")
    end = ctx.var("end_year")
    focus = ctx.var("focus_countries")
    if start is not None:
        df = df.filter(F.col("reference_year") >= int(start))
    if end is not None:
        df = df.filter(F.col("reference_year") <= int(end))
    if focus is not None:
        # a lone country string is a plausible hand-typed form;
        # list('DE') would silently explode it into ['D', 'E'] and
        # filter the whole DAG to nothing — accept it, reject other
        # non-list shapes loudly
        if isinstance(focus, str):
            focus = [focus]
        if not isinstance(focus, (list, tuple, set)):
            raise TypeError(
                f"focus_countries must be a list of country codes, got {focus!r}"
            )
        df = df.filter(F.col("country_code").isin(list(focus)))
    return df


# ---- enforced mart contracts (reference `contract: enforced: true`,
# dim_country.sql:5 / fct_economic_indicators.sql:7 /
# rpt_annual_economic_summary.sql:5; declared columns + data_types in
# _marts__models.yml). dbt fails the build when the model's output
# schema deviates; Context.ref enforces these on the ANALYZED plan
# before any write (testing/contracts.py). Types are this engine's
# mapping of the yml's DuckDB types: varchar→string, "timestamp with
# time zone"→timestamp (Spark TIMESTAMP is LTZ), and the rank columns
# are int (Spark rank()) where DuckDB ranks are bigint. The yml's
# `_dbt_invocation_id` (fct) is dbt-runtime lineage metadata with no
# equivalent here and is deliberately not part of the schema.
_CONTRACT_TYPES = {
    "string": StringType(),
    "date": DateType(),
    "boolean": BooleanType(),
    "int": IntegerType(),
    "bigint": LongType(),
    "double": DoubleType(),
    "timestamp": TimestampType(),
}


def _contract(ddl: str) -> StructType:
    """Pure-Python DDL-ish parser ("name type, ..."): StructType.fromDDL
    needs a live SparkContext, which does not exist at module import."""
    fields = []
    for part in ddl.split(","):
        name, typ = part.split()
        fields.append(StructField(name, _CONTRACT_TYPES[typ]))
    return StructType(fields)


_DIM_COUNTRY_CONTRACT = _contract(
    "country_key string, country_code string, country_name string, "
    "eu_member_since date, eurozone_member boolean, region string, "
    "subregion string, eu_status string, earliest_gdp_year int, "
    "latest_gdp_year int, years_of_gdp_data bigint, _loaded_at timestamp"
)

_FCT_CONTRACT = _contract(
    "indicator_key string, country_code string, country_key string, "
    "reference_year int, reference_month int, reference_date date, "
    "unemployment_rate_pct double, inflation_rate_mom_pct double, "
    "unemployment_rate_prev_month double, unemployment_rate_prev_year double, "
    "unemployment_rate_12m_avg double, inflation_rate_12m_avg double, "
    "unemployment_mom_change double, unemployment_yoy_change double, "
    "annual_gdp_million_eur double, annual_population_count double, "
    "annual_gdp_per_capita_eur double, _loaded_at timestamp"
)

_RPT_CONTRACT = _contract(
    "summary_key string, country_code string, country_key string, "
    "reference_year int, gdp_million_eur double, population_count double, "
    "gdp_per_capita_eur double, avg_unemployment_rate_pct double, "
    "annual_inflation_rate_pct double, gdp_rank int, gdp_per_capita_rank int, "
    "unemployment_rank int, inflation_rank int, gdp_yoy_growth_pct double, "
    "unemployment_yoy_change_pp double, inflation_yoy_change_pp double, "
    "share_of_eu_gdp_pct double, share_of_eu_population_pct double, "
    "gdp_per_capita_vs_eu_avg double, unemployment_vs_eu_avg_pp double, "
    "inflation_vs_eu_avg_pp double, has_complete_unemployment_data boolean, "
    "has_complete_inflation_data boolean, country_name string, "
    "eu_status string, eurozone_member boolean, region string, "
    "_loaded_at timestamp"
)


def build_registry() -> Registry:
    reg = Registry()

    # project-declared var defaults (reference dbt_project.yml:20-26);
    # consumed by _apply_project_vars only when a run passes vars —
    # see its docstring for the inert-by-default parity rationale
    reg.declare_vars(
        {
            "start_year": 2010,
            "end_year": 2024,
            "focus_countries": ["DE", "FR", "IT", "ES", "NL", "BE", "AT", "PL"],
        }
    )

    # ---- source declarations (reference _sources.yml) ---------------
    # column tests (geo_code/time_code not_null on every raw table,
    # _sources.yml:17-24 per table) + freshness policy (warn 7d /
    # error 30d on extracted_at, _sources.yml:27-30). Loaders are bound
    # by the runner (CLI --raw-dir, tests, REST ingest).
    for _src in ("raw_gdp", "raw_unemployment", "raw_inflation", "raw_population"):
        reg.source(
            _src,
            loaded_at_field="extracted_at",
            warn_after_days=7,
            error_after_days=30,
            tests=(("not_null", "geo_code"), ("not_null", "time_code")),
        )

    # ---- staging views (1:1 with reference models/staging/*.sql) ----
    @reg.model(
        "stg_eurostat__gdp",
        tags=("staging", "eurostat"),  # dbt_project.yml:36-37
        # _staging__models.yml:9-29
        tests=(
            ("unique", "gdp_key"),
            ("not_null", "gdp_key"),
            ("not_null", "country_code"),
            ("not_null", "reference_year"),
            ("not_null", "gdp_million_eur"),
        ),
    )
    def stg_gdp(ctx: Context) -> DataFrame:
        """stg_eurostat__gdp.sql:19-50 — rename/cast/filter/key."""
        src = ctx.source("raw_gdp")
        year = F.col("time_code").cast("int")
        return _apply_project_vars(ctx, src.filter(
            F.col("value").isNotNull() & F.col("time_code").isNotNull() & F.col("geo_code").isNotNull()
        ).select(
            surrogate_key(F.col("geo_code"), F.col("time_code")).alias("gdp_key"),
            F.col("geo_code").alias("country_code"),
            F.col("geo_label").alias("country_name"),
            F.col("time_code").alias("year_code"),
            year.alias("reference_year"),
            F.make_date(year, F.lit(1), F.lit(1)).alias("reference_date"),
            F.col("value").alias("gdp_million_eur"),
            F.col("unit_code"),
            F.col("unit_label").alias("unit_description"),
            F.col("na_item_code").alias("national_accounts_item_code"),
            F.col("na_item_label").alias("national_accounts_item"),
            F.col("dataset_code").alias("source_dataset"),
            F.col("extracted_at").alias("_extracted_at"),
        ))

    @reg.model(
        "stg_eurostat__unemployment",
        tags=("staging", "eurostat"),
        # _staging__models.yml:31-52
        tests=(
            ("unique", "unemployment_key"),
            ("not_null", "unemployment_key"),
            ("not_null", "country_code"),
            ("not_null", "reference_date"),
            ("not_null", "unemployment_rate_pct"),
        ),
    )
    def stg_unemployment(ctx: Context) -> DataFrame:
        """stg_eurostat__unemployment.sql:22-61."""
        return _apply_project_vars(ctx, _staging_monthly(
            ctx.source("raw_unemployment"), "unemployment_key", "unemployment_rate_pct", []
        ))

    @reg.model(
        "stg_eurostat__inflation",
        tags=("staging", "eurostat"),
        # _staging__models.yml:54-73
        tests=(
            ("unique", "inflation_key"),
            ("not_null", "inflation_key"),
            ("not_null", "country_code"),
            ("not_null", "reference_date"),
        ),
    )
    def stg_inflation(ctx: Context) -> DataFrame:
        """stg_eurostat__inflation.sql:22-54."""
        return _apply_project_vars(ctx, _staging_monthly(
            ctx.source("raw_inflation"), "inflation_key", "inflation_rate_mom_pct", []
        ))

    @reg.model(
        "stg_eurostat__population",
        tags=("staging", "eurostat"),
        # _staging__models.yml:75-97
        tests=(
            ("unique", "population_key"),
            ("not_null", "population_key"),
            ("not_null", "country_code"),
            ("not_null", "reference_year"),
            ("not_null", "population_count"),
        ),
    )
    def stg_population(ctx: Context) -> DataFrame:
        """stg_eurostat__population.sql:22-50 — annual grain."""
        src = ctx.source("raw_population")
        year = F.col("time_code").cast("int")
        return _apply_project_vars(ctx, src.filter(
            F.col("value").isNotNull() & F.col("time_code").isNotNull() & F.col("geo_code").isNotNull()
        ).select(
            surrogate_key(F.col("geo_code"), F.col("time_code")).alias("population_key"),
            F.col("geo_code").alias("country_code"),
            F.col("geo_label").alias("country_name"),
            F.col("time_code").alias("year_code"),
            year.alias("reference_year"),
            F.make_date(year, F.lit(1), F.lit(1)).alias("reference_date"),
            F.col("value").alias("population_count"),
            F.col("dataset_code").alias("source_dataset"),
            F.col("extracted_at").alias("_extracted_at"),
        ))

    # ---- seed -------------------------------------------------------
    @reg.model("country_metadata")
    def country_metadata(ctx: Context) -> DataFrame:
        return load_seed(ctx.spark)

    # ---- intermediate views ----------------------------------------
    @reg.model(
        "int_country_annual_metrics",
        tags=("intermediate",),  # dbt_project.yml:40-42
        # _intermediate__models.yml:8-22
        tests=(
            ("unique", "annual_metrics_key"),
            ("not_null", "annual_metrics_key"),
            ("not_null", "country_code"),
            ("not_null", "reference_year"),
        ),
    )
    def int_annual(ctx: Context) -> DataFrame:
        """int_country_annual_metrics.sql:20-108 — annual agg of monthly
        series + 3-way left join + gdp-per-capita with div-by-zero→null."""
        gdp = ctx.ref("stg_eurostat__gdp").select(
            "country_code", "reference_year", "gdp_million_eur", "_extracted_at"
        )
        pop = ctx.ref("stg_eurostat__population").select(
            "country_code", "reference_year", "population_count"
        )
        unemp = (
            ctx.ref("stg_eurostat__unemployment")
            .groupBy("country_code", "reference_year")
            .agg(
                F.avg("unemployment_rate_pct").alias("avg_unemployment_rate_pct"),
                F.min("unemployment_rate_pct").alias("min_unemployment_rate_pct"),
                F.max("unemployment_rate_pct").alias("max_unemployment_rate_pct"),
                F.count(F.lit(1)).alias("unemployment_observations"),
            )
        )
        infl = (
            ctx.ref("stg_eurostat__inflation")
            .groupBy("country_code", "reference_year")
            .agg(
                F.sum("inflation_rate_mom_pct").alias("annual_inflation_rate_pct"),
                F.avg("inflation_rate_mom_pct").alias("avg_monthly_inflation_pct"),
                F.count(F.lit(1)).alias("inflation_observations"),
            )
        )
        keys = ["country_code", "reference_year"]
        joined = (
            gdp.join(pop, keys, "left").join(unemp, keys, "left").join(infl, keys, "left")
        )
        gdp_per_capita = F.when(
            F.col("population_count") > 0,
            (F.col("gdp_million_eur") * 1000000.0) / F.col("population_count"),
        )
        return joined.select(
            surrogate_key(F.col("country_code"), F.col("reference_year")).alias(
                "annual_metrics_key"
            ),
            "country_code",
            "reference_year",
            "gdp_million_eur",
            "population_count",
            gdp_per_capita.alias("gdp_per_capita_eur"),
            "avg_unemployment_rate_pct",
            "min_unemployment_rate_pct",
            "max_unemployment_rate_pct",
            "unemployment_observations",
            "annual_inflation_rate_pct",
            "avg_monthly_inflation_pct",
            "inflation_observations",
            F.coalesce(F.col("unemployment_observations") == 12, F.lit(False)).alias(
                "has_complete_unemployment_data"
            ),
            F.coalesce(F.col("inflation_observations") == 12, F.lit(False)).alias(
                "has_complete_inflation_data"
            ),
            "_extracted_at",
        )

    @reg.model(
        "int_country_monthly_indicators",
        tags=("intermediate",),
        # _intermediate__models.yml:38-56
        tests=(
            ("unique", "monthly_metrics_key"),
            ("not_null", "monthly_metrics_key"),
            ("not_null", "country_code"),
            ("not_null", "reference_date"),
        ),
    )
    def int_monthly(ctx: Context) -> DataFrame:
        """int_country_monthly_indicators.sql:20-123 — monthly spine +
        joins + lag1/lag12/rolling-12 windows.

        The spine deliberately derives from UNEMPLOYMENT rows only —
        faithful to the reference (int_country_monthly_indicators.sql
        :52-59 "Create complete monthly spine from unemployment
        data"): a country-month present only in the inflation feed is
        dropped by design, matching dbt-side behavior."""
        unemp = ctx.ref("stg_eurostat__unemployment").select(
            "country_code",
            "country_name",
            "reference_year",
            "reference_month",
            "reference_date",
            "unemployment_rate_pct",
        )
        infl = ctx.ref("stg_eurostat__inflation").select(
            "country_code", "reference_date", "inflation_rate_mom_pct"
        )
        annual = ctx.ref("int_country_annual_metrics").select(
            "country_code",
            "reference_year",
            F.col("gdp_million_eur").alias("annual_gdp_million_eur"),
            F.col("population_count").alias("annual_population_count"),
            F.col("gdp_per_capita_eur").alias("annual_gdp_per_capita_eur"),
        )
        spine = unemp.select(
            "country_code", "country_name", "reference_year", "reference_month", "reference_date"
        ).distinct()
        joined = (
            spine.join(unemp.select("country_code", "reference_date", "unemployment_rate_pct"),
                       ["country_code", "reference_date"], "left")
            .join(infl, ["country_code", "reference_date"], "left")
            .join(annual, ["country_code", "reference_year"], "left")
        )
        w = Window.partitionBy("country_code").orderBy("reference_date")
        w12 = w.rowsBetween(-11, Window.currentRow)
        return joined.select(
            surrogate_key(F.col("country_code"), F.col("reference_date")).alias(
                "monthly_metrics_key"
            ),
            "country_code",
            "country_name",
            "reference_year",
            "reference_month",
            "reference_date",
            "unemployment_rate_pct",
            "inflation_rate_mom_pct",
            "annual_gdp_million_eur",
            "annual_population_count",
            "annual_gdp_per_capita_eur",
            F.lag("unemployment_rate_pct").over(w).alias("unemployment_rate_prev_month"),
            F.lag("inflation_rate_mom_pct").over(w).alias("inflation_rate_prev_month"),
            F.lag("unemployment_rate_pct", 12).over(w).alias("unemployment_rate_prev_year"),
            F.avg("unemployment_rate_pct").over(w12).alias("unemployment_rate_12m_avg"),
            F.avg("inflation_rate_mom_pct").over(w12).alias("inflation_rate_12m_avg"),
        )

    # ---- marts ------------------------------------------------------
    @reg.model(
        "dim_country",
        materialization="table",
        contract=_DIM_COUNTRY_CONTRACT,  # _marts__models.yml:9-11
        tags=("marts", "reporting"),  # dbt_project.yml:44-46
        # _marts__models.yml:13-30
        tests=(
            ("unique", "country_key"),
            ("not_null", "country_key"),
            ("unique", "country_code"),
            ("not_null", "country_code"),
        ),
    )
    def dim_country(ctx: Context) -> DataFrame:
        """dim_country.sql:17-77 — seed join + first_value-latest name +
        availability agg (OP-AGG-AVAIL: countDistinct)."""
        seed = ctx.ref("country_metadata")
        gdp = ctx.ref("stg_eurostat__gdp")
        names = gdp.select(
            "country_code",
            F.first_value("country_name")
            .over(Window.partitionBy("country_code").orderBy(F.col("reference_year").desc()))
            .alias("country_name_eurostat"),
        ).distinct()
        avail = gdp.groupBy("country_code").agg(
            F.min("reference_year").alias("earliest_gdp_year"),
            F.max("reference_year").alias("latest_gdp_year"),
            F.countDistinct("reference_year").alias("years_of_gdp_data"),
        )
        eu_status = (
            F.when(F.col("eurozone_member"), "Eurozone")
            .when(F.col("eu_member_since").isNotNull(), "EU (non-Euro)")
            .otherwise("Non-EU")
        )
        return (
            seed.alias("cs")
            .join(F.broadcast(names.alias("cn")), "country_code", "left")
            .join(F.broadcast(avail.alias("da")), "country_code", "left")
            .select(
                surrogate_key(F.col("country_code")).alias("country_key"),
                "country_code",
                F.coalesce(F.col("cs.country_name"), F.col("country_name_eurostat")).alias(
                    "country_name"
                ),
                "eu_member_since",
                "eurozone_member",
                "region",
                "subregion",
                eu_status.alias("eu_status"),
                "earliest_gdp_year",
                "latest_gdp_year",
                "years_of_gdp_data",
                F.current_timestamp().alias("_loaded_at"),
            )
        )

    @reg.model(
        "fct_economic_indicators",
        materialization="incremental",
        contract=_FCT_CONTRACT,  # _marts__models.yml:69-71
        unique_key="indicator_key",
        tags=("marts", "facts", "incremental"),  # fct sql config :6
        # is_incremental() watermark (fct_economic_indicators.sql:28-31)
        watermark_col="reference_date",
        # 100 TB layout: year-partitioned so a monthly merge rewrites
        # one partition, not the table (the reference's DuckDB target
        # has no layout concept; this is the Spark-native posture)
        partition_by="reference_year",
        # _marts__models.yml:74-113 (incl. the relationships test to
        # dim_country on country_code)
        tests=(
            ("unique", "indicator_key"),
            ("not_null", "indicator_key"),
            ("not_null", "country_code"),
            ("relationships", "country_code", "dim_country", "country_code"),
            ("not_null", "reference_date"),
        ),
    )
    def fct_indicators(ctx: Context) -> DataFrame:
        """fct_economic_indicators.sql:28-82 — monthly fact; incremental
        watermark+upsert handled by materialize.run_incremental."""
        mi = ctx.ref("int_country_monthly_indicators")
        cd = ctx.ref("dim_country").select("country_code", "country_key")
        return mi.join(F.broadcast(cd), "country_code", "left").select(
            F.col("monthly_metrics_key").alias("indicator_key"),
            "country_code",
            "country_key",
            "reference_year",
            "reference_month",
            "reference_date",
            "unemployment_rate_pct",
            "inflation_rate_mom_pct",
            "unemployment_rate_prev_month",
            "unemployment_rate_prev_year",
            "unemployment_rate_12m_avg",
            "inflation_rate_12m_avg",
            (F.col("unemployment_rate_pct") - F.col("unemployment_rate_prev_month")).alias(
                "unemployment_mom_change"
            ),
            (F.col("unemployment_rate_pct") - F.col("unemployment_rate_prev_year")).alias(
                "unemployment_yoy_change"
            ),
            "annual_gdp_million_eur",
            "annual_population_count",
            "annual_gdp_per_capita_eur",
            F.current_timestamp().alias("_loaded_at"),
        )

    @reg.model(
        "rpt_annual_economic_summary",
        materialization="table",
        contract=_RPT_CONTRACT,  # _marts__models.yml:162-164
        tags=("marts", "reporting"),
        # _marts__models.yml:167-196
        tests=(
            ("unique", "summary_key"),
            ("not_null", "summary_key"),
            ("not_null", "country_code"),
            ("not_null", "reference_year"),
        ),
    )
    def rpt_summary(ctx: Context) -> DataFrame:
        """rpt_annual_economic_summary.sql:18-137 — EU aggregates, 4 ranks,
        YoY changes, EU shares."""
        am = ctx.ref("int_country_annual_metrics").filter(F.col("country_code") != "EU27_2020")
        cd = ctx.ref("dim_country").select(
            "country_code", "country_key", "country_name", "eu_status", "eurozone_member", "region"
        )
        eu = (
            ctx.ref("int_country_annual_metrics")
            .filter(F.col("country_code") != "EU27_2020")
            .groupBy("reference_year")
            .agg(
                F.sum("gdp_million_eur").alias("eu_total_gdp_million_eur"),
                F.sum("population_count").alias("eu_total_population"),
                F.avg("avg_unemployment_rate_pct").alias("eu_avg_unemployment_rate"),
                F.avg("annual_inflation_rate_pct").alias("eu_avg_inflation_rate"),
            )
        )
        wy = Window.partitionBy("reference_year")
        wc = Window.partitionBy("country_code").orderBy("reference_year")
        ranked = am.select(
            "*",
            F.rank().over(wy.orderBy(F.col("gdp_million_eur").desc())).alias("gdp_rank"),
            F.rank().over(wy.orderBy(F.col("gdp_per_capita_eur").desc())).alias("gdp_per_capita_rank"),
            # asc_nulls_last, NOT asc: the reference runs on DuckDB,
            # whose default_null_order ranks NULLs LAST on ASC, while
            # Spark's plain asc() sorts them FIRST — a country-year
            # missing from the unemployment/inflation feed (NULL after
            # the left join) would grab rank 1 and shift every real
            # rank. DESC needs no override: both engines put NULLs
            # last there.
            F.rank().over(wy.orderBy(F.col("avg_unemployment_rate_pct").asc_nulls_last())).alias("unemployment_rank"),
            F.rank().over(wy.orderBy(F.col("annual_inflation_rate_pct").asc_nulls_last())).alias("inflation_rank"),
            F.lag("gdp_million_eur").over(wc).alias("prev_year_gdp"),
            F.lag("avg_unemployment_rate_pct").over(wc).alias("prev_year_unemployment"),
            F.lag("annual_inflation_rate_pct").over(wc).alias("prev_year_inflation"),
        )
        return (
            ranked.alias("r")
            .join(F.broadcast(cd.alias("cd")), "country_code", "left")
            .join(F.broadcast(eu.alias("eu")), "reference_year", "left")
            .select(
                surrogate_key(F.col("country_code"), F.col("reference_year")).alias("summary_key"),
                "country_code",
                "country_key",
                "reference_year",
                "gdp_million_eur",
                "population_count",
                "gdp_per_capita_eur",
                "avg_unemployment_rate_pct",
                "annual_inflation_rate_pct",
                "gdp_rank",
                "gdp_per_capita_rank",
                "unemployment_rank",
                "inflation_rank",
                F.when(
                    F.col("prev_year_gdp") > 0,
                    (F.col("gdp_million_eur") - F.col("prev_year_gdp"))
                    / F.col("prev_year_gdp")
                    * 100,
                ).alias("gdp_yoy_growth_pct"),
                (F.col("avg_unemployment_rate_pct") - F.col("prev_year_unemployment")).alias(
                    "unemployment_yoy_change_pp"
                ),
                (F.col("annual_inflation_rate_pct") - F.col("prev_year_inflation")).alias(
                    "inflation_yoy_change_pp"
                ),
                F.when(
                    F.col("eu_total_gdp_million_eur") > 0,
                    F.col("gdp_million_eur") / F.col("eu_total_gdp_million_eur") * 100,
                ).alias("share_of_eu_gdp_pct"),
                F.when(
                    F.col("eu_total_population") > 0,
                    # float (not double) is deliberate: the reference
                    # casts ::float here (rpt_annual_economic_summary
                    # .sql:96) — parity over precision
                    F.col("population_count").cast("float") / F.col("eu_total_population") * 100,
                ).alias("share_of_eu_population_pct"),
                # guard matches the reference's ENGINE behavior: the
                # reference SQL (rpt_annual_economic_summary.sql:101)
                # divides unguarded, but DuckDB's double/0 is NULL —
                # under Spark's ANSI mode the same expression would
                # CRASH the mart run, so the NULL is made explicit
                F.when(
                    F.col("eu_total_population") > 0,
                    F.col("gdp_per_capita_eur")
                    - F.col("eu_total_gdp_million_eur")
                    * 1000000.0
                    / F.col("eu_total_population"),
                ).alias("gdp_per_capita_vs_eu_avg"),
                (F.col("avg_unemployment_rate_pct") - F.col("eu_avg_unemployment_rate")).alias(
                    "unemployment_vs_eu_avg_pp"
                ),
                (F.col("annual_inflation_rate_pct") - F.col("eu_avg_inflation_rate")).alias(
                    "inflation_vs_eu_avg_pp"
                ),
                "has_complete_unemployment_data",
                "has_complete_inflation_data",
                "country_name",
                "eu_status",
                "eurozone_member",
                "region",
                F.current_timestamp().alias("_loaded_at"),
            )
        )

    @reg.model(
        "snap_gdp_history",
        materialization="snapshot",
        unique_key="gdp_key",
        check_cols=["gdp_million_eur"],
    )
    def snap_gdp(ctx: Context) -> DataFrame:
        """snap_gdp_history.sql:28-37 — source select for the SCD2
        snapshot (check strategy on gdp_million_eur, hard deletes)."""
        return ctx.ref("stg_eurostat__gdp").select(
            "gdp_key",
            "country_code",
            "country_name",
            "reference_year",
            "gdp_million_eur",
            "unit_code",
            "source_dataset",
            "_extracted_at",
        )

    # ---- Python-model ports (reference models/marts/py_*.py, run by
    # dbt as materialized='table' Python models) — registered after the
    # marts they ref; see models/python_ports.py
    from .python_ports import register_python_models

    register_python_models(reg)

    # ---- singular test (reference tests/assert_eu_aggregate_
    # consistency.sql:13-44): the EU27_2020 aggregate GDP must equal
    # the member-state sum within 5% per year; rows returned are
    # violations. With no EU27_2020 rows in the source, the inner join
    # yields nothing — the test passes vacuously, exactly like dbt.
    @reg.singular_test("assert_eu_aggregate_consistency")
    def eu_aggregate_consistency(ctx: Context) -> DataFrame:
        gdp = ctx.ref("stg_eurostat__gdp")
        country_totals = (
            gdp.filter(F.col("country_code") != "EU27_2020")
            .groupBy("reference_year")
            .agg(F.sum("gdp_million_eur").alias("summed_gdp"))
        )
        eu = gdp.filter(F.col("country_code") == "EU27_2020").select(
            "reference_year", F.col("gdp_million_eur").alias("eu_reported_gdp")
        )
        diff = F.abs(F.col("summed_gdp") - F.col("eu_reported_gdp"))
        return (
            country_totals.join(F.broadcast(eu), "reference_year")
            .select(
                "reference_year",
                "summed_gdp",
                "eu_reported_gdp",
                diff.alias("absolute_difference"),
                # try_divide: a 0-valued EU aggregate must not crash
                # the test under ANSI; NULL pct fails the > filter
                # like DuckDB's NULL semantics
                (F.try_divide(diff, F.col("eu_reported_gdp")) * 100).alias(
                    "percentage_difference"
                ),
            )
            .filter(F.col("percentage_difference") > 5)
        )

    return reg
