"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the annual-economic-summary
pattern of the reference's rpt_annual_economic_summary.sql, re-expressed
over the synthetic star schema). ``queries()`` / ``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 plus the training-data
pipeline extensions, each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_economic_indicators_eu_spark.queries import all_queries

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per nation-year revenue summary with ranks, YoY change and
    share-of-region-total — the rpt_annual_economic_summary.sql pattern
    (ranks :44-47, EU share :96-103, YoY :80-84) over the star schema."""
    li = spark.read.parquet(f"{_SF0001}/lineitem.parquet")
    supp = spark.read.parquet(f"{_SF0001}/supplier.parquet")
    nation = spark.read.parquet(f"{_SF0001}/nation.parquet")
    region = spark.read.parquet(f"{_SF0001}/region.parquet")

    annual = (
        li.join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.round(F.avg("l_quantity"), 2).alias("avg_quantity"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
    w_year = Window.partitionBy("ship_year")
    w_nation = Window.partitionBy("nation_name").orderBy("ship_year")
    prev_rev = F.lag("revenue").over(w_nation)
    return annual.select(
        "region_name",
        "nation_name",
        "ship_year",
        "revenue",
        "avg_quantity",
        "n_lineitems",
        F.rank().over(w_year.orderBy(F.col("revenue").desc())).alias("revenue_rank_in_year"),
        F.round(F.col("revenue") / F.sum("revenue").over(w_year) * 100.0, 4).alias(
            "revenue_share_pct"
        ),
        F.round(
            F.when(prev_rev.isNotNull() & (prev_rev != 0), (F.col("revenue") - prev_rev) / prev_rev * 100.0),
            4,
        ).alias("yoy_revenue_change_pct"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator query (SURVEY.md §2 + extensions)."""
    return {name: q.builder for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
