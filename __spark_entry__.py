"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the annual-economic-summary
pattern of the reference's rpt_annual_economic_summary.sql, re-expressed
over the synthetic star schema). ``queries()`` / ``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 plus the training-data
pipeline extensions, each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_economic_indicators_eu_spark.queries import all_queries

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per nation-year revenue summary with ranks, YoY change and
    share-of-region-total — the rpt_annual_economic_summary.sql pattern
    (ranks :44-47, EU share :96-103, YoY :80-84) over the star schema.
    Delegates to the ``annual_summary`` query so the SAME plan the
    driver smoke-checks here is value-hash verified against its DuckDB
    oracle in the correctness gate."""
    return all_queries()["annual_summary"].builder(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator query (SURVEY.md §2 + extensions)."""
    return {name: q.builder for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
