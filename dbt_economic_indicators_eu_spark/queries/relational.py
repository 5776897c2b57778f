"""Relational operator demos (SURVEY.md §2.1-2.8, §2.10) over the
driver's TPC-H-ish synthetic tables.

Scale notes (100 TB posture), per query:
- Dimension joins (`nation`, `region`, `supplier`, `customer`) are
  explicitly ``broadcast()`` — no shuffle of the fact side.
- Aggregations group on bounded-cardinality keys (nation × month, etc.)
  → partial (map-side) aggregation shrinks the shuffle to ~|groups|.
- Window functions partition by entity keys (nation, user) → one
  shuffle by entity, all window ops reuse the same partitioning.
- Filters/projections are expressed directly on the scan so Catalyst
  pushes them into the parquet reader (check ``PushedFilters`` in
  ``.explain("formatted")``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import (
    null_safe_pct_change,
    rank_within_group,
    safe_divide,
    surrogate_key,
)
from .common import (
    QueryDef,
    epoch_micros,
    load,
    money4_sum_r2,
    money4_sum_sql,
    r2,
    r4,
    widen_narrow_scan,
)

# --------------------------------------------------------------------------
# q_staging_projection — OP-SRC-TABLE, OP-PROJ-RENAME, OP-PROJ-CAST,
# OP-FIL-NOTNULL, OP-FIL-LEN, OP-FN-SURRKEY, OP-FN-MAKEDATE, OP-FN-SUBSTR
# (the staging-layer pattern of stg_eurostat__gdp.sql:19-50)
# --------------------------------------------------------------------------


def q_staging_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_shipdate").isNotNull()
            & F.col("l_returnflag").isNotNull()
            & (F.length(F.col("l_returnflag")) >= 1)
        )
        .select(
            surrogate_key(F.col("l_orderkey"), F.col("l_linenumber")).alias("line_key"),
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").cast("int").alias("line_number"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extended_price"),
            F.to_date("l_shipdate").alias("ship_date"),
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
            F.make_date(F.year("l_shipdate"), F.month("l_shipdate"), F.lit(1)).alias(
                "ship_month_start"
            ),
            F.substring(F.col("l_returnflag"), 1, 1).alias("return_flag"),
        )
    )


ORACLE_STAGING_PROJECTION = """
SELECT
  md5(concat_ws('||',
      coalesce(CAST(l_orderkey AS VARCHAR), ''),
      coalesce(CAST(l_linenumber AS VARCHAR), ''))) AS line_key,
  l_orderkey AS order_key,
  CAST(l_linenumber AS INTEGER) AS line_number,
  l_quantity AS quantity,
  l_extendedprice AS extended_price,
  CAST(l_shipdate AS DATE) AS ship_date,
  CAST(year(l_shipdate) AS INTEGER) AS ship_year,
  CAST(month(l_shipdate) AS INTEGER) AS ship_month,
  make_date(CAST(year(l_shipdate) AS INTEGER), CAST(month(l_shipdate) AS INTEGER), 1)
    AS ship_month_start,
  substring(l_returnflag, 1, 1) AS return_flag
FROM lineitem
WHERE l_quantity IS NOT NULL
  AND l_shipdate IS NOT NULL
  AND l_returnflag IS NOT NULL
  AND length(l_returnflag) >= 1
"""


# --------------------------------------------------------------------------
# q_annual_agg — OP-AGG-ANNUAL-U / OP-AGG-ANNUAL-I: avg/min/max/count/sum by
# (entity, year), the int_country_annual_metrics.sql:37-59 pattern.
# --------------------------------------------------------------------------


def q_annual_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    # Broadcast-hint policy (applies package-wide): hints stay ONLY on
    # tables bounded by nature (nation=25 rows, region=5, scalar aggs,
    # benchmark sets). supplier/customer SCALE with the dataset, so
    # their joins carry no hint — the planner broadcasts from the
    # scan's real size stats while small and degrades to a shuffle
    # join at scales where a forced broadcast would OOM the executors.
    return (
        li.join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"), F.year("l_shipdate").alias("ship_year"))
        .agg(
            (r2(F.sum("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count(F.lit(1)).alias("observations"),
            r2(F.sum("l_extendedprice")).alias("total_revenue"),
        )
    )


ORACLE_ANNUAL_AGG = """
SELECT
  n.n_name AS nation_name,
  CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
  round(sum(l.l_quantity), 2) / count(*) AS avg_qty,
  min(l.l_quantity) AS min_qty,
  max(l.l_quantity) AS max_qty,
  count(*) AS observations,
  round(sum(l.l_extendedprice), 2) AS total_revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q_left_join_enrich — OP-JOIN-LEFT2 / OP-JOIN-SPINE: multi-way left join of
# a fact spine to dimensions (int_country_annual_metrics.sql:99-108).
# --------------------------------------------------------------------------


def q_left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.join(
            cust.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            orders.o_custkey == cust.c_custkey,
            "left",
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"), "left")
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_custkey").alias("cust_key"),
            F.col("o_totalprice").alias("total_price"),
            F.col("c_name").alias("customer_name"),
            F.col("c_acctbal").alias("account_balance"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


ORACLE_LEFT_JOIN_ENRICH = """
SELECT
  o.o_orderkey AS order_key,
  o.o_custkey AS cust_key,
  o.o_totalprice AS total_price,
  c.c_name AS customer_name,
  c.c_acctbal AS account_balance,
  n.n_name AS nation_name,
  r.r_name AS region_name
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


# --------------------------------------------------------------------------
# q_region_share — OP-JOIN-DIM, OP-JOIN-YEARAGG, OP-AGG-EU: broadcast-dim
# join + per-year totals + share-of-total (rpt_annual_economic_summary.sql
# 27-37, 96-103 "EU share" pattern, done Spark-style with a window instead
# of a self-join so the totals need no second shuffle).
# --------------------------------------------------------------------------


def q_region_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    per_nation = (
        li.join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == supp.s_suppkey)
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
        .agg(money4_sum_r2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    w_year = Window.partitionBy("ship_year")
    year_total = r2(F.sum("revenue").over(w_year))
    return per_nation.select(
        "region_name",
        "nation_name",
        "ship_year",
        "revenue",
        year_total.alias("year_total_revenue"),
        (F.col("revenue") / year_total * 100.0).alias("revenue_share_pct"),
    )


ORACLE_REGION_SHARE = f"""
WITH per_nation AS (
  SELECT
    r.r_name AS region_name,
    n.n_name AS nation_name,
    CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
    {money4_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2, 3
)
SELECT
  region_name,
  nation_name,
  ship_year,
  revenue,
  round(sum(revenue) OVER (PARTITION BY ship_year), 2) AS year_total_revenue,
  revenue / round(sum(revenue) OVER (PARTITION BY ship_year), 2) * 100.0 AS revenue_share_pct
FROM per_nation
"""


# --------------------------------------------------------------------------
# q_monthly_lag — OP-WIN-LAG1, OP-WIN-LAG12, OP-WIN-YOY%, OP-WIN-DIFF:
# monthly series with MoM / YoY change (int_country_monthly_indicators.sql
# 85-99; macros/calculations.sql:28-47).
# --------------------------------------------------------------------------


def _monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.make_date(F.year("l_shipdate"), F.month("l_shipdate"), F.lit(1)).alias("month_start"),
        )
        .agg(r2(F.sum("l_extendedprice")).alias("revenue"))
    )


_ORACLE_MONTHLY_REVENUE = """
  SELECT
    n.n_name AS nation_name,
    make_date(CAST(year(l.l_shipdate) AS INTEGER), CAST(month(l.l_shipdate) AS INTEGER), 1)
      AS month_start,
    round(sum(l.l_extendedprice), 2) AS revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
"""


def q_monthly_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = _monthly_revenue(spark, sf_dir)
    w = Window.partitionBy("nation_name").orderBy("month_start")
    prev1 = F.lag("revenue", 1).over(w)
    prev12 = F.lag("revenue", 12).over(w)
    return monthly.select(
        "nation_name",
        "month_start",
        "revenue",
        prev1.alias("prev_month_revenue"),
        prev12.alias("prev_year_revenue"),
        null_safe_pct_change(F.col("revenue"), prev1).alias("mom_change_pct"),
        (F.col("revenue") - prev12).alias("yoy_change_abs"),
    )


ORACLE_MONTHLY_LAG = f"""
WITH monthly AS ({_ORACLE_MONTHLY_REVENUE})
SELECT
  nation_name,
  month_start,
  revenue,
  lag(revenue, 1) OVER w AS prev_month_revenue,
  lag(revenue, 12) OVER w AS prev_year_revenue,
  CASE WHEN lag(revenue, 1) OVER w IS NOT NULL AND lag(revenue, 1) OVER w != 0
        THEN (revenue - lag(revenue, 1) OVER w) / lag(revenue, 1) OVER w * 100.0 END
    AS mom_change_pct,
  revenue - lag(revenue, 12) OVER w AS yoy_change_abs
FROM monthly
WINDOW w AS (PARTITION BY nation_name ORDER BY month_start)
"""


# --------------------------------------------------------------------------
# q_rolling_avg — OP-WIN-ROLL12: trailing 12-month average
# (int_country_monthly_indicators.sql:102-112; macros/calculations.sql:51-69)
# --------------------------------------------------------------------------


def q_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = _monthly_revenue(spark, sf_dir)
    w = Window.partitionBy("nation_name").orderBy("month_start").rowsBetween(-11, 0)
    # round(sum)/count instead of round(avg): exact and order-independent,
    # immune to the cross-engine .5-rounding divergence (see common.py)
    rolling_sum = r2(F.sum("revenue").over(w))
    rolling_cnt = F.count(F.lit(1)).over(w)
    return monthly.select(
        "nation_name",
        "month_start",
        "revenue",
        (rolling_sum / rolling_cnt).alias("rolling_12m_avg_revenue"),
        rolling_cnt.alias("rolling_12m_obs"),
    )


ORACLE_ROLLING_AVG = f"""
WITH monthly AS ({_ORACLE_MONTHLY_REVENUE})
SELECT
  nation_name,
  month_start,
  revenue,
  round(sum(revenue) OVER (PARTITION BY nation_name ORDER BY month_start
        ROWS BETWEEN 11 PRECEDING AND CURRENT ROW), 2)
    / count(*) OVER (PARTITION BY nation_name ORDER BY month_start
        ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS rolling_12m_avg_revenue,
  count(*) OVER (PARTITION BY nation_name ORDER BY month_start
        ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS rolling_12m_obs
FROM monthly
"""


# --------------------------------------------------------------------------
# q_rank_in_year — OP-WIN-RANK: rank() (gap semantics) within year, both
# directions (rpt_annual_economic_summary.sql:44-47).
# --------------------------------------------------------------------------


def q_rank_in_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    annual = (
        li.join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation_name"), F.year("l_shipdate").alias("ship_year"))
        .agg(
            r2(F.sum("l_extendedprice")).alias("revenue"),
            (r2(F.sum("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
        )
    )
    return annual.select(
        "nation_name",
        "ship_year",
        "revenue",
        "avg_qty",
        rank_within_group(F.col("revenue"), ["ship_year"], ascending=False).alias("revenue_rank"),
        rank_within_group(F.col("avg_qty"), ["ship_year"], ascending=True).alias("qty_rank"),
    )


ORACLE_RANK_IN_YEAR = """
WITH annual AS (
  SELECT
    n.n_name AS nation_name,
    CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
    round(sum(l.l_extendedprice), 2) AS revenue,
    round(sum(l.l_quantity), 2) / count(*) AS avg_qty
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT
  nation_name,
  ship_year,
  revenue,
  avg_qty,
  CAST(rank() OVER (PARTITION BY ship_year ORDER BY revenue DESC) AS INTEGER) AS revenue_rank,
  CAST(rank() OVER (PARTITION BY ship_year ORDER BY avg_qty ASC) AS INTEGER) AS qty_rank
FROM annual
"""


# --------------------------------------------------------------------------
# q_latest_per_entity — OP-WIN-FIRST + OP-AGG-DISTINCT: first_value over a
# desc ordering + distinct (dim_country.sql:21-29 "latest name" pattern).
# --------------------------------------------------------------------------


def q_latest_per_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    # Single-shuffle max_by aggregation, not first_value-window+distinct:
    # the window form sorts the full table and then dedups (two wide
    # stages); max_by folds to one partial-aggregated groupBy, and the
    # dim join runs on the 25-row aggregate instead of the full table.
    # Tie-break (acctbal desc, custkey asc) = max of (acctbal, -custkey).
    agg = cust.groupBy("c_nationkey").agg(
        F.expr("max_by(c_name, struct(c_acctbal, -c_custkey))").alias("top_customer_name"),
        F.max("c_acctbal").alias("top_customer_balance"),
    )
    return agg.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        agg.c_nationkey == nation.n_nationkey,
    ).select(
        F.col("n_name").alias("nation_name"),
        "top_customer_name",
        "top_customer_balance",
    )


ORACLE_LATEST_PER_ENTITY = """
SELECT DISTINCT
  n.n_name AS nation_name,
  first_value(c.c_name) OVER w AS top_customer_name,
  first_value(c.c_acctbal) OVER w AS top_customer_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WINDOW w AS (PARTITION BY c.c_nationkey ORDER BY c.c_acctbal DESC, c.c_custkey ASC)
"""


# --------------------------------------------------------------------------
# q_case_bands — OP-EXPR-CASE, OP-FN-COALESCE, OP-FN-ABS, safe_divide
# (dim_country.sql:58-62 status ladder; macros/calculations.sql:91-108).
# --------------------------------------------------------------------------


def q_case_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("account_balance"),
        F.when(F.col("c_acctbal") < 0, F.lit("negative"))
        .when(F.col("c_acctbal") < 1000, F.lit("low"))
        .when(F.col("c_acctbal") < 5000, F.lit("medium"))
        .otherwise(F.lit("high"))
        .alias("balance_band"),
        safe_divide(F.col("c_acctbal"), F.col("c_nationkey").cast("double")).alias(
            "balance_per_nationkey"
        ),
        F.abs(F.col("c_acctbal")).alias("abs_balance"),
        F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment_or_unknown"),
    )


ORACLE_CASE_BANDS = """
SELECT
  c_custkey AS cust_key,
  c_mktsegment AS segment,
  c_acctbal AS account_balance,
  CASE WHEN c_acctbal < 0 THEN 'negative'
       WHEN c_acctbal < 1000 THEN 'low'
       WHEN c_acctbal < 5000 THEN 'medium'
       ELSE 'high' END AS balance_band,
  CASE WHEN CAST(c_nationkey AS DOUBLE) IS NOT NULL AND CAST(c_nationkey AS DOUBLE) != 0
        THEN c_acctbal / CAST(c_nationkey AS DOUBLE) END AS balance_per_nationkey,
  abs(c_acctbal) AS abs_balance,
  coalesce(c_mktsegment, 'UNKNOWN') AS segment_or_unknown
FROM customer
"""


# --------------------------------------------------------------------------
# q_distinct_spine — OP-AGG-DISTINCT (int_country_monthly_indicators.sql:52-61)
# --------------------------------------------------------------------------


def q_distinct_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_returnflag").alias("return_flag"),
        F.col("l_linestatus").alias("line_status"),
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
    ).distinct()


ORACLE_DISTINCT_SPINE = """
SELECT DISTINCT
  l_returnflag AS return_flag,
  l_linestatus AS line_status,
  CAST(year(l_shipdate) AS INTEGER) AS ship_year,
  CAST(month(l_shipdate) AS INTEGER) AS ship_month
FROM lineitem
"""


# --------------------------------------------------------------------------
# q_union_append — OP-SET-UNION (py_anomaly_detection.py:116 concat)
# --------------------------------------------------------------------------


def q_union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    high_value = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("total_price"),
        F.lit("high_value").alias("reason"),
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("total_price"),
        F.lit("urgent").alias("reason"),
    )
    return high_value.unionByName(urgent)


ORACLE_UNION_APPEND = """
SELECT o_orderkey AS order_key, o_totalprice AS total_price, 'high_value' AS reason
FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT o_orderkey AS order_key, o_totalprice AS total_price, 'urgent' AS reason
FROM orders WHERE o_orderpriority = '1-URGENT'
"""


# --------------------------------------------------------------------------
# q_test_unique — OP-TEST-UNIQUE: duplicate-key detector (violations query)
# --------------------------------------------------------------------------


def q_test_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    # drives the REAL operator (testing.generic.test_unique — the one
    # run_schema_tests compiles), so the oracle verdict certifies its
    # semantics, including dbt's NULL-keys-are-not-duplicates rule
    from ..testing import generic

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
    )
    # Pre-partition on the tested key (call-site knowledge the
    # optimizer lacks, guide §8): a uniqueness test's group keys are
    # near-unique BY CONSTRUCTION on healthy data, so the map-side
    # partial aggregate reduces nothing — it builds a row-count-sized
    # hash map inside the scan task and ships the same rows anyway.
    # With the input already hash-partitioned on the key, the groupBy
    # inserts no second exchange (same single shuffle, same bytes) and
    # the hash build runs at post-shuffle width instead of scan width
    # (one task per input file here). Trade-off, documented: on
    # PATHOLOGICAL data where one key owns most rows, the partial agg
    # would have collapsed duplicates map-side — that is the failing-
    # test regime, where the run is already headed for a red result;
    # the healthy-data fast path is the one that runs at 100 TB every
    # night. Note also that AQE's skew-join splitting does not apply to
    # a keyed repartition (REPARTITION_BY_COL is not a join, and a
    # single hot key cannot be split by AQE anywhere), so if the
    # failing-test regime ever mattered at scale the fix would be a
    # rebalance-style hint or reverting to the ENSURE_REQUIREMENTS
    # shape, not a conf. Measured at sf0.1 (noop, min-of-5, round-12
    # isolated harness under the bench conf): 0.405 -> 0.300; plan
    # diff in plans/r12/test_unique_{before,after}.txt.
    return generic.test_unique(
        li.repartition("order_key", "line_number"), "order_key", "line_number"
    ).withColumnRenamed("n_rows", "n")


ORACLE_TEST_UNIQUE = """
SELECT l_orderkey AS order_key, l_linenumber AS line_number, count(*) AS n
FROM lineitem
WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
GROUP BY 1, 2
HAVING count(*) > 1
"""
# ^ the NOT NULL guard mirrors dbt's compiled unique test (and
# generic.test_unique): NULL keys are not uniqueness violations.


# --------------------------------------------------------------------------
# q_test_relationships — OP-TEST-REL: referential-integrity anti-join
# (_marts__models.yml:90-93 → fact.join(dim, "left_anti")). The dim side is
# filtered so the query demonstrably returns violations.
# --------------------------------------------------------------------------


def q_test_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    # drives the REAL operator (testing.generic.test_relationships),
    # which excludes NULL child keys like dbt's compiled test
    from ..testing import generic

    child = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
    )
    parent = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("cust_key"))
    )
    return generic.test_relationships(child, parent, "cust_key").select(
        "order_key", "cust_key"
    )


ORACLE_TEST_RELATIONSHIPS = """
SELECT o_orderkey AS order_key, o_custkey AS cust_key
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_acctbal > 0 AND c.c_custkey = o.o_custkey
)
"""
# ^ NULL child keys excluded, mirroring dbt's relationships test and
# generic.test_relationships.


# --------------------------------------------------------------------------
# q_test_range_nofuture — OP-TEST-RANGE + OP-TEST-NOFUTURE
# (macros/data_quality.sql:1-27); fixed "today" for determinism.
# --------------------------------------------------------------------------


def q_test_range_nofuture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out_of_range = (F.col("value") < 0) | (F.col("value") > 500)
    future = F.col("ts") > F.lit("2026-01-01").cast("timestamp_ntz")
    return (
        ev.filter(out_of_range | future)
        .select(
            F.col("event_id"),
            F.col("event_type"),
            F.col("value"),
            F.col("ts"),
            F.when(out_of_range, F.lit("out_of_range")).otherwise(F.lit("future_date")).alias(
                "violation"
            ),
        )
    )


ORACLE_TEST_RANGE_NOFUTURE = """
SELECT
  event_id,
  event_type,
  value,
  ts,
  CASE WHEN (value < 0 OR value > 500) THEN 'out_of_range' ELSE 'future_date' END AS violation
FROM (SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events) e
WHERE (value < 0 OR value > 500) OR ts > TIMESTAMP '2026-01-01'
"""


# --------------------------------------------------------------------------
# q_singular_consistency — OP-TEST-SINGULAR + OP-AGG-SUMGROUP + OP-JOIN-INNER:
# aggregate-vs-detail consistency within 5% tolerance
# (tests/assert_eu_aggregate_consistency.sql:13-44).
# --------------------------------------------------------------------------


def q_singular_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    li_tot = li.groupBy(F.col("l_orderkey")).agg(r2(F.sum("l_extendedprice")).alias("lineitem_total"))
    joined = orders.join(li_tot, orders.o_orderkey == li_tot.l_orderkey, "inner")
    pct_diff = (
        F.abs(F.col("o_totalprice") - F.col("lineitem_total")) / F.col("lineitem_total") * 100.0
    )
    return (
        joined.select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_totalprice").alias("total_price"),
            F.col("lineitem_total"),
            pct_diff.alias("pct_diff"),
        )
        .filter(F.col("pct_diff") > 5.0)
    )


ORACLE_SINGULAR_CONSISTENCY = """
WITH li_tot AS (
  SELECT l_orderkey, round(sum(l_extendedprice), 2) AS lineitem_total
  FROM lineitem GROUP BY 1
)
SELECT
  o.o_orderkey AS order_key,
  o.o_totalprice AS total_price,
  t.lineitem_total,
  abs(o.o_totalprice - t.lineitem_total) / t.lineitem_total * 100.0 AS pct_diff
FROM orders o
JOIN li_tot t ON o.o_orderkey = t.l_orderkey
WHERE abs(o.o_totalprice - t.lineitem_total) / t.lineitem_total * 100.0 > 5.0
"""


# --------------------------------------------------------------------------
# q_completeness — OP-AGG-COUNTNULL + OP-TEST-COMPLETE
# (macros/data_quality.sql:30-46): count(col)/count(*) ratio + threshold.
# --------------------------------------------------------------------------


def q_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.count(F.col("value")).alias("value_count"),
            (F.count(F.col("value")) / F.count(F.lit(1))).alias("completeness_ratio"),
        )
        .withColumn("meets_threshold", F.col("completeness_ratio") >= 0.95)
    )


ORACLE_COMPLETENESS = """
SELECT
  event_type,
  count(*) AS row_count,
  count(value) AS value_count,
  count(value) * 1.0 / count(*) AS completeness_ratio,
  count(value) * 1.0 / count(*) >= 0.95 AS meets_threshold
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q_watermark_filter — OP-FIL-WATERMARK / OP-SINK-INCR predicate: rows past
# a high-watermark derived from the data itself
# (fct_economic_indicators.sql:28-31). Implemented as a broadcast scalar
# aggregate crossJoin — stays one Catalyst plan, no driver collect.
# --------------------------------------------------------------------------


def q_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    wm = orders.agg(F.max("o_orderdate").alias("max_orderdate"))
    return (
        orders.crossJoin(F.broadcast(wm))
        .filter(F.col("o_orderdate") > F.col("max_orderdate") - F.expr("INTERVAL 90 DAYS"))
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_custkey").alias("cust_key"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
        )
    )


ORACLE_WATERMARK_FILTER = """
SELECT
  o_orderkey AS order_key,
  o_custkey AS cust_key,
  o_orderdate AS order_date,
  o_totalprice AS total_price
FROM orders
WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders) - INTERVAL 90 DAY
"""


# --------------------------------------------------------------------------
# q_sessionize — sessionization (gaps-and-islands): the batch expression of
# the streaming-extension surface (SURVEY §2.12); 30-minute inactivity gap.
# --------------------------------------------------------------------------


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL event times are excluded: a row with no timestamp belongs
    # to no session (the same semantics Spark's session_window
    # operator applies via its injected IsNotNull filter — the
    # streaming twin), and the engines disagree on NULL sort order
    # (Spark ASC first, DuckDB last), which would otherwise split
    # sessions differently per engine.
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_user)
    # Compare at microsecond precision: events.ts is ns-precision (floored
    # to µs by load()), so whole-second casts would split sessions
    # differently than the oracle's fractional epoch() near the boundary.
    is_new = F.when(
        prev_ts.isNull()
        | (epoch_micros(F.col("ts")) - epoch_micros(prev_ts) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    with_session = ev.withColumn("session_idx", F.sum(is_new).over(w_user))
    return with_session.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        r2(F.sum("value")).alias("total_value"),
    )


ORACLE_SESSIONIZE = """
WITH flagged AS (
  SELECT
    user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS is_new
  FROM (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE ts IS NOT NULL) e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT
    user_id, ts, value,
    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT
  user_id,
  session_idx,
  min(ts) AS session_start,
  max(ts) AS session_end,
  count(*) AS n_events,
  round(sum(value), 2) AS total_value
FROM sessions
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q_salted_agg — EXT-SKEW-SALT: two-phase salted aggregation for skewed
# group keys. events has ~5 event_types over the whole table — at 100 TB
# a plain groupBy(event_type) funnels everything through 5 reducers.
# Phase 1 groups on (event_type, salt=event_id mod 16) → 16-way fan-out
# of each hot key with map-side partial aggregation; phase 2 combines
# the tiny per-salt partials. Float discipline: partial sums stay raw,
# only the final total is rounded (true sum of 2-dec data terminates at
# 2 → r2 is order-safe; see common.py).
# --------------------------------------------------------------------------

_SALT_BUCKETS = 16


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    partial = ev.groupBy(
        "event_type", F.pmod(F.col("event_id"), F.lit(_SALT_BUCKETS)).alias("_salt")
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("pv"),
        F.max("value").alias("pmax"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        r2(F.sum("pv")).alias("total_value"),
        F.max("pmax").alias("max_value"),
    )


ORACLE_SALTED_AGG = """
SELECT
  event_type,
  count(*) AS n_events,
  round(sum(value), 2) AS total_value,
  max(value) AS max_value
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q_annual_summary — the FLAGSHIP report (rpt_annual_economic_summary.sql:
# ranks :44-47, EU share :96-103, YoY :80-84) over the star schema: one
# agg + three window families sharing two partitionings. This is also
# what ``__spark_entry__.entry`` runs — giving the flagship a full
# value-hash oracle instead of a smoke-only check.
# Float discipline (queries/common.py): revenue is a rounded
# terminating sum; avg_quantity is round(sum,2)/count (never a rounded
# avg); share/yoy ratios are r4 of non-terminating ratios.
# --------------------------------------------------------------------------


def q_annual_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    annual = (
        li.join(
            supp.select("s_suppkey", "s_nationkey"),
            li.l_suppkey == supp.s_suppkey,
        )
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
            money4_sum_r2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            (r2(F.sum("l_quantity")) / F.count(F.lit(1))).alias("avg_quantity"),
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
        # divide by the r2-ROUNDED window total (as q_region_share does):
        # the raw windowed sum is an order-dependent double accumulation.
        # The quotient is emitted RAW (doctrine #3, like q_region_share
        # and the reference model itself): both operands are exact
        # rounded decimals, so the quotient is bit-identical across
        # engines, and a quotient of terminating decimals CAN terminate
        # at a rounding boundary — r4 would reintroduce the .xxxx5
        # divergence it was meant to avoid
        (F.col("revenue") / r2(F.sum("revenue").over(w_year)) * 100.0).alias(
            "revenue_share_pct"
        ),
        F.when(
            prev_rev.isNotNull() & (prev_rev != 0),
            (F.col("revenue") - prev_rev) / prev_rev * 100.0,
        ).alias("yoy_revenue_change_pct"),
    )


ORACLE_ANNUAL_SUMMARY = f"""
WITH annual AS (
  SELECT
    r.r_name AS region_name,
    n.n_name AS nation_name,
    CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
    {money4_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
    round(sum(l.l_quantity), 2) / count(*) AS avg_quantity,
    count(*) AS n_lineitems
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2, 3
)
SELECT
  region_name,
  nation_name,
  ship_year,
  revenue,
  avg_quantity,
  n_lineitems,
  rank() OVER (PARTITION BY ship_year ORDER BY revenue DESC)
    AS revenue_rank_in_year,
  revenue / round(sum(revenue) OVER (PARTITION BY ship_year), 2) * 100.0
    AS revenue_share_pct,
  CASE WHEN lag(revenue) OVER w IS NOT NULL AND lag(revenue) OVER w != 0
        THEN (revenue - lag(revenue) OVER w) / lag(revenue) OVER w * 100.0 END
    AS yoy_revenue_change_pct
FROM annual
WINDOW w AS (PARTITION BY nation_name ORDER BY ship_year)
"""


# --------------------------------------------------------------------------
# q_salted_join — EXT-SKEW-JOIN-SALT: manually salted shuffle join, the
# escape hatch for hot JOIN keys when AQE's skew splitting can't help
# (stream-static joins, non-AQE engines, or a dim too large to
# broadcast). The big side gets a deterministic salt; the dim side is
# replicated once per salt value, so each hot key fans out over
# _JOIN_SALT reducers instead of funneling into one. The demo dim here
# is derived and tiny (it would broadcast in practice — hence the
# explicit shuffle_hash hint to force the salted path the operator
# exists to demonstrate); the pattern targets a 10^8-row dim with hot
# keys. Result is exactly the unsalted join (oracle = plain join).
# --------------------------------------------------------------------------

_JOIN_SALT = 8


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("type_code", F.upper(F.substring("event_type", 1, 2)))
    )
    dim_rep = dim.select(
        "event_type",
        "type_code",
        F.explode(F.sequence(F.lit(0), F.lit(_JOIN_SALT - 1))).alias("salt"),
    )
    # pmod + null-coalesce keep the salt TOTAL over arbitrary ids:
    # Spark's % preserves sign (negative id -> negative salt) and a
    # NULL id would yield a NULL salt — either way the row would miss
    # every replicated dim salt and silently vanish from a join whose
    # contract is "equal to the unsalted join"
    big = ev.withColumn(
        "salt", F.pmod(F.coalesce(F.col("event_id"), F.lit(0)), F.lit(_JOIN_SALT)).cast("int")
    )
    joined = big.join(dim_rep.hint("shuffle_hash"), ["event_type", "salt"])
    return joined.groupBy("type_code").agg(
        F.count(F.lit(1)).alias("n_events"),
        r2(F.sum("value")).alias("total_value"),
    )


ORACLE_SALTED_JOIN = """
WITH dim AS (
  SELECT DISTINCT event_type, upper(substr(event_type, 1, 2)) AS type_code
  FROM events
)
SELECT d.type_code,
       count(*) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e JOIN dim d USING (event_type)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q_table_profile — EXT-PROFILE: one-pass column profiler (the
# dbt-profiler / data-discovery primitive): per column null count,
# exact distinct count, numeric min/max, string length range — ALL
# metrics in a SINGLE aggregate over one scan, unpivoted to long form
# JVM-side. Raw parquet min/max values carry no arithmetic, so floats
# compare bit-exactly across engines.
#
# Scale shape: one scan, one partial-aggregated reduce to a single
# row (count_distinct rewrites to expand+two-phase agg — the only
# shuffled stream, and it carries distinct values only). At 100 TB
# swap exact distinct for approx_count_distinct per profiling policy.
# --------------------------------------------------------------------------

_PROFILE_NUM = ("o_orderkey", "o_custkey", "o_totalprice")
_PROFILE_STR = ("o_orderstatus", "o_orderpriority")


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = widen_narrow_scan(load(spark, sf_dir, "orders"))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_NUM + _PROFILE_STR:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.count_distinct(c).alias(f"nd_{c}"),
        ]
    for c in _PROFILE_NUM:
        aggs += [
            F.min(c).cast("double").alias(f"mn_{c}"),
            F.max(c).cast("double").alias(f"mx_{c}"),
        ]
    for c in _PROFILE_STR:
        aggs += [
            F.min(F.length(c)).cast("bigint").alias(f"ln_{c}"),
            F.max(F.length(c)).cast("bigint").alias(f"lx_{c}"),
        ]
    a = orders.agg(*aggs)
    null_bigint = F.lit(None).cast("bigint")
    null_double = F.lit(None).cast("double")
    rows = []
    for c in _PROFILE_NUM:
        rows.append(
            F.struct(
                F.lit(c).alias("col"),
                (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_num"),
                F.col(f"mx_{c}").alias("max_num"),
                null_bigint.alias("min_len"),
                null_bigint.alias("max_len"),
            )
        )
    for c in _PROFILE_STR:
        rows.append(
            F.struct(
                F.lit(c).alias("col"),
                (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                null_double.alias("min_num"),
                null_double.alias("max_num"),
                F.col(f"ln_{c}").alias("min_len"),
                F.col(f"lx_{c}").alias("max_len"),
            )
        )
    return a.select(
        F.col("n_rows"), F.explode(F.array(*rows)).alias("p")
    ).select("p.col", "n_rows", "p.n_nulls", "p.n_distinct", "p.min_num", "p.max_num", "p.min_len", "p.max_len")


def _profile_oracle() -> str:
    num = []
    for c in _PROFILE_NUM:
        num.append(
            f"SELECT '{c}' AS col, n_rows, n_rows - nn_{c} AS n_nulls,"
            f" nd_{c} AS n_distinct, mn_{c} AS min_num, mx_{c} AS max_num,"
            f" CAST(NULL AS BIGINT) AS min_len, CAST(NULL AS BIGINT) AS max_len FROM a"
        )
    for c in _PROFILE_STR:
        num.append(
            f"SELECT '{c}' AS col, n_rows, n_rows - nn_{c} AS n_nulls,"
            f" nd_{c} AS n_distinct, CAST(NULL AS DOUBLE) AS min_num,"
            f" CAST(NULL AS DOUBLE) AS max_num, ln_{c} AS min_len, lx_{c} AS max_len FROM a"
        )
    metrics = ["count(*) AS n_rows"]
    for c in _PROFILE_NUM + _PROFILE_STR:
        metrics += [f"count({c}) AS nn_{c}", f"count(DISTINCT {c}) AS nd_{c}"]
    for c in _PROFILE_NUM:
        metrics += [
            f"CAST(min({c}) AS DOUBLE) AS mn_{c}",
            f"CAST(max({c}) AS DOUBLE) AS mx_{c}",
        ]
    for c in _PROFILE_STR:
        metrics += [
            f"CAST(min(length({c})) AS BIGINT) AS ln_{c}",
            f"CAST(max(length({c})) AS BIGINT) AS lx_{c}",
        ]
    return (
        "WITH a AS (SELECT " + ", ".join(metrics) + " FROM orders)\n"
        + "\nUNION ALL\n".join(num)
    )


ORACLE_TABLE_PROFILE = _profile_oracle()


# --------------------------------------------------------------------------
# q_funnel_steps — EXT-EVENT-FUNNEL: strictly-ordered conversion funnel
# (view → click → purchase) cohorted by first-view date. Each step's
# timestamp must be strictly AFTER the previous step's — the classic
# product-analytics funnel, and the batch twin of the stream-stream
# attribution join (streamq.q_stream_join).
#
# Scale shape: three groupBys and two joins, all keyed on user_id —
# Spark co-partitions the chain on the same key, so after the first
# shuffle the join exchanges are reused (no re-shuffle of the big
# side). Counts are integers → exact cross-engine parity.
# --------------------------------------------------------------------------


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks.select("user_id", "t2"), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    cohort = views.select("user_id", F.to_date("t1").alias("cohort_date"))
    return (
        cohort.join(clicks.select("user_id", "t2"), "user_id", "left")
        .join(purchases, "user_id", "left")
        .groupBy("cohort_date")
        .agg(
            F.count(F.lit(1)).alias("n_viewers"),
            F.count("t2").alias("n_clickers"),
            F.count("t3").alias("n_purchasers"),
        )
    )


ORACLE_FUNNEL_STEPS = """
WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
views AS (
  SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id
),
clicks AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM e JOIN views v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
),
purchases AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM e JOIN clicks c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT CAST(v.t1 AS DATE) AS cohort_date,
       count(*) AS n_viewers,
       count(c.t2) AS n_clickers,
       count(p.t3) AS n_purchasers
FROM views v
LEFT JOIN clicks c USING (user_id)
LEFT JOIN purchases p USING (user_id)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q_event_transitions — EXT-EVENT-MARKOV: first-order Markov transition
# counts between consecutive event types per user (the empirical
# behavior model behind next-action prediction and anomaly detection on
# event streams). One window pass keyed by user (ties broken on
# event_id — pinned total order), one small groupBy on the 5x5 type
# matrix; the per-row share is an integer/integer division → exact.
# --------------------------------------------------------------------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a row with no event time can't be ORDERED into a transition —
    # and the engines disagree on where NULLs sort (Spark ASC puts
    # them first, DuckDB last), so keeping them would make the
    # transition pairs engine-dependent. Same declared semantics as
    # the streaming window/session operators (analyzer-injected
    # IsNotNull) and the batch sessionize below.
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w_user).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_prev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (F.col("n_transitions") / F.sum("n_transitions").over(w_prev)).alias("p_next"),
    )


ORACLE_EVENT_TRANSITIONS = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM (SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE ts IS NOT NULL) e
),
counts AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / sum(n_transitions) OVER (PARTITION BY prev_type) AS p_next
FROM counts
"""


QUERIES = [
    QueryDef(
        "annual_summary",
        q_annual_summary,
        ORACLE_ANNUAL_SUMMARY,
        ("OP-JOIN-DIM", "OP-WIN-RANK", "OP-WIN-LAG1", "OP-WIN-YOY%", "OP-AGG-ANNUAL-U"),
    ),
    QueryDef(
        "staging_projection",
        q_staging_projection,
        ORACLE_STAGING_PROJECTION,
        ("OP-SRC-TABLE", "OP-PROJ-RENAME", "OP-PROJ-CAST", "OP-FIL-NOTNULL", "OP-FIL-LEN", "OP-FN-SURRKEY", "OP-FN-MAKEDATE", "OP-FN-SUBSTR", "OP-FN-LENGTH"),
    ),
    QueryDef("annual_agg", q_annual_agg, ORACLE_ANNUAL_AGG, ("OP-AGG-ANNUAL-U", "OP-AGG-ANNUAL-I")),
    QueryDef("left_join_enrich", q_left_join_enrich, ORACLE_LEFT_JOIN_ENRICH, ("OP-JOIN-LEFT2", "OP-JOIN-SPINE")),
    QueryDef("region_share", q_region_share, ORACLE_REGION_SHARE, ("OP-JOIN-DIM", "OP-JOIN-YEARAGG", "OP-AGG-EU")),
    QueryDef("monthly_lag", q_monthly_lag, ORACLE_MONTHLY_LAG, ("OP-WIN-LAG1", "OP-WIN-LAG12", "OP-WIN-YOY%", "OP-WIN-DIFF", "OP-FN-ARITH")),
    QueryDef("rolling_avg", q_rolling_avg, ORACLE_ROLLING_AVG, ("OP-WIN-ROLL12",)),
    QueryDef("rank_in_year", q_rank_in_year, ORACLE_RANK_IN_YEAR, ("OP-WIN-RANK",)),
    QueryDef("latest_per_entity", q_latest_per_entity, ORACLE_LATEST_PER_ENTITY, ("OP-WIN-FIRST", "OP-AGG-DISTINCT")),
    QueryDef("case_bands", q_case_bands, ORACLE_CASE_BANDS, ("OP-EXPR-CASE", "OP-FN-COALESCE", "OP-FN-ABS")),
    QueryDef("distinct_spine", q_distinct_spine, ORACLE_DISTINCT_SPINE, ("OP-AGG-DISTINCT",)),
    QueryDef("union_append", q_union_append, ORACLE_UNION_APPEND, ("OP-SET-UNION", "OP-FN-LITMETA")),
    QueryDef("test_unique", q_test_unique, ORACLE_TEST_UNIQUE, ("OP-TEST-UNIQUE",)),
    QueryDef("test_relationships", q_test_relationships, ORACLE_TEST_RELATIONSHIPS, ("OP-TEST-REL",)),
    QueryDef("test_range_nofuture", q_test_range_nofuture, ORACLE_TEST_RANGE_NOFUTURE, ("OP-TEST-RANGE", "OP-TEST-NOFUTURE")),
    QueryDef("singular_consistency", q_singular_consistency, ORACLE_SINGULAR_CONSISTENCY, ("OP-TEST-SINGULAR", "OP-AGG-SUMGROUP", "OP-JOIN-INNER")),
    QueryDef("completeness", q_completeness, ORACLE_COMPLETENESS, ("OP-AGG-COUNTNULL", "OP-TEST-COMPLETE")),
    QueryDef("watermark_filter", q_watermark_filter, ORACLE_WATERMARK_FILTER, ("OP-FIL-WATERMARK",)),
    QueryDef("sessionize", q_sessionize, ORACLE_SESSIONIZE, ("EXT-SESSIONIZE",)),
    QueryDef("salted_agg", q_salted_agg, ORACLE_SALTED_AGG, ("EXT-SKEW-SALT", "OP-AGG-SUMGROUP")),
    QueryDef("funnel_steps", q_funnel_steps, ORACLE_FUNNEL_STEPS, ("EXT-EVENT-FUNNEL",)),
    QueryDef("event_transitions", q_event_transitions, ORACLE_EVENT_TRANSITIONS, ("EXT-EVENT-MARKOV",)),
    QueryDef("salted_join", q_salted_join, ORACLE_SALTED_JOIN, ("EXT-SKEW-JOIN-SALT",)),
    QueryDef("table_profile", q_table_profile, ORACLE_TABLE_PROFILE, ("EXT-PROFILE",)),
]
