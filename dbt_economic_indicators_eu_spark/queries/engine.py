"""Engine-surface operator demos: materializations (incremental upsert,
SCD2 snapshot), registry pipeline, seed load, availability agg,
freshness / contract / not-null tests, JSON-stat decode.

Each query simulates the stateful operator's batch transitions *inside
one plan* (state-1 and state-2 derived deterministically from the
synthetic tables) so the DuckDB oracle can verify the exact merge
output — no filesystem state, rerunnable, order-insensitive.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..localdata import local_df
from ..materialize.incremental import merge_upsert
from ..materialize.snapshot import scd2_merge
from ..models.econ import load_seed
from ..plans.registry import Registry
from ..sources.jsonstat import decode_jsonstat_str
from ..testing.generic import test_not_null
from .common import EVENTS_NORM_SQL, QueryDef, load, money4_sum_r2, money4_sum_sql

# --------------------------------------------------------------------------
# q_incremental_upsert — OP-SINK-INCR (fct_economic_indicators.sql:3-8,28-31):
# batch-1 = orders before the cutoff; batch-2 = later orders plus revised
# versions of some batch-1 keys carrying a NEW column (batch_id) —
# exercising key upsert AND on_schema_change='append_new_columns'.
# --------------------------------------------------------------------------

_CUTOFF = "1997-01-01"


def q_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_totalprice").alias("total_price"),
    )
    existing = orders.filter(F.col("order_date") < F.lit(_CUTOFF))
    fresh = orders.filter(F.col("order_date") >= F.lit(_CUTOFF)).withColumn(
        "batch_id", F.lit("b2")
    )
    # integer-space revision (common.py float discipline): price has 2
    # decimals so price*1.1 terminates at 3 — r2 of that sits exactly on
    # the .xx5 half boundary, where Spark rounds the double's decimal
    # string HALF_UP while DuckDB rounds its binary value (verified:
    # 71995.15*1.1 -> .67 vs .66). Snap to integer thousandths, then
    # half-up to cents in integer arithmetic — identical on both engines.
    m = F.round(F.col("total_price") * 1100).cast("bigint")
    revised_price = F.floor((m + F.lit(5)) / F.lit(10)).cast("bigint") / F.lit(100.0)
    revised = (
        orders.filter((F.col("order_date") < F.lit(_CUTOFF)) & (F.col("order_key") % 97 == 0))
        .withColumn("total_price", revised_price)
        .withColumn("batch_id", F.lit("b2-rev"))
    )
    incoming = fresh.unionByName(revised)
    return merge_upsert(existing, incoming, "order_key")


ORACLE_INCREMENTAL_UPSERT = f"""
WITH existing AS (
  SELECT o_orderkey AS order_key, o_custkey AS cust_key,
         o_orderdate AS order_date, o_totalprice AS total_price
  FROM orders WHERE o_orderdate < DATE '{_CUTOFF}'
),
incoming AS (
  SELECT o_orderkey AS order_key, o_custkey AS cust_key,
         o_orderdate AS order_date, o_totalprice AS total_price, 'b2' AS batch_id
  FROM orders WHERE o_orderdate >= DATE '{_CUTOFF}'
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(floor((CAST(round(o_totalprice * 1100) AS BIGINT) + 5) / 10) AS BIGINT) / 100.0,
         'b2-rev'
  FROM orders WHERE o_orderdate < DATE '{_CUTOFF}' AND o_orderkey % 97 = 0
)
SELECT e.order_key, e.cust_key, e.order_date, e.total_price,
       CAST(NULL AS VARCHAR) AS batch_id
FROM existing e
WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.order_key = e.order_key)
UNION ALL
SELECT * FROM incoming
"""


# --------------------------------------------------------------------------
# q_scd2_snapshot — OP-SINK-SCD2 (snap_gdp_history.sql:4-11): two snapshot
# passes over deterministic customer states. Keys %10==3 appear only in
# state-2 (new), %10==7 only in state-1 (hard delete), %5==0 change the
# check column between states, the rest carry through.
# --------------------------------------------------------------------------

_T1 = "2024-01-01 00:00:00"
_T2 = "2024-02-01 00:00:00"


def q_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    state1 = cust.filter(F.col("c_custkey") % 10 != 3)
    state2 = cust.filter(F.col("c_custkey") % 10 != 7).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 100.0).otherwise(
            F.col("c_acctbal")
        ),
    )
    snap1 = scd2_merge(None, state1, "c_custkey", ["c_acctbal"], F.lit(_T1).cast("timestamp"))
    final = scd2_merge(snap1, state2, "c_custkey", ["c_acctbal"], F.lit(_T2).cast("timestamp"))
    return final.select(
        "c_custkey", "c_name", "c_acctbal", "valid_from", "valid_to", "is_current"
    )


ORACLE_SCD2_SNAPSHOT = f"""
WITH state1 AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 10 != 3
),
state2 AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_custkey % 10 != 7
)
-- closed: check-col changed between states
SELECT s1.c_custkey, s1.c_name, s1.c_acctbal,
       TIMESTAMP '{_T1}' AS valid_from, TIMESTAMP '{_T2}' AS valid_to, FALSE AS is_current
FROM state1 s1 JOIN state2 s2 USING (c_custkey)
WHERE s1.c_acctbal IS DISTINCT FROM s2.c_acctbal
UNION ALL
-- closed: hard-deleted keys
SELECT s1.c_custkey, s1.c_name, s1.c_acctbal,
       TIMESTAMP '{_T1}', TIMESTAMP '{_T2}', FALSE
FROM state1 s1
WHERE NOT EXISTS (SELECT 1 FROM state2 s2 WHERE s2.c_custkey = s1.c_custkey)
UNION ALL
-- carried: unchanged
SELECT s1.c_custkey, s1.c_name, s1.c_acctbal,
       TIMESTAMP '{_T1}', CAST(NULL AS TIMESTAMP), TRUE
FROM state1 s1 JOIN state2 s2 USING (c_custkey)
WHERE s1.c_acctbal IS NOT DISTINCT FROM s2.c_acctbal
UNION ALL
-- opened: new key or fresh version of a changed key
SELECT s2.c_custkey, s2.c_name, s2.c_acctbal,
       TIMESTAMP '{_T2}', CAST(NULL AS TIMESTAMP), TRUE
FROM state2 s2 LEFT JOIN state1 s1 USING (c_custkey)
WHERE s1.c_custkey IS NULL OR s1.c_acctbal IS DISTINCT FROM s2.c_acctbal
"""


# --------------------------------------------------------------------------
# q_registry_pipeline — OP-SINK-VIEW + registry ref-DAG (SURVEY §3.1): a
# 3-layer staging→intermediate→mart chain built through the registry;
# ctx.ref composes everything into ONE Catalyst plan (views cost nothing).
# --------------------------------------------------------------------------


def q_registry_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = Registry()
    reg.source("lineitem", lambda s: load(s, sf_dir, "lineitem"))
    reg.source("supplier", lambda s: load(s, sf_dir, "supplier"))
    reg.source("nation", lambda s: load(s, sf_dir, "nation"))

    @reg.model("stg_lineitem")
    def stg(ctx):
        li = ctx.source("lineitem")
        return li.filter(F.col("l_quantity") > 0).select(
            "l_suppkey",
            F.year("l_shipdate").alias("ship_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )

    @reg.model("int_nation_revenue")
    def int_rev(ctx):
        stg_li = ctx.ref("stg_lineitem")
        supp = ctx.source("supplier").select("s_suppkey", "s_nationkey")
        nation = ctx.source("nation").select("n_nationkey", "n_name")
        return (
            stg_li.join(supp, stg_li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation_name"), "ship_year")
            .agg(money4_sum_r2(F.col("revenue")).alias("revenue"))
        )

    @reg.model("mart_nation_rank")
    def mart(ctx):
        df = ctx.ref("int_nation_revenue")
        w = Window.partitionBy("ship_year").orderBy(F.col("revenue").desc())
        return df.select("nation_name", "ship_year", "revenue", F.rank().over(w).alias("rk"))

    return reg.context(spark).ref("mart_nation_rank")


ORACLE_REGISTRY_PIPELINE = f"""
WITH stg AS (
  SELECT l_suppkey, year(l_shipdate) AS ship_year,
         l_extendedprice * (1 - l_discount) AS revenue
  FROM lineitem WHERE l_quantity > 0
),
int_rev AS (
  SELECT n.n_name AS nation_name, stg.ship_year, {money4_sum_sql("stg.revenue")} AS revenue
  FROM stg JOIN supplier s ON stg.l_suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT nation_name, ship_year, revenue,
       rank() OVER (PARTITION BY ship_year ORDER BY revenue DESC) AS rk
FROM int_rev
"""


# --------------------------------------------------------------------------
# q_seed_eu_status — OP-SRC-SEED (seeds/country_metadata.csv +
# dbt_project.yml:55-63 typed load) + the dim_country eu_status derivation
# (dim_country.sql:58-62).
# --------------------------------------------------------------------------

# absolute, derived from __file__ like every other package path — a
# hardcoded checkout root would break the oracle on any other clone
_SEED_CSV = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sources", "seeds", "country_metadata.csv",
)


def q_seed_eu_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    seed = load_seed(spark)
    eu_status = (
        F.when(F.col("eurozone_member"), "Eurozone")
        .when(F.col("eu_member_since").isNotNull(), "EU (non-Euro)")
        .otherwise("Non-EU")
    )
    # emitted as string: a nullable date column round-trips differently
    # through the two engines' pandas paths (None vs NaT) in the hash
    # compare; the typed DateType load is still exercised upstream.
    return seed.select(
        "country_code",
        "country_name",
        F.col("eu_member_since").cast("string").alias("eu_member_since"),
        "eurozone_member",
        "region",
        eu_status.alias("eu_status"),
    )


ORACLE_SEED_EU_STATUS = f"""
SELECT
  country_code,
  country_name,
  CAST(eu_member_since AS VARCHAR) AS eu_member_since,
  eurozone_member,
  region,
  CASE WHEN eurozone_member THEN 'Eurozone'
       WHEN eu_member_since IS NOT NULL THEN 'EU (non-Euro)'
       ELSE 'Non-EU' END AS eu_status
FROM read_csv('{_SEED_CSV}', header=true, columns={{
  'country_code': 'VARCHAR', 'country_name': 'VARCHAR',
  'eu_member_since': 'DATE', 'eurozone_member': 'BOOLEAN',
  'region': 'VARCHAR', 'subregion': 'VARCHAR'}})
"""


# --------------------------------------------------------------------------
# q_avail_agg — OP-AGG-AVAIL (dim_country.sql:32-40): min/max year +
# count(distinct year) per entity.
# --------------------------------------------------------------------------


def q_avail_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    return orders.groupBy(F.col("o_custkey").alias("cust_key")).agg(
        F.min(yr).alias("earliest_year"),
        F.max(yr).alias("latest_year"),
        F.countDistinct(yr).alias("years_with_orders"),
        F.count(F.lit(1)).alias("n_orders"),
    )


ORACLE_AVAIL_AGG = """
SELECT
  o_custkey AS cust_key,
  min(year(o_orderdate)) AS earliest_year,
  max(year(o_orderdate)) AS latest_year,
  count(DISTINCT year(o_orderdate)) AS years_with_orders,
  count(*) AS n_orders
FROM orders
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q_freshness_check — OP-TEST-FRESH (_sources.yml:27-30): max(loaded_at)
# per source vs pinned "now", warn 7d / error 30d.
# --------------------------------------------------------------------------

_FRESH_NOW = "2024-02-05"


def q_freshness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(F.max("ts").alias("max_loaded_at"))
    days = F.datediff(F.lit(_FRESH_NOW).cast("date"), F.to_date("max_loaded_at"))
    # NULL-first error branch (testing/generic.check_freshness parity):
    # a group whose ts are all NULL is a DEAD FEED — without the guard
    # NULL days falls through both thresholds into 'pass'
    status = (
        F.when(days.isNull(), "error")
        .when(days > 30, "error")
        .when(days > 7, "warn")
        .otherwise("pass")
    )
    return agg.select(
        "event_type",
        "max_loaded_at",
        days.alias("days_stale"),
        status.alias("freshness_status"),
    )


ORACLE_FRESHNESS_CHECK = f"""
SELECT
  event_type,
  max(ts) AS max_loaded_at,
  date_diff('day', CAST(max(ts) AS DATE), DATE '{_FRESH_NOW}') AS days_stale,
  CASE WHEN date_diff('day', CAST(max(ts) AS DATE), DATE '{_FRESH_NOW}') IS NULL THEN 'error'
       WHEN date_diff('day', CAST(max(ts) AS DATE), DATE '{_FRESH_NOW}') > 30 THEN 'error'
       WHEN date_diff('day', CAST(max(ts) AS DATE), DATE '{_FRESH_NOW}') > 7 THEN 'warn'
       ELSE 'pass' END AS freshness_status
FROM {EVENTS_NORM_SQL} e
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q_contract_check — OP-TEST-CONTRACT (_marts__models.yml:9-11): diff the
# analyzed plan schema against a declared contract — pure metadata, no job
# for the comparison itself. The declared contract here deliberately
# includes a type mismatch and a missing column so the violation output
# is non-trivial and oracle-checkable.
# --------------------------------------------------------------------------


def q_contract_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        DateType,
        DecimalType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    actual = q_avail_agg(spark, sf_dir).schema
    declared = StructType(
        [
            StructField("cust_key", LongType()),
            StructField("earliest_year", DecimalType(4, 0)),  # mismatch: actual int
            StructField("latest_year", StringType()),  # mismatch: string
            StructField("years_with_orders", LongType()),
            StructField("n_orders", LongType()),
            StructField("loaded_at", DateType()),  # missing from actual
        ]
    )
    declared_names = {f.name: f for f in declared.fields}
    actual_names = {f.name: f for f in actual.fields}
    rows = []
    for name, decl in declared_names.items():
        act = actual_names.get(name)
        if act is None:
            rows.append((name, decl.dataType.simpleString(), None, "missing"))
        elif act.dataType.simpleString() != decl.dataType.simpleString():
            rows.append(
                (name, decl.dataType.simpleString(), act.dataType.simpleString(), "type_mismatch")
            )
        else:
            rows.append((name, decl.dataType.simpleString(), act.dataType.simpleString(), "ok"))
    for name, act in actual_names.items():
        if name not in declared_names:
            rows.append((name, None, act.dataType.simpleString(), "unexpected"))
    # the tabular report must agree with the REAL operator
    # (testing.contracts.diff_contract_structured — what Context.ref
    # enforces): every non-ok row corresponds to a structured problem
    # and vice versa, so the oracle verdict certifies the operator, not
    # an inline reimplementation that could drift. Structured access
    # (p.name) and a real exception: no message-format parsing, and
    # the check survives python -O (assert would be stripped).
    from ..testing.contracts import ContractViolation, diff_contract_structured

    problems = diff_contract_structured(actual, declared)
    flagged = {name for name, _, _, st in rows if st != "ok"}
    referenced = {p.name for p in problems}
    if flagged != referenced:
        raise ContractViolation(
            f"contract_check report disagrees with diff_contract: "
            f"report flagged {sorted(flagged)}, operator flagged {sorted(referenced)}"
        )
    return local_df(
        spark, rows, "column_name string, declared_type string, actual_type string, status string"
    )


ORACLE_CONTRACT_CHECK = """
SELECT * FROM (VALUES
  ('cust_key',          'bigint',       'bigint', 'ok'),
  ('earliest_year',     'decimal(4,0)', 'int',    'type_mismatch'),
  ('latest_year',       'string',       'int',    'type_mismatch'),
  ('years_with_orders', 'bigint',       'bigint', 'ok'),
  ('n_orders',          'bigint',       'bigint', 'ok'),
  ('loaded_at',         'date',         NULL,     'missing')
) AS t(column_name, declared_type, actual_type, status)
"""


# --------------------------------------------------------------------------
# q_notnull_violations — OP-TEST-NOTNULL (_staging__models.yml:16-17):
# violation rows via testing.generic.test_not_null, summarized per group.
# --------------------------------------------------------------------------


def q_notnull_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        test_not_null(ev, "value")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_null_value"))
    )


ORACLE_NOTNULL_VIOLATIONS = """
SELECT event_type, count(*) AS n_null_value
FROM events
WHERE value IS NULL
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q_jsonstat_decode — OP-SRC-JSONSTAT (extract_eurostat.py:120-178): native
# stride decode of a JSON-stat payload (posexplode + div/mod, no Python).
# The payload is a fixed literal so the oracle verifies exact decode.
# --------------------------------------------------------------------------

_JS_GEO = ["DE", "FR", "IT"]
_JS_TIME = ["2021", "2022", "2023", "2024"]
_JS_VALUES = [
    4200.0, 4300.0, None, 4500.0,
    2900.0, None, 3000.0, 3100.0,
    2100.0, 2150.0, 2200.0, None,
]
_JS_PAYLOAD = json.dumps(
    {
        "id": ["geo", "time"],
        "size": [len(_JS_GEO), len(_JS_TIME)],
        "dimension": {"geo": _JS_GEO, "time": _JS_TIME},
        "value": _JS_VALUES,
    }
)


def q_jsonstat_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = decode_jsonstat_str(spark, _JS_PAYLOAD)
    return decoded.select(
        F.col("codes")["geo"].alias("geo_code"),
        F.col("codes")["time"].alias("time_code"),
        F.col("flat_index").cast("int").alias("flat_index"),
        F.col("value"),
    )


def _js_sql_list(xs):
    return "[" + ", ".join("NULL" if x is None else repr(x) for x in xs) + "]"


ORACLE_JSONSTAT_DECODE = f"""
WITH doc AS (
  SELECT {_js_sql_list(_JS_GEO)} AS geo, {_js_sql_list(_JS_TIME)} AS time_,
         {_js_sql_list(_JS_VALUES)} AS value
),
idx AS (SELECT unnest(range({len(_JS_VALUES)})) AS i)
SELECT
  doc.geo[CAST(i // {len(_JS_TIME)} AS INT) + 1] AS geo_code,
  doc.time_[CAST(i % {len(_JS_TIME)} AS INT) + 1] AS time_code,
  CAST(i AS INT) AS flat_index,
  doc.value[CAST(i AS INT) + 1] AS value
FROM doc, idx
WHERE doc.value[CAST(i AS INT) + 1] IS NOT NULL
"""


# --------------------------------------------------------------------------
# q_rest_ingest — OP-SRC-REST + OP-SINK-RAWLOAD (extract_eurostat.py:79-117
# fetch, :181-226,319-353 load): end-to-end ingest with an injected
# fixture transport (no network): fetch 2 datasets -> Spark-side JSON-stat
# decode -> full-refresh load of the first, append of the second ->
# read-back. The oracle replays the stride decode over the same fixtures.
# --------------------------------------------------------------------------

_JS2_GEO = ["ES", "PL"]
_JS2_VALUES = [13.0, 14.1, None, 12.2, 3.4, 3.0, 5.6, None]
_JS2_PAYLOAD = json.dumps(
    {
        "id": ["geo", "time"],
        "size": [len(_JS2_GEO), len(_JS_TIME)],
        "dimension": {"geo": _JS2_GEO, "time": _JS_TIME},
        "value": _JS2_VALUES,
    }
)
_REST_FIXTURES = {"nama_10_gdp": _JS_PAYLOAD, "une_rt_m": _JS2_PAYLOAD}


_REST_SCRATCH: str | None = None


@__import__("atexit").register
def _cleanup_rest_scratch() -> None:
    # same leak class as storage._LAYOUT_CACHE: per-process scratch
    # must not accumulate in /tmp across gate/bench invocations
    import shutil

    if _REST_SCRATCH is not None:
        shutil.rmtree(_REST_SCRATCH, ignore_errors=True)
# (appId, session identity) → per-dataset decoded extract frames. The
# extract chain is a PURE plan over static fixture payloads (~50 py4j
# Column constructions through the JSON-stat decoder, built twice per
# ingest run) — only the LOAD below is effectful and must re-run per
# call. Same liveness argument as common._PLAN_CACHE.
_EXTRACT_CACHE: dict[tuple[str, int], dict[str, DataFrame]] = {}


def q_rest_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.jsonstat import decode_jsonstat
    from ..sources.rest import fetch_datasets, load_raw

    def fixture_transport(url: str, params) -> str:
        code = url.rsplit("?", 1)[0].rsplit("/", 1)[-1]
        return _REST_FIXTURES[code]

    skey = (spark.sparkContext.applicationId, id(spark))
    extracts = _EXTRACT_CACHE.setdefault(skey, {})

    def extract(code: str) -> DataFrame:
        cached = extracts.get(code)
        if cached is not None:
            return cached
        payloads = fetch_datasets(
            spark, [code], params={"format": "JSON", "geo": ["DE", "FR"]},
            fetch_fn=fixture_transport,
        )
        decoded = decode_jsonstat(payloads.select("dataset_code", "payload"))
        # dataset_code passes through the decoder (non-payload columns
        # are preserved), so a many-dataset frame could decode in one
        # pass; the per-dataset loop here mirrors the reference's
        # extract loop shape
        out = decoded.select(
            "dataset_code",
            F.col("codes")["geo"].alias("geo_code"),
            F.col("codes")["time"].alias("time_code"),
            F.col("value"),
        )
        extracts[code] = out
        return out

    # one scratch dir per process, reused across invocations
    # (full_refresh=True overwrites in place): an effectful query that
    # mkdtemp'd per call would litter /tmp with one directory per
    # bench/correctness repetition for the life of the machine.
    # CONTRACT (same as q_stream_incremental): the returned frame reads
    # this scratch path lazily — materialize it BEFORE the next
    # q_rest_ingest call, whose overwrite replaces the part files a
    # held frame would list at action time
    global _REST_SCRATCH
    if _REST_SCRATCH is None:
        _REST_SCRATCH = tempfile.mkdtemp(prefix="rest_raw_")
    raw_path = _REST_SCRATCH + "/raw_eurostat"
    # files_per_shard=None: each shard decodes from a one-payload local
    # relation (already a single partition) — no exchange needed.
    load_raw(
        extract("nama_10_gdp"), raw_path,
        full_refresh=True, read_back=False, files_per_shard=None,
    )
    return load_raw(extract("une_rt_m"), raw_path, files_per_shard=None)


def _rest_expected_rows():
    for code, geo_list, values in (
        ("nama_10_gdp", _JS_GEO, _JS_VALUES),
        ("une_rt_m", _JS2_GEO, _JS2_VALUES),
    ):
        for flat, v in enumerate(values):
            if v is not None:
                yield code, geo_list[flat // len(_JS_TIME)], _JS_TIME[flat % len(_JS_TIME)], v


ORACLE_REST_INGEST = "SELECT * FROM (VALUES\n" + ",\n".join(
    f"  ('{c}', '{g}', '{t}', {v})" for c, g, t, v in _rest_expected_rows()
) + "\n) AS t(dataset_code, geo_code, time_code, value)"


# --------------------------------------------------------------------------
# q_unit_test_mock — OP-TEST-UNIT (_intermediate__unit_tests.yml:8-34): the
# reference's gdp-per-capita unit test run THROUGH the registry with
# mock-ref injection; the query returns the model's output over the mock
# inputs so the oracle pins the expected rows (incl. zero-population →
# null, not error).
# --------------------------------------------------------------------------


def q_unit_test_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..models.econ import build_registry
    from ..testing.unit import mock_df

    registry = build_registry()
    gdp_schema = "country_code string, reference_year int, gdp_million_eur double, _extracted_at string"
    pop_schema = "country_code string, reference_year int, population_count double"
    unemp_schema = (
        "country_code string, country_name string, reference_year int, reference_month int, "
        "reference_date date, unemployment_rate_pct double"
    )
    infl_schema = (
        "country_code string, reference_year int, reference_date date, inflation_rate_mom_pct double"
    )
    given = {
        "stg_eurostat__gdp": mock_df(
            spark,
            [
                {"country_code": "DE", "reference_year": 2023, "gdp_million_eur": 4000000.0, "_extracted_at": "x"},
                {"country_code": "MT", "reference_year": 2023, "gdp_million_eur": 18000.0, "_extracted_at": "x"},
                {"country_code": "XX", "reference_year": 2023, "gdp_million_eur": 1000.0, "_extracted_at": "x"},
            ],
            gdp_schema,
        ),
        "stg_eurostat__population": mock_df(
            spark,
            [
                {"country_code": "DE", "reference_year": 2023, "population_count": 84000000.0},
                {"country_code": "MT", "reference_year": 2023, "population_count": 520000.0},
                {"country_code": "XX", "reference_year": 2023, "population_count": 0.0},
            ],
            pop_schema,
        ),
        "stg_eurostat__unemployment": mock_df(spark, [], unemp_schema),
        "stg_eurostat__inflation": mock_df(spark, [], infl_schema),
    }
    ctx = registry.context(spark, mocks=given)
    out = ctx.ref("int_country_annual_metrics")
    return out.select(
        "country_code",
        "reference_year",
        F.round("gdp_per_capita_eur", 6).alias("gdp_per_capita_eur"),
    )


ORACLE_UNIT_TEST_MOCK = """
SELECT * FROM (VALUES
  ('DE', 2023, 47619.047619),
  ('MT', 2023, 34615.384615),
  ('XX', 2023, CAST(NULL AS DOUBLE))
) AS t(country_code, reference_year, gdp_per_capita_eur)
"""


# --------------------------------------------------------------------------
# q_schema_test_suite — the `dbt test` runner surface: declarative
# per-model column tests (reference _staging__models.yml:11-17,
# _marts__models.yml:80-93 shapes: unique / not_null / relationships /
# accepted_values) compiled into ONE unioned count plan
# (testing/schedule.py). The parent model filters its rows and the
# accepted set omits one real status so two of the six tests return
# non-zero violations — proving detection, not just green paths.
# --------------------------------------------------------------------------


def q_schema_test_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..testing.schedule import schema_test_report

    reg = Registry()
    reg.source("orders", lambda s: load(s, sf_dir, "orders"))
    reg.source("customer", lambda s: load(s, sf_dir, "customer"))

    @reg.model(
        "stg_customer",
        tests=(("unique", "c_custkey"), ("not_null", "c_name")),
    )
    def stg_customer(ctx):
        return ctx.source("customer").filter(F.col("c_acctbal") > 0)

    @reg.model(
        "stg_orders",
        tests=(
            ("unique", "o_orderkey"),
            ("not_null", "o_custkey"),
            ("relationships", "o_custkey", "stg_customer", "c_custkey"),
            ("accepted_values", "o_orderstatus", ("O", "F")),
        ),
    )
    def stg_orders(ctx):
        return ctx.source("orders")

    return schema_test_report(reg, reg.context(spark))


ORACLE_SCHEMA_TEST_SUITE = """
SELECT 'stg_customer' AS model, 'unique' AS test, 'c_custkey' AS "column",
  (SELECT count(*) FROM (SELECT c_custkey FROM customer
   WHERE c_acctbal > 0 AND c_custkey IS NOT NULL
   GROUP BY 1 HAVING count(*) > 1)) AS violations
UNION ALL
SELECT 'stg_customer', 'not_null', 'c_name',
  (SELECT count(*) FROM customer WHERE c_acctbal > 0 AND c_name IS NULL)
UNION ALL
SELECT 'stg_orders', 'unique', 'o_orderkey',
  (SELECT count(*) FROM (SELECT o_orderkey FROM orders
   WHERE o_orderkey IS NOT NULL GROUP BY 1 HAVING count(*) > 1))
UNION ALL
SELECT 'stg_orders', 'not_null', 'o_custkey',
  (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
UNION ALL
SELECT 'stg_orders', 'relationships', 'o_custkey',
  (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
   AND NOT EXISTS (
     SELECT 1 FROM customer c WHERE c.c_acctbal > 0 AND c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'stg_orders', 'accepted_values', 'o_orderstatus',
  (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O', 'F'))
"""


QUERIES = [
    # incremental_upsert / scd2_snapshot build PURE merge plans
    # (merge_upsert / scd2_merge do no I/O — the run_* wrappers own
    # the filesystem), so they plan-cache like any declarative query
    QueryDef("incremental_upsert", q_incremental_upsert, ORACLE_INCREMENTAL_UPSERT, ("OP-SINK-INCR",)),
    QueryDef("scd2_snapshot", q_scd2_snapshot, ORACLE_SCD2_SNAPSHOT, ("OP-SINK-SCD2",)),
    # registry_pipeline is PURE plan construction (lazy views composed
    # via ctx.ref — no writes, no actions), so the plan caches like its
    # siblings; OP-SINK-TABLE's effectful write path is exercised by
    # tests/test_registry.py + materialize/run.py, not by this builder
    QueryDef("registry_pipeline", q_registry_pipeline, ORACLE_REGISTRY_PIPELINE, ("OP-SINK-VIEW", "OP-SINK-TABLE")),
    QueryDef("seed_eu_status", q_seed_eu_status, ORACLE_SEED_EU_STATUS, ("OP-SRC-SEED",)),
    QueryDef("avail_agg", q_avail_agg, ORACLE_AVAIL_AGG, ("OP-AGG-AVAIL", "OP-AGG-ROWCOUNT")),
    QueryDef("freshness_check", q_freshness_check, ORACLE_FRESHNESS_CHECK, ("OP-TEST-FRESH",)),
    QueryDef("contract_check", q_contract_check, ORACLE_CONTRACT_CHECK, ("OP-TEST-CONTRACT",)),
    QueryDef("notnull_violations", q_notnull_violations, ORACLE_NOTNULL_VIOLATIONS, ("OP-TEST-NOTNULL",)),
    QueryDef("jsonstat_decode", q_jsonstat_decode, ORACLE_JSONSTAT_DECODE, ("OP-SRC-JSONSTAT",)),
    QueryDef("rest_ingest", q_rest_ingest, ORACLE_REST_INGEST, ("OP-SRC-REST", "OP-SINK-RAWLOAD"), effectful=True),
    # pure: the builder only constructs the mock-injected plan (the
    # given-rows live in LocalRelations; no writes, no driver actions),
    # so the plan caches like any declarative query
    QueryDef("unit_test_mock", q_unit_test_mock, ORACLE_UNIT_TEST_MOCK, ("OP-TEST-UNIT",)),
    QueryDef(
        "schema_test_suite",
        q_schema_test_suite,
        ORACLE_SCHEMA_TEST_SUITE,
        ("OP-TEST-UNIQUE", "OP-TEST-NOTNULL", "OP-TEST-REL"),
    ),
]
