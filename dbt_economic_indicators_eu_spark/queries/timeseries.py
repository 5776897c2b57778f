"""Time-series operator demos: as-of join, range join, multi-granularity
rollup, sketch aggregates, wide pivot.

These are the "operators the engine lacks" extensions (EXT-ASOF-JOIN,
EXT-RANGE-JOIN, EXT-ROLLUP-TIME, EXT-SKETCH-APPROX, EXT-PIVOT-WIDE) —
the time-series / OLAP surface an economic-indicator user reaches for
next: attach the latest prior reading to an observation (as-of), match
points into reporting windows (range join), one-pass day/total rollups
(grouping sets), sketch-based distinct/quantile for the 100 TB path,
and long→wide reshaping (pivot). Reference analogues: the lag/window
macros of ``macros/calculations.sql`` and the wide mart layout of
``models/marts/rpt_annual_economic_summary.sql`` — re-expressed on the
synthetic event/order tables so DuckDB can verify them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.rangejoin import range_join
from .common import (
    EVENTS_NORM_SQL,
    QueryDef,
    epoch_micros,
    finite_or_null,
    finite_or_null_sql,
    load,
    r2,
    r6,
)

# --------------------------------------------------------------------------
# q_asof_join — EXT-ASOF-JOIN: for every 'view' event, the most recent
# at-or-before 'purchase' of the same user (operators/asof.py: one
# shuffle, union+window — see module docstring for why not a range
# join). Right side is pre-aggregated to one row per (user, ts) with
# max_by so timestamp ties are deterministic in both engines; the
# winning row's value is carried through even when NULL (the oracle
# mirrors this with a row_number window — arg_max would skip NULLs).
# Oracle: DuckDB's native ASOF LEFT JOIN.
# --------------------------------------------------------------------------


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event_id"), "ts", "value"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(
            F.max("event_id").alias("purchase_event_id"),
            F.max_by("value", "event_id").alias("purchase_value"),
        )
    )
    joined = asof_join(
        views,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="purchase_ts",
        values=["purchase_ts", "purchase_event_id", "purchase_value"],
    )
    return joined.select(
        "user_id",
        "view_event_id",
        "ts",
        "value",
        "purchase_event_id",
        "purchase_value",
        (epoch_micros(F.col("ts")) - epoch_micros(F.col("purchase_ts"))).alias(
            "micros_since_purchase"
        ),
    )


ORACLE_ASOF_JOIN = f"""
WITH ev AS (SELECT * FROM {EVENTS_NORM_SQL} e),
v AS (
  SELECT user_id, event_id AS view_event_id, ts, value
  FROM ev WHERE event_type = 'view'
),
p AS (
  -- row_number, NOT arg_max(value, event_id): DuckDB's arg_max skips
  -- NULL args (a NULL-valued winner would fall back to a lower
  -- event_id's value), while Spark's max_by carries the winning row's
  -- value through even when it is NULL. The window form pins "the
  -- value of the max-event_id row, NULL included" on both engines.
  SELECT user_id, ts AS purchase_ts,
         event_id AS purchase_event_id, value AS purchase_value
  FROM (
    SELECT user_id, ts, event_id, value,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT
  v.user_id, v.view_event_id, v.ts, v.value,
  p.purchase_event_id, p.purchase_value,
  epoch_us(v.ts) - epoch_us(p.purchase_ts) AS micros_since_purchase
FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts >= p.purchase_ts
"""


# --------------------------------------------------------------------------
# q_range_join_agg — EXT-RANGE-JOIN: shipments falling inside 7-day
# windows opened by sampled orders (operators/rangejoin.py: bin-
# bucketed equi-join, intervals broadcast — never a nested loop).
# Oracle: plain BETWEEN join (DuckDB plans its own IEJoin).
# --------------------------------------------------------------------------

_RANGE_BIN_SECONDS = 7 * 86400  # bin ≈ interval length → ~1-2 bins each


def q_range_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_shipdate", "l_quantity")
    windows = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 1000 == 0)
        .select(
            F.col("o_orderkey").alias("window_key"),
            F.col("o_orderdate").alias("window_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("window_end"),
        )
    )
    matched = range_join(
        li,
        "l_shipdate",
        windows,
        "window_start",
        "window_end",
        _RANGE_BIN_SECONDS,
        broadcast_intervals=True,
    )
    return matched.groupBy("window_key", "window_start").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        r2(F.sum("l_quantity")).alias("total_qty"),
    )


ORACLE_RANGE_JOIN_AGG = """
SELECT
  o.o_orderkey AS window_key,
  o.o_orderdate AS window_start,
  count(*) AS n_shipments,
  round(sum(l.l_quantity), 2) AS total_qty
FROM orders o
JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
WHERE o.o_orderkey % 1000 = 0
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q_rollup_time — EXT-ROLLUP-TIME: hypertable-style multi-granularity
# rollup in ONE scan via ROLLUP grouping sets (event_type, day) →
# per-type-per-day, per-type, and grand-total rows with grouping
# flags. At scale this is strictly better than 3 separate groupBys:
# one shuffle, partial aggregation map-side, no re-read.
#
# Empty-input semantics (pinned, round 12): an EMPTY events table
# yields an EMPTY rollup. ANSI grouping sets (and DuckDB) emit the
# empty grouping set's grand-total row (NULL, NULL, 0, NULL) even
# over zero input rows; Spark's rollup emits nothing (the grouping-id
# is an aggregation key, so no input rows → no groups — found by the
# empty-corpus regime gate). This engine pins the Spark behavior —
# a rollup over no data reports no windows — and the oracle mirrors
# it with HAVING count(*) > 0, vacuous on any non-empty input.
# --------------------------------------------------------------------------


def q_rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day boundary as TIMESTAMP, not DATE: both engines hand a timestamp
    # to the comparison layer identically, DATE stringifies differently
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", F.col("ts")).alias("event_day"), "value"
    )
    return ev.rollup("event_type", "event_day").agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("event_day").cast("int").alias("g_day"),
        F.count(F.lit(1)).alias("n_events"),
        r2(F.sum("value")).alias("total_value"),
    )


ORACLE_ROLLUP_TIME = f"""
SELECT
  event_type,
  date_trunc('day', ts) AS event_day,
  CAST(GROUPING(event_type) AS INTEGER) AS g_type,
  CAST(GROUPING(date_trunc('day', ts)) AS INTEGER) AS g_day,
  count(*) AS n_events,
  round(sum(value), 2) AS total_value
FROM {EVENTS_NORM_SQL} e
GROUP BY ROLLUP(event_type, date_trunc('day', ts))
-- empty-input twin pin (see q_rollup_time docstring): drop the ANSI
-- grand-total row DuckDB emits over zero input rows; on non-empty
-- input every rollup row has count(*) >= 1, so this filters nothing
HAVING count(*) > 0
"""


# --------------------------------------------------------------------------
# q_sketch_agg — EXT-SKETCH-APPROX: the 100 TB path for distinct counts
# and quantiles is sketches (HLL, t-digest/KLL) — mergeable, bounded
# memory, one pass. Exact countDistinct re-shuffles by value; exact
# percentile buffers the group. Both engines' sketches are internally
# deterministic but algorithm-specific, so the oracle checks the
# CONTRACT, not the estimate: the approximation must land within
# tolerance of the exact answer (emitted alongside). Exact quartile
# interpolations of 2-dec data terminate ≤6 digits → r6 is parity-safe
# (queries/common.py discipline).
# --------------------------------------------------------------------------


def q_sketch_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two branches joined on the 5-row group key instead of one agg:
    # mixing countDistinct with a TypedImperativeAggregate (percentile)
    # makes Catalyst plan an Expand (×2 row blowup) feeding a single
    # SortAggregate that buffers every expanded row — measured 7.5s at
    # sf0.1 vs ~0.6s for this split shape. Sketches and exact distinct
    # each keep their natural partial-agg hash plan; the join is a
    # broadcast of a handful of rows.
    ev = load(spark, sf_dir, "events")
    # finite-guarded value for the quantiles (common.finite_or_null:
    # DuckDB's quantile_cont POISONS on a NaN in the group while
    # Spark's percentile skips it — both engines quantile only finite
    # values, same shared recipe as q_anomaly_zscore's quartiles)
    vfin = finite_or_null(F.col("value"))
    exact_p50 = F.percentile(vfin, F.lit(0.5))
    approx_p50 = F.percentile_approx(vfin, F.lit(0.5), F.lit(10000))
    sketches = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("_approx_users"),
        exact_p50.alias("_p50_raw"),
        approx_p50.alias("_p50_approx"),
        # scale anchor for the p50 tolerance floor (see below); NULL
        # (0/1 finite values) coalesces to 0 — with a single value
        # every sketch returns it exactly, so a zero floor is safe
        F.stddev_samp(vfin).alias("_vsd"),
    )
    exact = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        # count(user_id), NOT count(1): SQL count(DISTINCT user_id)
        # skips NULL users, while counting the distinct ROWS would
        # include the ('type', NULL) pair — off-by-one vs the oracle
        # (and vs approx_count_distinct, which also skips NULLs)
        .agg(F.count("user_id").alias("n_users_exact"))
    )
    # null-safe join key: a NULL event_type group exists on BOTH sides
    # (groupBy keeps it), but a plain equi-join would drop it
    return sketches.join(
        F.broadcast(exact.withColumnRenamed("event_type", "_et")),
        sketches["event_type"].eqNullSafe(F.col("_et")),
    ).select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("_approx_users") - F.col("n_users_exact"))
            <= 0.1 * F.col("n_users_exact")
        ).alias("hll_within_10pct"),
        r6(F.col("_p50_raw")).alias("p50_exact"),
        # tolerance floored at 5% of the group's stddev: a pure
        # 0.05*abs(median) bound collapses to ZERO when the exact
        # median is 0 (e.g. a zero-heavy or symmetric regime), and
        # each engine compares its OWN sketch algorithm (Spark GK
        # returns a data element -> exactly 0; DuckDB t-digest
        # interpolates -> near-zero nonzero) against that bound — the
        # booleans would diverge on a semantically-fine query. The
        # stddev floor keeps the check meaningful at any value scale.
        (
            F.abs(F.col("_p50_approx") - F.col("_p50_raw"))
            <= 0.05
            * F.greatest(
                F.abs(F.col("_p50_raw")),
                F.coalesce(F.col("_vsd"), F.lit(0.0)),
            )
        ).alias("p50_within_5pct"),
    )


ORACLE_SKETCH_AGG = f"""
-- vf: finite-guarded value for quantiles (quantile_cont poisons on
-- NaN; Spark's percentile skips it — see q_sketch_agg). p50 tolerance
-- floored at 5% of stddev: the Spark-side comment on p50_within_5pct
-- explains the zero-median divergence this prevents.
WITH e AS (
  SELECT *, {finite_or_null_sql("value")} AS vf
  FROM {EVENTS_NORM_SQL} t
)
SELECT
  event_type,
  count(DISTINCT user_id) AS n_users_exact,
  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
    <= 0.1 * count(DISTINCT user_id) AS hll_within_10pct,
  round(quantile_cont(vf, 0.5), 6) AS p50_exact,
  abs(approx_quantile(vf, 0.5) - quantile_cont(vf, 0.5))
    <= 0.05 * greatest(abs(quantile_cont(vf, 0.5)),
                       coalesce(stddev_samp(vf), 0)) AS p50_within_5pct
FROM e
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q_pivot_events — EXT-PIVOT-WIDE: long→wide reshape, the shape of the
# reference's wide marts (rpt_annual_economic_summary: one row per
# country-year, one column set per indicator). Pivot values are pinned
# explicitly — with an inferred value list Spark runs an extra distinct
# job AND the output schema becomes data-dependent, which breaks
# contracts; at scale the value list is metadata, not discovery.
# --------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.sum("value")).alias("total"),
        )
    )
    # COUNT of an absent pivot cell is 0, not NULL (Spark's pivot emits
    # NULL for cells with no rows; SQL's count(*) FILTER — and any
    # sane count — says 0). SUM stays NULL for empty cells in both.
    return wide.select(
        "user_id",
        *[
            c
            for t in _EVENT_TYPES
            for c in (
                F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"{t}_n"),
                F.col(f"{t}_total"),
            )
        ],
    )


ORACLE_PIVOT_EVENTS = (
    "SELECT user_id,\n"
    + ",\n".join(
        f"  count(*) FILTER (WHERE event_type = '{t}') AS {t}_n,\n"
        f"  round(sum(value) FILTER (WHERE event_type = '{t}'), 2) AS {t}_total"
        for t in _EVENT_TYPES
    )
    + "\nFROM events GROUP BY user_id"
)


QUERIES = [
    QueryDef("asof_join", q_asof_join, ORACLE_ASOF_JOIN, ("EXT-ASOF-JOIN",)),
    QueryDef("range_join_agg", q_range_join_agg, ORACLE_RANGE_JOIN_AGG, ("EXT-RANGE-JOIN",)),
    QueryDef("rollup_time", q_rollup_time, ORACLE_ROLLUP_TIME, ("EXT-ROLLUP-TIME",)),
    QueryDef("sketch_agg", q_sketch_agg, ORACLE_SKETCH_AGG, ("EXT-SKETCH-APPROX",)),
    QueryDef("pivot_events", q_pivot_events, ORACLE_PIVOT_EVENTS, ("EXT-PIVOT-WIDE",)),
]
