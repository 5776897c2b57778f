"""Time-series / ML operator demos (SURVEY.md §2.9) over the synthetic
``events`` table.

The reference implements these as single-process pandas models
(py_anomaly_detection.py, py_data_quality_scores.py,
py_unemployment_forecast.py). Here:

- anomaly detection + quality scorecard are **fully native** Spark SQL
  (window functions + one groupBy — no Python in the hot path, scales
  linearly with partition count);
- OLS forecasting is closed-form via ``regr_slope``/``regr_intercept``
  (pure JVM aggregation);
- the ES/Holt ensemble forecast expresses the per-series recursions
  as native ``F.aggregate`` left folds over sorted
  ``collect_list`` arrays — sequential within a series, parallel
  across series, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import (
    QueryDef,
    finite_or_null,
    finite_or_null_sql,
    load,
    r2,
    r4,
    r6,
)

# --------------------------------------------------------------------------
# q_anomaly_zscore — OP-ML-ANOM, OP-AGG-ZSCORE, OP-AGG-IQR, OP-FN-PCTCHANGE,
# OP-FN-CLIP, OP-FN-BOOLOR (py_anomaly_detection.py:18-162), re-expressed
# with windows over partitionBy(user_id): no per-group loop, no concat.
# Thresholds match the reference (z>3, 1.5*IQR, |pct_change|>0.5,
# min 10 observations per group).
# --------------------------------------------------------------------------


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit hash repartition on user_id ahead of both branches
    # (guide §2.3 "shuffle fewer bytes" + §2.5 input-side fix for an
    # unsplittable one-file scan). Map-side partial aggregation is a
    # NON-reduction for exact percentile — the partial buffer holds
    # every value in the group — so without this the stats branch's
    # exchange shipped partial_percentile buffers (the whole value
    # column again, serialized object buffers) built inside the
    # single-task scan stage. With REPARTITION_BY_COL first, Catalyst
    # prunes the stats branch to raw (user_id, value) rows through
    # the exchange and runs BOTH aggregate phases post-shuffle at
    # parallel width (plan diff: partial ObjectHashAggregate moves
    # from below to above its Exchange; see
    # plans/r12/anomaly_zscore_{before,after}.txt). Width is
    # deliberately unpinned: AQE treats a keyed repartition without an
    # explicit N as coalescible, so the 100 TB width follows
    # advisoryPartitionSizeInBytes, not a local constant. Measured at
    # sf0.1 (noop sink, min-of-5): 0.563 -> 0.446 full query.
    ev = load(spark, sf_dir, "events").repartition("user_id")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")

    # Per-user stats as a groupBy-agg (map-side partial aggregation, tiny
    # shuffle) joined back on user_id — NOT window functions: an exact
    # percentile window buffers and sorts every partition's full value
    # array per row group. The join reuses the lag-window's
    # hashpartitioning(user_id), so the fact side shuffles exactly once,
    # and AQE broadcasts the stats side when it is small. Exact
    # percentile (matches pandas .quantile / DuckDB quantile_cont) is
    # still required for oracle parity.
    # mean/std are derived from EXACT integer-cents sums, never raw
    # avg/stddev_samp: a double sum's value depends on accumulation
    # order, so the two engines' pre-round doubles differ at ~1 ulp and
    # a rounded z sits a (tiny but nonzero) boundary-flip risk away —
    # the same failure mode that bit forecast_ols in round 2. Snapping
    # each 2-decimal value to integer cents (exact: true value IS the
    # integer) makes the sums associative and bit-identical at any
    # scale; mean/variance are then IDENTICAL double expressions of
    # identical integers in both engines.
    #
    # The finite guard maps NaN/Infinity to NULL (skipped like NULLs,
    # in BOTH engines) instead of crashing the bigint cast — a
    # deliberate deviation from avg/stddev's NaN-poisoning, chosen
    # because a crash takes the whole query down. Observed cents at
    # sf0.1 reach ~56k (squares ~3.2e9), so sum(c*c) has ~3x headroom
    # to int64 at 1e9 rows per user; past that Spark's ANSI sum aborts
    # LOUDLY (no silent corruption). The variance NUMERATOR
    # (nv*sq - si^2) is exact decimal(38,0) integer arithmetic — see
    # below.
    # shared recipe (common.finite_or_null): NULL propagates through
    # the *100/round/cast chain, so the cents path is crash-free too
    vf = finite_or_null(F.col("value"))
    c = F.round(vf * 100).cast("bigint")
    # quartiles over the FINITE-guarded value too: Spark's percentile
    # skips NaN but DuckDB's quantile_cont POISONS on it (NaN sorts
    # greatest and infects the interpolation) — guarding both sides
    # identically (non-finite → NULL → skipped) is the only encoding
    # both engines agree on, consistent with the mean/std guard above
    stats = ev.groupBy("user_id").agg(
        F.sum(c).alias("_si"),
        F.sum(c * c).alias("_sq"),
        F.count(c).alias("_nv"),
        F.count(F.lit(1)).alias("_n_obs"),
        F.percentile(vf, F.lit(0.25)).alias("_q1"),
        F.percentile(vf, F.lit(0.75)).alias("_q3"),
    )
    # null-safe join-back: the groupBy keeps a NULL-user_id stats row
    # and the oracle's PARTITION BY windows keep those events, but a
    # plain equi-join would silently drop them (NULL != NULL)
    ev = (
        ev.withColumn("_prev", F.lag("value").over(w_ord))
        .join(
            stats.withColumnRenamed("user_id", "_uid"),
            F.col("user_id").eqNullSafe(F.col("_uid")),
        )
        .drop("_uid")
    )

    # expression ORDER mirrors the oracle SQL verbatim — identical IEEE
    # ops on identical exact integers are bit-identical across engines.
    # Guards mirror avg/stddev_samp null semantics: mean NULL when no
    # finite values, std NULL below 2 observations.
    #
    # The variance numerator nv*sq - si^2 is computed EXACTLY in
    # decimal(38,0) (si^2 <= 8.5e37 fits): the naive double form
    # sq_d - si_d*si_d/nv cancels catastrophically once si^2 > 2^53
    # (a 1e6-row near-constant series loses ~half the variance), while
    # the exact integer numerator is immune AND non-negative by
    # Cauchy-Schwarz, so no NaN clamp is needed. It rounds to double
    # ONCE, identically in both engines.
    nv = F.col("_nv")
    si_dec = F.col("_si").cast("decimal(38,0)")
    numer = (
        F.col("_sq").cast("decimal(38,0)") * nv.cast("decimal(38,0)")
        - si_dec * si_dec
    ).cast("double")
    mean = F.when(nv >= 1, (F.col("_si").cast("double") / nv) / F.lit(100.0))
    var_c = F.when(nv >= 2, numer / nv / (nv - F.lit(1)))
    std = F.sqrt(var_c) / F.lit(100.0)
    n_obs = F.col("_n_obs")
    q1 = F.col("_q1")
    q3 = F.col("_q3")
    iqr = q3 - q1
    lo = q1 - 1.5 * iqr
    hi = q3 + 1.5 * iqr

    z_raw = F.when((std.isNotNull()) & (std != 0), (F.col("value") - mean) / std).otherwise(
        F.lit(0.0)
    )
    prev = F.col("_prev")
    # raw: computed from identical inputs in both engines → bit-identical
    pct_change = F.when(prev.isNotNull() & (prev != 0), (F.col("value") - prev) / prev)

    enough = n_obs >= 10
    # z is emitted RAW (doctrine #3): mean/std are now deterministic
    # identical doubles in both engines, so the quotient is
    # bit-identical and rounding would only REINTRODUCE the boundary
    # problem (with exact-rational std, z can terminate and land on a
    # .xxxx5 half, where Spark's decimal-repr rounding and DuckDB's
    # binary rounding disagree).
    z = z_raw
    lo6, hi6 = r6(lo), r6(hi)  # r6 safe: interpolated quartiles of 2-dec data terminate ≤5 digits
    is_z = enough & (F.abs(z) > 3.0)
    is_iqr = enough & ((F.col("value") < lo6) | (F.col("value") > hi6))
    is_rate = F.coalesce(enough & (F.abs(pct_change) > 0.5), F.lit(False))

    # clip(|z|,0,5)*20 → 0-100 (reference weights two series at *10 each);
    # raw — derived from the bit-identical raw z
    severity = F.least(F.greatest(F.abs(z), F.lit(0.0)), F.lit(5.0)) * 20.0

    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "value",
        z.alias("z_score"),
        lo6.alias("iqr_lower_bound"),
        hi6.alias("iqr_upper_bound"),
        pct_change.alias("pct_change"),
        is_z.alias("is_zscore_anomaly"),
        is_iqr.alias("is_iqr_outlier"),
        is_rate.alias("is_rate_anomaly"),
        (is_z | is_iqr | is_rate).alias("is_anomaly"),
        severity.alias("severity_score"),
    )


ORACLE_ANOMALY_ZSCORE = f"""
WITH base AS (
  SELECT event_id, user_id, event_type, value,
         CAST(ts AS TIMESTAMP) AS ts,
         -- finite guard mirrors the Spark side (finite_or_null twin):
         -- NaN/Inf skip as NULL instead of crashing the bigint cast
         CAST(round({finite_or_null_sql("value")} * 100) AS BIGINT) AS c
  FROM events
),
-- mean/std from EXACT integer-cents sums (order-independent), the
-- variance numerator nv*sq - si^2 as exact DECIMAL(38,0) integer
-- arithmetic (no cancellation), then IDENTICAL double expressions as
-- the Spark side — see q_anomaly_zscore
sums AS (
  SELECT
    event_id, user_id, event_type, ts, value,
    sum(c) OVER wu AS si,
    sum(c * c) OVER wu AS sq,
    count(c) OVER wu AS nv,
    count(*) OVER wu AS n_obs,
    -- finite-guarded like the cents sums: quantile_cont POISONS on a
    -- NaN in the window (Spark's percentile skips it) — both engines
    -- quantile only finite values (c IS NOT NULL <=> value finite)
    quantile_cont(CASE WHEN c IS NOT NULL THEN value END, 0.25) OVER wu AS q1,
    quantile_cont(CASE WHEN c IS NOT NULL THEN value END, 0.75) OVER wu AS q3,
    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v
  FROM base
  WINDOW wu AS (PARTITION BY user_id)
),
stats AS (
  SELECT
    event_id, user_id, event_type, ts, value, n_obs, q1, q3, prev_v,
    CASE WHEN nv >= 1 THEN (CAST(si AS DOUBLE) / nv) / 100.0 END AS mean_v,
    CASE WHEN nv >= 2 THEN
      sqrt(CAST(CAST(sq AS DECIMAL(38,0)) * CAST(nv AS DECIMAL(38,0))
                - CAST(si AS DECIMAL(38,0)) * CAST(si AS DECIMAL(38,0))
           AS DOUBLE) / nv / (nv - 1)) / 100.0
    END AS std_v
  FROM sums
),
calc AS (
  SELECT
    event_id, user_id, event_type, ts, value,
    CASE WHEN std_v IS NOT NULL AND std_v != 0
          THEN (value - mean_v) / std_v ELSE 0.0 END AS z_score,
    round(q1 - 1.5 * (q3 - q1), 6) AS iqr_lower_bound,
    round(q3 + 1.5 * (q3 - q1), 6) AS iqr_upper_bound,
    CASE WHEN prev_v IS NOT NULL AND prev_v != 0
          THEN (value - prev_v) / prev_v END AS pct_change,
    n_obs >= 10 AS enough
  FROM stats
)
SELECT
  event_id, user_id, event_type, ts, value,
  z_score, iqr_lower_bound, iqr_upper_bound, pct_change,
  (enough AND abs(z_score) > 3.0) AS is_zscore_anomaly,
  (enough AND (value < iqr_lower_bound OR value > iqr_upper_bound)) AS is_iqr_outlier,
  coalesce(enough AND abs(pct_change) > 0.5, FALSE) AS is_rate_anomaly,
  ((enough AND abs(z_score) > 3.0)
    OR (enough AND (value < iqr_lower_bound OR value > iqr_upper_bound))
    OR coalesce(enough AND abs(pct_change) > 0.5, FALSE)) AS is_anomaly,
  least(greatest(abs(z_score), 0.0), 5.0) * 20.0 AS severity_score
FROM calc
"""


# --------------------------------------------------------------------------
# q_quality_scorecard — OP-ML-QUALITY, OP-AGG-QUALITY, OP-FN-GRADE,
# OP-FN-DAYSSINCE (py_data_quality_scores.py:19-240): one groupBy per
# entity; completeness/timeliness/validity/consistency weighted
# 0.30/0.25/0.25/0.20, grade ladder, primary-issue pick, attention flag.
# "now" is pinned (2025-01-01) for determinism (SURVEY §7.3).
# --------------------------------------------------------------------------

_NOW = "TIMESTAMP '2025-01-01 00:00:00'"


def q_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w_ord = Window.partitionBy("event_type").orderBy("ts", "event_id")
    with_diff = ev.withColumn("prev_value", F.lag("value").over(w_ord))

    # all components are ratios of exact integer counts × 100.0 → raw
    # doubles, bit-identical across engines (see common.py discipline)
    n = F.count(F.lit(1))
    n_valid = F.sum(F.when(F.col("value").between(0.0, 1000.0), 1).otherwise(0))
    n_changed = F.sum(
        F.when(F.col("prev_value").isNotNull() & (F.col("value") != F.col("prev_value")), 1).otherwise(0)
    )
    n_with_prev = F.sum(F.when(F.col("prev_value").isNotNull(), 1).otherwise(0))
    agg = with_diff.groupBy("event_type").agg(
        n.alias("row_count"),
        (F.count(F.col("value")) * 100.0 / n).alias("completeness_score"),
        (n_valid * 100.0 / n).alias("validity_score"),
        F.max("ts").alias("latest_ts"),
        # try_divide: a group whose values are ALL null has no
        # prev-value pairs (n_with_prev = 0) — NULL consistency, not a
        # DIVIDE_BY_ZERO crash (ANSI mode); DuckDB's double/0 is NULL
        F.try_divide(n_changed * 100.0, n_with_prev).alias("consistency_score"),
    )

    days_late = F.datediff(F.expr(_NOW), F.col("latest_ts"))
    timeliness = F.greatest(F.lit(0.0), 100.0 - F.floor(days_late / 30).cast("double") * 10.0)

    scored = agg.withColumn("timeliness_score", timeliness).withColumn(
        "overall_score",
        F.col("completeness_score") * 0.30
        + F.col("timeliness_score") * 0.25
        + F.col("validity_score") * 0.25
        + F.col("consistency_score") * 0.20,
    )
    grade = (
        F.when(F.col("overall_score") >= 90, "A")
        .when(F.col("overall_score") >= 80, "B")
        .when(F.col("overall_score") >= 70, "C")
        .when(F.col("overall_score") >= 60, "D")
        .otherwise("F")
    )
    primary_issue = (
        F.when(
            (F.col("completeness_score") <= F.col("timeliness_score"))
            & (F.col("completeness_score") <= F.col("validity_score"))
            & (F.col("completeness_score") <= F.col("consistency_score")),
            "completeness",
        )
        .when(
            (F.col("timeliness_score") <= F.col("validity_score"))
            & (F.col("timeliness_score") <= F.col("consistency_score")),
            "timeliness",
        )
        .when(F.col("validity_score") <= F.col("consistency_score"), "validity")
        .otherwise("consistency")
    )
    return scored.select(
        "event_type",
        "row_count",
        "completeness_score",
        "timeliness_score",
        "validity_score",
        "consistency_score",
        "overall_score",
        grade.alias("quality_grade"),
        primary_issue.alias("primary_issue"),
        (F.col("overall_score") < 70.0).alias("needs_attention"),
    )


ORACLE_QUALITY_SCORECARD = f"""
WITH with_diff AS (
  SELECT
    event_type, ts, value,
    lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev_value
  FROM (SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events) e
),
agg AS (
  SELECT
    event_type,
    count(*) AS row_count,
    count(value) * 100.0 / count(*) AS completeness_score,
    CAST(sum(CASE WHEN value BETWEEN 0.0 AND 1000.0 THEN 1 ELSE 0 END) AS BIGINT)
      * 100.0 / count(*) AS validity_score,
    max(ts) AS latest_ts,
    CAST(sum(CASE WHEN prev_value IS NOT NULL AND value != prev_value THEN 1 ELSE 0 END) AS BIGINT)
      * 100.0
      / CAST(sum(CASE WHEN prev_value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS consistency_score
  FROM with_diff
  GROUP BY 1
),
scored AS (
  SELECT
    event_type, row_count, completeness_score, validity_score, consistency_score,
    greatest(0.0,
      100.0 - CAST(floor(date_diff('day', latest_ts, {_NOW}) / 30) AS DOUBLE) * 10.0)
      AS timeliness_score
  FROM agg
),
final AS (
  SELECT
    *,
    completeness_score * 0.30 + timeliness_score * 0.25
          + validity_score * 0.25 + consistency_score * 0.20 AS overall_score
  FROM scored
)
SELECT
  event_type,
  row_count,
  completeness_score,
  timeliness_score,
  validity_score,
  consistency_score,
  overall_score,
  CASE WHEN overall_score >= 90 THEN 'A'
       WHEN overall_score >= 80 THEN 'B'
       WHEN overall_score >= 70 THEN 'C'
       WHEN overall_score >= 60 THEN 'D'
       ELSE 'F' END AS quality_grade,
  CASE WHEN completeness_score <= timeliness_score
        AND completeness_score <= validity_score
        AND completeness_score <= consistency_score THEN 'completeness'
       WHEN timeliness_score <= validity_score
        AND timeliness_score <= consistency_score THEN 'timeliness'
       WHEN validity_score <= consistency_score THEN 'validity'
       ELSE 'consistency' END AS primary_issue,
  overall_score < 70.0 AS needs_attention
FROM final
"""


# --------------------------------------------------------------------------
# q_forecast_ols — OP-ML-FCAST (OLS path, py_unemployment_forecast.py:74-104):
# closed-form linear regression per entity via regr_slope/regr_intercept
# (pure JVM aggregate — the scalable path), horizon via explode(sequence).
# Slope/intercept are rounded before projection so both engines project
# from identical doubles.
# --------------------------------------------------------------------------


def _daily_user_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily series (t_index = days since epoch).

    Daily, not monthly: the synthetic events table spans ~30 days, so a
    monthly grain yields 1 observation per user and the min-obs guard
    would filter every group (a vacuous forecast). The reference's
    monthly grain (py_unemployment_forecast.py:35-39) is a property of
    its Eurostat data, not of the algorithm.
    """
    ev = load(spark, sf_dir, "events")
    # daily TOTAL, not daily mean: a 2-decimal-terminating measure, so
    # downstream sums of it can be rounded order-safely (common.py float
    # discipline) — a mean is a non-terminating ratio whose sums have no
    # safe rounding digit (bit us at sf0.1: regr_intercept accumulation
    # order differed at 1e-9 and r6 rounding amplified it to 1e-6).
    return (
        ev.groupBy(
            F.col("user_id"),
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("t_index"),
        )
        .agg(F.round(F.sum("value"), 2).alias("daily_value"))
    )


_ORACLE_DAILY_USER_SERIES = """
  SELECT
    user_id,
    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INTEGER) AS t_index,
    round(sum(value), 2) AS daily_value
  FROM (SELECT user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events) e
  GROUP BY 1, 2
"""


def q_forecast_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = _daily_user_series(spark, sf_dir)
    # Closed-form OLS from ROUNDED TERMINATING SUMS, slope/intercept
    # left raw: regr_slope/regr_intercept accumulate engine-internally
    # (order-dependent, unroundable safely), while Σy / Σxy of
    # 2-decimal daily totals terminate at 2 → r2 is order-safe, and
    # everything derived from the identical rounded sums is
    # bit-identical across engines (verified at sf0.1, not just the
    # driver's sf0.01).
    t = F.col("t_index").cast("double")
    fitted = series.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(t).alias("sx"),
        F.sum(t * t).alias("sxx"),  # integer-valued → exact in double
        F.round(F.sum("daily_value"), 2).alias("sy"),
        F.round(F.sum(t * F.col("daily_value")), 2).alias("sxy"),
        F.max("t_index").alias("last_t"),
    )
    n = F.col("n_obs").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    horizon = (
        fitted.filter(F.col("n_obs") >= 6)
        .withColumn("slope", slope)
        .withColumn("intercept", (F.col("sy") - F.col("slope") * F.col("sx")) / n)
        .select(
            "user_id",
            "n_obs",
            "slope",
            "intercept",
            F.explode(F.sequence(F.lit(1), F.lit(6))).alias("horizon_step"),
            F.col("last_t"),
        )
    )
    # forecast_month: last obs date offset by the horizon, snapped to
    # day 1 — add_months + trunc('MM'), the reference's
    # `last_date + DateOffset(months=i+1)` (py_unemployment_forecast.py:
    # 152-155, OP-FN-DATEOFFSET).
    last_date = F.date_add(F.to_date(F.lit("1970-01-01")), F.col("last_t"))
    return horizon.select(
        "user_id",
        "n_obs",
        "slope",
        "intercept",
        "horizon_step",
        (F.col("last_t") + F.col("horizon_step")).alias("t_index"),
        F.add_months(F.trunc(last_date, "MM"), F.col("horizon_step")).alias("forecast_month"),
        (F.col("intercept") + F.col("slope") * (F.col("last_t") + F.col("horizon_step"))).alias(
            "forecast_value"
        ),
    )


ORACLE_FORECAST_OLS = f"""
WITH series AS ({_ORACLE_DAILY_USER_SERIES}),
fitted AS (
  SELECT
    user_id,
    count(*) AS n_obs,
    sum(CAST(t_index AS DOUBLE)) AS sx,
    sum(CAST(t_index AS DOUBLE) * CAST(t_index AS DOUBLE)) AS sxx,
    round(sum(daily_value), 2) AS sy,
    round(sum(CAST(t_index AS DOUBLE) * daily_value), 2) AS sxy,
    max(t_index) AS last_t
  FROM series
  GROUP BY 1
),
solved AS (
  SELECT *,
    (n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx) AS slope
  FROM fitted
)
SELECT
  user_id,
  n_obs,
  slope,
  (sy - slope * sx) / n_obs AS intercept,
  h.horizon_step,
  last_t + h.horizon_step AS t_index,
  CAST(date_trunc('month', DATE '1970-01-01' + last_t)
       + to_months(CAST(h.horizon_step AS INT)) AS DATE) AS forecast_month,
  (sy - slope * sx) / n_obs + slope * (last_t + h.horizon_step) AS forecast_value
FROM solved, (SELECT unnest(range(1, 7)) AS horizon_step) h
WHERE n_obs >= 6
"""


# --------------------------------------------------------------------------
# q_forecast_ensemble — OP-ML-FCAST (full ensemble: exponential smoothing
# α=0.3, Holt α=0.3 β=0.1, OLS; mean + 95% prediction interval z·σ·√(1+1/n)
# — py_unemployment_forecast.py:41-122,161-172) + OP-FN-NANMEAN
# (:161-166, np.nanmean over the three methods).
#
# The ES/Holt recursions are sequential PER SERIES but each is a plain
# left fold over the ordered observations — exactly what
# ``F.aggregate`` expresses over a ``sort_array(collect_list(...))``
# array, entirely JVM-side. That beats the earlier applyInPandas shape
# on every axis: no Python workers / Arrow hop in the hot path, and the
# fold order is pinned by the expression itself, so DuckDB's
# ``list_reduce`` (same left fold) reproduces it bit-for-bit — this
# query is fully oracle-checked, not rows-only. At scale the one
# shuffle is the groupBy(user_id); per-series state is O(1).
# --------------------------------------------------------------------------

_MIN_OBS_ENSEMBLE = 6
_HORIZON = 6
_ES_ALPHA = 0.3
_HOLT_BETA = 0.1
_Z95 = 1.96


def q_forecast_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = _daily_user_series(spark, sf_dir)
    a, b_ = F.lit(_ES_ALPHA), F.lit(_HOLT_BETA)

    grouped = (
        series.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("t_index", "daily_value"))).alias("pts"))
        .select(
            "user_id",
            F.transform("pts", lambda p: p["daily_value"]).alias("ys"),
        )
        .withColumn("n", F.size("ys"))
        .filter(F.col("n") >= _MIN_OBS_ENSEMBLE)
    )

    y0 = F.element_at("ys", 1)
    y1 = F.element_at("ys", 2)
    rest = F.slice(F.col("ys"), 2, F.col("n") - 1)  # ys[1:]

    # ES: level = α·v + (1-α)·level, seeded with y0 — a left fold.
    es = F.aggregate(rest, y0, lambda acc, v: a * v + (F.lit(1.0) - a) * acc)

    # Holt: 2-state (level, trend) linear recurrence, seeded
    # (l=y0, b=y1-y0), folded over ys[1:] (py_unemployment_forecast.py:
    # 54-72 — note the reference folds y[1:] INCLUDING y1).
    def holt_step(acc, v):
        l_new = a * v + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (b_ * (l_new - acc["l"]) + (F.lit(1.0) - b_) * acc["b"]).alias("b"),
        )

    holt = F.aggregate(rest, F.struct(y0.alias("l"), (y1 - y0).alias("b")), holt_step)

    # Closed-form OLS on t = 0..n-1: Σt and Σt² are exact integer
    # closed forms; Σy and Σty are left folds (order pinned → the
    # oracle's list_reduce matches bit-for-bit).
    nd = F.col("n").cast("double")
    sx = (nd * (nd - 1)) / 2
    sxx = ((nd - 1) * nd * (2 * nd - 1)) / 6
    sy = F.aggregate("ys", F.lit(0.0), lambda acc, v: acc + v)
    txy = F.zip_with(
        F.transform(F.sequence(F.lit(0), F.col("n") - 1), lambda i: i.cast("double")),
        F.col("ys"),
        lambda i, y: i * y,
    )
    sxy = F.aggregate(txy, F.lit(0.0), lambda acc, v: acc + v)

    # 95% PI from the sample std of first differences (:106-122).
    diffs = F.zip_with(
        rest, F.slice(F.col("ys"), 1, F.col("n") - 1), lambda nxt, prv: nxt - prv
    )
    md = (F.col("n") - 1).cast("double")  # number of diffs; n≥6 → md≥5

    calc = grouped.select(
        "user_id",
        "n",
        es.alias("f_es"),
        holt["l"].alias("holt_l"),
        holt["b"].alias("holt_b"),
        sx.alias("sx"),
        sxx.alias("sxx"),
        sy.alias("sy"),
        sxy.alias("sxy"),
        (F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d) / md).alias("mu"),
        diffs.alias("diffs"),
    )
    var = (
        F.aggregate(
            "diffs",
            F.lit(0.0),
            lambda acc, d: acc + (d - F.col("mu")) * (d - F.col("mu")),
        )
        / (md - 1)
    )
    nd2 = nd  # same expression as the sx/sxx stage — one definition
    slope = (nd2 * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd2 * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    solved = calc.select(
        "user_id",
        "n",
        "f_es",
        "holt_l",
        "holt_b",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / nd2).alias("intercept"),
        (F.lit(_Z95) * F.sqrt(var) * F.sqrt(F.lit(1.0) + F.lit(1.0) / nd2)).alias("half_width"),
    )

    h = F.col("horizon_step")
    f_holt = F.col("holt_l") + h.cast("double") * F.col("holt_b")
    f_ols = F.col("intercept") + F.col("slope") * (F.col("n") - 1 + h).cast("double")
    horizon = solved.select(
        "user_id",
        "n",
        "f_es",
        "holt_l",
        "holt_b",
        "slope",
        "intercept",
        "half_width",
        F.explode(F.sequence(F.lit(1), F.lit(_HORIZON))).alias("horizon_step"),
    ).withColumn("f_holt", f_holt).withColumn("f_ols", f_ols)

    # np.nanmean over the three methods (OP-FN-NANMEAN): drop NaN fits
    # (a degenerate OLS emits NaN) before averaging. An ALL-NaN triple
    # (a NaN in the raw series poisons every fold) averages to NULL,
    # explicitly — an unguarded sum/size would be 0.0/0.0, whose
    # result is ENGINE-DEPENDENT (IEEE NaN in Spark, NULL in DuckDB).
    parts = F.filter(
        F.array(F.col("f_es"), F.col("f_holt"), F.col("f_ols")), lambda x: ~F.isnan(x)
    )
    ens = F.when(
        F.size(parts) > 0,
        F.aggregate(parts, F.lit(0.0), lambda acc, v: acc + v)
        / F.size(parts).cast("double"),
    )
    # forecasts are emitted RAW (doctrine #3): the folds are certified
    # bit-identical across engines (module comment below), so rounding
    # could only REINTRODUCE a .xxxx5 boundary flip on a terminating
    # fold value — the same reasoning as anomaly_zscore's raw z
    return horizon.withColumn("ens", ens).select(
        "user_id",
        "horizon_step",
        F.col("f_es").alias("forecast_es"),
        F.col("f_holt").alias("forecast_holt"),
        F.col("f_ols").alias("forecast_ols"),
        F.col("ens").alias("forecast_ensemble"),
        (F.col("ens") - F.col("half_width")).alias("pi_lower"),
        (F.col("ens") + F.col("half_width")).alias("pi_upper"),
        F.when(F.col("n") >= 24, "high")
        .when(F.col("n") >= 12, "medium")
        .otherwise("low")
        .alias("confidence"),
    )


# DuckDB twin: list(… ORDER BY t_index) pins the same ordering;
# list_reduce is the same left fold (its no-initial form seeds acc with
# the first element — exactly the ES/Holt seeding). Holt's 2-field
# state is encoded as a DOUBLE[2] whose first element is the seed
# state, since list_reduce has no initial-value form in DuckDB 1.0.
ORACLE_FORECAST_ENSEMBLE = f"""
WITH series AS ({_ORACLE_DAILY_USER_SERIES}),
g AS (
  SELECT user_id,
         list(CAST(daily_value AS DOUBLE) ORDER BY t_index) AS ys,
         count(*) AS n
  FROM series
  GROUP BY user_id
  HAVING count(*) >= {_MIN_OBS_ENSEMBLE}
),
calc AS (
  SELECT user_id, n, ys,
    list_reduce(ys, (acc, v) -> CAST({_ES_ALPHA} AS DOUBLE) * v
                                + CAST({1.0 - _ES_ALPHA!r} AS DOUBLE) * acc) AS f_es,
    list_reduce(
      list_concat([[ys[1], ys[2] - ys[1]]],
                  list_transform(ys[2:], v -> [v, CAST(0.0 AS DOUBLE)])),
      (acc, x) -> [
        CAST({_ES_ALPHA} AS DOUBLE) * x[1]
          + CAST({1.0 - _ES_ALPHA!r} AS DOUBLE) * (acc[1] + acc[2]),
        CAST({_HOLT_BETA} AS DOUBLE)
          * ((CAST({_ES_ALPHA} AS DOUBLE) * x[1]
              + CAST({1.0 - _ES_ALPHA!r} AS DOUBLE) * (acc[1] + acc[2])) - acc[1])
          + CAST({1.0 - _HOLT_BETA!r} AS DOUBLE) * acc[2]
      ]) AS holt,
    CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2 AS sx,
    (CAST(n AS DOUBLE) - 1) * CAST(n AS DOUBLE) * (2 * CAST(n AS DOUBLE) - 1) / 6 AS sxx,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys), (acc, v) -> acc + v) AS sy,
    list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(list_zip(range(0, CAST(n AS INT)), ys),
                                  p -> CAST(p[1] AS DOUBLE) * p[2])),
      (acc, v) -> acc + v) AS sxy,
    list_transform(range(1, CAST(n AS INT)), i -> ys[i + 1] - ys[i]) AS diffs
  FROM g
),
stats AS (
  SELECT *,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), diffs), (acc, d) -> acc + d)
      / (CAST(n AS DOUBLE) - 1) AS mu
  FROM calc
),
solved AS (
  SELECT user_id, n, f_es, holt[1] AS holt_l, holt[2] AS holt_b,
    (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope,
    (sy - (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
      / CAST(n AS DOUBLE) AS intercept,
    CAST({_Z95} AS DOUBLE)
      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list_transform(diffs, d -> (d - mu) * (d - mu))),
                         (acc, v) -> acc + v)
             / (CAST(n AS DOUBLE) - 2))
      * sqrt(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(n AS DOUBLE)) AS half_width
  FROM stats
),
horizon AS (
  SELECT s.*, h.horizon_step,
    s.holt_l + CAST(h.horizon_step AS DOUBLE) * s.holt_b AS f_holt,
    s.intercept + s.slope * CAST(s.n - 1 + h.horizon_step AS DOUBLE) AS f_ols
  FROM solved s, (SELECT unnest(range(1, {_HORIZON} + 1)) AS horizon_step) h
),
ensed AS (
  SELECT *,
    CASE WHEN len(list_filter([f_es, f_holt, f_ols], x -> NOT isnan(x))) > 0 THEN
      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                               list_filter([f_es, f_holt, f_ols], x -> NOT isnan(x))),
                  (acc, v) -> acc + v)
        / CAST(len(list_filter([f_es, f_holt, f_ols], x -> NOT isnan(x))) AS DOUBLE)
    END AS ens
  FROM horizon
)
SELECT
  user_id,
  CAST(horizon_step AS INT) AS horizon_step,
  f_es AS forecast_es,
  f_holt AS forecast_holt,
  f_ols AS forecast_ols,
  ens AS forecast_ensemble,
  ens - half_width AS pi_lower,
  ens + half_width AS pi_upper,
  CASE WHEN n >= 24 THEN 'high' WHEN n >= 12 THEN 'medium' ELSE 'low' END AS confidence
FROM ensed
"""


QUERIES = [
    QueryDef(
        "anomaly_zscore",
        q_anomaly_zscore,
        ORACLE_ANOMALY_ZSCORE,
        ("OP-ML-ANOM", "OP-AGG-ZSCORE", "OP-AGG-IQR", "OP-FN-PCTCHANGE", "OP-FN-CLIP", "OP-FN-BOOLOR", "OP-FIL-NEQ", "OP-FN-FILLNA"),
    ),
    QueryDef(
        "quality_scorecard",
        q_quality_scorecard,
        ORACLE_QUALITY_SCORECARD,
        ("OP-ML-QUALITY", "OP-AGG-QUALITY", "OP-FN-GRADE", "OP-FN-DAYSSINCE", "OP-FN-NOW"),
    ),
    QueryDef("forecast_ols", q_forecast_ols, ORACLE_FORECAST_OLS, ("OP-ML-FCAST", "OP-FN-DATEOFFSET")),
    QueryDef(
        "forecast_ensemble",
        q_forecast_ensemble,
        ORACLE_FORECAST_ENSEMBLE,
        ("OP-ML-FCAST", "OP-FN-NANMEAN"),
    ),
]
