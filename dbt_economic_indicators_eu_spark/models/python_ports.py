"""The reference's three dbt PYTHON models as registry table nodes.

The reference materializes ``py_anomaly_detection`` /
``py_unemployment_forecast`` / ``py_data_quality_scores`` as warehouse
tables via ``dbt run`` (``models/marts/py_*.py``, ``materialized=
'table'`` in each ``dbt.config``), documented in
``_python_models.yml``. Each is a single-process pandas loop over
``dbt.ref('fct_economic_indicators').df()`` — per-country slices,
driver-side concat. Here the same semantics are re-expressed
Spark-first, mirroring the operator-demo queries in ``queries/ml.py``
(which pin the identical compute shapes against the DuckDB oracle on
the synthetic ``events`` table):

- anomaly detection: one groupBy for per-country stats joined back
  onto a country-windowed fact scan — no per-group loop, no concat
  (queries/ml.py:q_anomaly_zscore is the oracle-checked twin shape);
- quality scores: country windows for consecutive-value diffs, then
  ONE groupBy per country (q_quality_scorecard's shape);
- forecasting: the ES/Holt recursions as native ``F.aggregate`` left
  folds over ``array_sort(collect_list(...))`` — sequential within a
  series, parallel across series, zero Python in the hot path
  (q_forecast_ensemble's shape; fold semantics pinned in
  tests/test_forecast_folds.py).

100 TB posture: all three shuffle once on country_code (the windows),
aggregate map-side, and join tiny per-country stats back via AQE
broadcast. ``collect_list`` in the forecast holds one country's
monthly history (hundreds of doubles), never the table. Parity with
the reference's pandas implementations is pinned by executing the
reference model functions themselves on identical inputs
(tests/test_python_ports.py).

Documented engine deviations from the reference's *incidental*
behavior (each marked at the call site):

- ``py_data_quality_scores`` iterates the fact table in WAREHOUSE ROW
  ORDER (it never sorts; ``py_data_quality_scores.py:148-149``), so
  its consecutive-value consistency metric depends on whatever order
  DuckDB returns rows — nondeterministic under parallel scans. This
  engine pins ``reference_date`` order (the order the reference's own
  anomaly model establishes at ``py_anomaly_detection.py:72-73``).
- ``datetime.now()`` (scored_at / forecast_generated_at / timeliness)
  is injectable via the run-level ``now`` var (CLI ``--now``), like
  the snapshot clock; default stays wall-clock.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plans.registry import Context, Registry

# thresholds — py_anomaly_detection.py:42-44
_Z_THRESHOLD = 3.0
_IQR_MULT = 1.5
_ROC_THRESHOLD = 0.5
_MIN_OBS_ANOM = 10  # :78 `len > 10`

# py_unemployment_forecast.py:38-39,41,54,118
_HORIZON = 6
_MIN_HISTORY = 24
_ES_ALPHA = 0.3
_HOLT_BETA = 0.1
_Z95 = 1.96

# py_data_quality_scores.py:38-42
_UNEMP_RANGE = (0.0, 30.0)
_INFL_RANGE = (-5.0, 20.0)
_TIMELINESS_DAYS = 90


def _nan_to_null(col: str) -> Column:
    """The reference models run in pandas, where NaN IS the missing
    marker: dropna/count/mean/std/ffill/pct_change all skip it exactly
    like NULL. Spark distinguishes the two — avg/stddev PROPAGATE NaN
    (one NaN observation poisons a country's stats, and Spark's
    NaN-is-largest ordering then flags every row anomalous), count()
    counts it, and NaN == NaN is true. Normalizing NaN→NULL at each
    port's input projection makes the NULL-faithful plans below
    NaN-faithful too. isnan(NULL) is false, so NULLs pass through."""
    c = F.col(col)
    return F.when(F.isnan(c), F.lit(None)).otherwise(c).alias(col)


def _now_ts(ctx: Context) -> Column:
    """The model clock: run-level ``now`` var (CLI ``--now``) if
    pinned, else wall-clock — the reference's ``datetime.now()``
    (py_data_quality_scores.py:69,216; py_unemployment_forecast.py:186)
    made reproducible."""
    now = ctx.var("now")
    if now is None:
        return F.current_timestamp()
    if isinstance(now, str):
        # CLI paths coerce the var in _parse_vars; a programmatic
        # context may still hand a string — parse it eagerly so a
        # malformed clock raises here instead of becoming a
        # silently-null scored_at via a failed Spark cast
        import datetime as _dt

        now = _dt.datetime.fromisoformat(now)
    return F.lit(now).cast("timestamp")


def register_python_models(reg: Registry) -> None:
    """Register the three Python-model ports (called by
    ``models.econ.build_registry`` after the marts — they are
    downstream of ``fct_economic_indicators`` /
    ``rpt_annual_economic_summary``)."""

    @reg.model(
        "py_anomaly_detection",
        materialization="table",
        # dbt.config tags (py_anomaly_detection.py:33-36) ∪ yml config
        # tags (_python_models.yml:16-17)
        tags=("python", "anomaly_detection", "data_quality"),
        # fact-grain output → year-partitioned layout like the fct it
        # mirrors (100 TB posture: downstream readers prune partitions;
        # the reference's DuckDB target has no layout concept)
        partition_by="reference_year",
        # _python_models.yml:19-26 (not_null on indicator_key + country_code)
        tests=(("not_null", "indicator_key"), ("not_null", "country_code")),
    )
    def py_anomaly_detection(ctx: Context) -> DataFrame:
        """py_anomaly_detection.py:18-162 — z-score / IQR / rate-of-change
        anomaly flags per country over BOTH monthly series.

        Semantics pinned to the pandas implementation:

        - stats (mean, sample std, linear-interpolated quartiles) skip
          nulls, computed over a country's FULL history (:46-61);
        - the whole method block is guarded on >10 non-null
          observations per series (:78,97) — below that z is null and
          the flags are False (:90-92,109-111);
        - std of 0 (constant series) yields z = 0 for EVERY row of the
          group, null-valued rows included (:50-51 ``Series(0, index)``);
        - rate-of-change is pandas ``pct_change()`` under its default
          pad fill (pandas 2.x): the series is forward-filled BEFORE
          the ratio, so a null month compares the carried value against
          itself (ratio 0) rather than producing a null gap; a 0 →
          nonzero step is ±inf, which |·|>0.5 flags as anomalous;
        - null comparisons are False, not null (numpy semantics), so
          every flag is coalesced;
        - severity = clip(|z_u|,0,5)·10 + clip(|z_i|,0,5)·10, clipped
          to 0-100, with null z counted as 0 (:137-140).
        """
        fct = ctx.ref("fct_economic_indicators").select(
            "indicator_key",
            "country_code",
            "reference_date",
            "reference_year",
            "reference_month",
            _nan_to_null("unemployment_rate_pct"),
            _nan_to_null("inflation_rate_mom_pct"),
        )

        # per-country stats for both series in ONE groupBy-agg
        # (map-side partial agg, tiny shuffle), joined back broadcast —
        # not exact-percentile windows, which buffer whole partitions
        # (same rationale as queries/ml.py:q_anomaly_zscore)
        def series_stats(col: str, tag: str) -> list[Column]:
            return [
                F.avg(col).alias(f"_mean_{tag}"),
                F.stddev_samp(col).alias(f"_std_{tag}"),
                F.count(col).alias(f"_n_{tag}"),
                F.expr(f"percentile({col}, 0.25)").alias(f"_q1_{tag}"),
                F.expr(f"percentile({col}, 0.75)").alias(f"_q3_{tag}"),
            ]

        stats = fct.groupBy("country_code").agg(
            *series_stats("unemployment_rate_pct", "u"),
            *series_stats("inflation_rate_mom_pct", "i"),
        )

        w = Window.partitionBy("country_code").orderBy("reference_date")
        w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        # pandas pct_change pad-fill: forward-fill, THEN lag the filled
        # series (two selects — a lag of a window expression cannot
        # nest; same country partitioning, no extra shuffle)
        filled = fct.select(
            "*",
            F.last("unemployment_rate_pct", ignorenulls=True).over(w_cum).alias("_ff_u"),
            F.last("inflation_rate_mom_pct", ignorenulls=True).over(w_cum).alias("_ff_i"),
        )
        lagged = filled.select(
            "*",
            F.lag("_ff_u").over(w).alias("_prev_u"),
            F.lag("_ff_i").over(w).alias("_prev_i"),
        )
        # country_code is non-null by construction (staging filters +
        # fct not_null test), so a plain equi-join drops nothing
        ev = lagged.join(
            F.broadcast(stats.withColumnRenamed("country_code", "_cc")),
            F.col("country_code") == F.col("_cc"),
        ).drop("_cc")

        def flags(tag: str, value_col: str) -> dict[str, Column]:
            v = F.col(value_col)
            mean, std = F.col(f"_mean_{tag}"), F.col(f"_std_{tag}")
            n = F.col(f"_n_{tag}")
            q1, q3 = F.col(f"_q1_{tag}"), F.col(f"_q3_{tag}")
            enough = n > _MIN_OBS_ANOM
            z = (
                F.when(~enough, F.lit(None).cast("double"))
                .when(std.isNull() | (std == 0), F.lit(0.0))
                .otherwise((v - mean) / std)
            )
            iqr = q3 - q1
            lo, hi = q1 - _IQR_MULT * iqr, q3 + _IQR_MULT * iqr
            is_iqr = enough & F.coalesce((v < lo) | (v > hi), F.lit(False))
            ff, prev = F.col(f"_ff_{tag}"), F.col(f"_prev_{tag}")
            # pct_change on the pad-filled series: prev==0 & ff!=0 is
            # ±inf in pandas (|inf|>0.5 → anomaly); 0/0 is NaN → False;
            # try_divide keeps ANSI mode from crashing on the 0 divisor
            roc_exceeds = F.when(prev == 0, ff != 0).otherwise(
                F.abs(F.try_divide(ff - prev, prev)) > _ROC_THRESHOLD
            )
            is_roc = enough & F.coalesce(roc_exceeds, F.lit(False))
            return {"z": z, "iqr": is_iqr, "roc": is_roc}

        u, i = flags("u", "unemployment_rate_pct"), flags("i", "inflation_rate_mom_pct")
        is_u = F.coalesce(F.abs(u["z"]) > _Z_THRESHOLD, F.lit(False)) | u["iqr"] | u["roc"]
        is_i = F.coalesce(F.abs(i["z"]) > _Z_THRESHOLD, F.lit(False)) | i["iqr"] | i["roc"]

        def sev(z: Column) -> Column:
            return F.least(F.greatest(F.coalesce(F.abs(z), F.lit(0.0)), F.lit(0.0)), F.lit(5.0)) * 10.0

        severity = F.least(F.greatest(sev(u["z"]) + sev(i["z"]), F.lit(0.0)), F.lit(100.0))

        # output columns :143-157, reference order
        return ev.select(
            "indicator_key",
            "country_code",
            "reference_date",
            "reference_year",
            "reference_month",
            "unemployment_rate_pct",
            "inflation_rate_mom_pct",
            u["z"].alias("unemployment_z_score"),
            i["z"].alias("inflation_z_score"),
            is_u.alias("is_unemployment_anomaly"),
            is_i.alias("is_inflation_anomaly"),
            (is_u | is_i).alias("is_any_anomaly"),
            severity.alias("anomaly_severity_score"),
        )

    @reg.model(
        "py_unemployment_forecast",
        materialization="table",
        # py_unemployment_forecast.py:29-32 / _python_models.yml:61-62
        tags=("python", "forecasting", "ml"),
        # _python_models.yml:64-71
        tests=(("not_null", "country_code"), ("not_null", "forecast_date")),
    )
    def py_unemployment_forecast(ctx: Context) -> DataFrame:
        """py_unemployment_forecast.py:20-205 — 6-month-ahead forecasts
        per country (≥24 non-null months of history), three methods +
        ensemble + 95% prediction interval.

        The pandas recursions map to JVM-side ``F.aggregate`` left
        folds over the date-sorted non-null series (the exact shape
        oracle-pinned in queries/ml.py:q_forecast_ensemble):

        - ES (:41-52): level ← α·v + (1−α)·level, seeded y₀, folded
          over y[1:]; emitted per horizon as es + (h−1)·holt_trend
          (:180 — the reference adjusts ES by HOLT's trend);
        - Holt (:54-72): 2-state fold seeded (y₀, y₁−y₀) over y[1:];
          forecast level + h·trend (:158);
        - OLS (:74-104) on x = 0..n−1: Σx/Σx² closed-form, Σy/Σxy
          folds; forecast intercept + slope·(n−1+h) (:101-104);
        - ensemble = nanmean of the three (:160-166); interval =
          ensemble ± 1.96·std(diff(y))·√(1+1/n) (:106-122), the same
          half-width at every horizon;
        - forecast_date = month-start h months past the last actual
          (:152-155); confidence from interval width (:195-203).
        """
        obs = (
            ctx.ref("fct_economic_indicators")
            .select(
                "country_code", "reference_date",
                _nan_to_null("unemployment_rate_pct"),
            )
            .filter(F.col("unemployment_rate_pct").isNotNull())
        )
        a, b_ = F.lit(_ES_ALPHA), F.lit(_HOLT_BETA)
        grouped = (
            obs.groupBy("country_code")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("reference_date", "unemployment_rate_pct"))
                ).alias("pts")
            )
            .select(
                "country_code",
                F.transform("pts", lambda p: p["unemployment_rate_pct"]).alias("ys"),
                F.element_at("pts", -1)["reference_date"].alias("last_actual_date"),
            )
            .withColumn("n", F.size("ys"))
            .filter(F.col("n") >= _MIN_HISTORY)
        )

        y0, y1 = F.element_at("ys", 1), F.element_at("ys", 2)
        rest = F.slice(F.col("ys"), 2, F.col("n") - 1)  # ys[1:]
        es = F.aggregate(rest, y0, lambda acc, v: a * v + (F.lit(1.0) - a) * acc)

        def holt_step(acc, v):
            l_new = a * v + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
            return F.struct(
                l_new.alias("l"),
                (b_ * (l_new - acc["l"]) + (F.lit(1.0) - b_) * acc["b"]).alias("b"),
            )

        holt = F.aggregate(rest, F.struct(y0.alias("l"), (y1 - y0).alias("b")), holt_step)

        nd = F.col("n").cast("double")
        sx = (nd * (nd - 1)) / 2
        sxx = ((nd - 1) * nd * (2 * nd - 1)) / 6
        sy = F.aggregate("ys", F.lit(0.0), lambda acc, v: acc + v)
        txy = F.zip_with(
            F.transform(F.sequence(F.lit(0), F.col("n") - 1), lambda idx: idx.cast("double")),
            F.col("ys"),
            lambda idx, y: idx * y,
        )
        sxy = F.aggregate(txy, F.lit(0.0), lambda acc, v: acc + v)

        diffs = F.zip_with(rest, F.slice(F.col("ys"), 1, F.col("n") - 1), lambda nxt, prv: nxt - prv)
        md = (F.col("n") - 1).cast("double")  # diff count; n≥24 → the <5 guard (:110-111) is unreachable

        calc = grouped.select(
            "country_code",
            "n",
            "last_actual_date",
            F.element_at("ys", -1).alias("last_actual_value"),
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
        # sample std of first differences (:113-115, pandas ddof=1 over
        # n−1 diffs → divide by n−2)
        var = (
            F.aggregate(
                "diffs", F.lit(0.0), lambda acc, d: acc + (d - F.col("mu")) * (d - F.col("mu"))
            )
            / (md - 1)
        )
        nd2 = F.col("n").cast("double")
        slope = (nd2 * F.col("sxy") - F.col("sx") * F.col("sy")) / (
            nd2 * F.col("sxx") - F.col("sx") * F.col("sx")
        )
        solved = calc.select(
            "country_code",
            "n",
            "last_actual_date",
            "last_actual_value",
            "f_es",
            "holt_l",
            "holt_b",
            slope.alias("slope"),
            ((F.col("sy") - slope * F.col("sx")) / nd2).alias("intercept"),
            (F.lit(_Z95) * F.sqrt(var) * F.sqrt(F.lit(1.0) + F.lit(1.0) / nd2)).alias("margin"),
        )

        h = F.col("forecast_horizon_months")
        hd = h.cast("double")
        f_es_h = F.col("f_es") + (hd - 1) * F.col("holt_b")  # :180 ES + i·trend, i = h−1
        f_holt = F.col("holt_l") + hd * F.col("holt_b")
        f_lr = F.col("intercept") + F.col("slope") * (F.col("n").cast("double") - 1 + hd)
        horizon = solved.select(
            "*",
            F.explode(F.sequence(F.lit(1), F.lit(_HORIZON))).alias("forecast_horizon_months"),
        ).withColumns({"f_es_h": f_es_h, "f_holt": f_holt, "f_lr": f_lr})

        # nanmean over the three methods (:160-166); with n≥24 and
        # distinct x the OLS denominator can't degenerate, but the
        # filter keeps the reference's np.nanmean contract exactly
        parts = F.filter(F.array("f_es_h", "f_holt", "f_lr"), lambda x: ~F.isnan(x))
        ens = F.aggregate(parts, F.lit(0.0), lambda acc, v: acc + v) / F.size(parts).cast("double")
        width = F.col("prediction_interval_upper") - F.col("prediction_interval_lower")

        return (
            horizon.withColumn("forecast_ensemble", ens)
            .withColumns(
                {
                    "prediction_interval_lower": F.col("forecast_ensemble") - F.col("margin"),
                    "prediction_interval_upper": F.col("forecast_ensemble") + F.col("margin"),
                }
            )
            .select(
                # :174-189 record keys + :195-203 appended columns
                "country_code",
                # last_date + DateOffset(months=h), day snapped to 1
                # (:152-155); reference_date is already month-start, the
                # trunc mirrors `.replace(day=1)`
                F.add_months(F.trunc("last_actual_date", "MM"), h).alias("forecast_date"),
                "forecast_horizon_months",
                "last_actual_date",
                "last_actual_value",
                F.col("f_es_h").alias("forecast_exp_smoothing"),
                F.col("f_holt").alias("forecast_holt"),
                F.col("f_lr").alias("forecast_linear_reg"),
                "forecast_ensemble",
                "prediction_interval_lower",
                "prediction_interval_upper",
                _now_ts(ctx).alias("forecast_generated_at"),
                F.lit("1.0.0").alias("model_version"),
                F.col("n").alias("min_training_samples"),
                width.alias("prediction_interval_width"),
                F.when(width < 1.0, "high")
                .when(width < 2.0, "medium")
                .otherwise("low")
                .alias("forecast_confidence"),
            )
        )

    @reg.model(
        "py_data_quality_scores",
        materialization="table",
        # py_data_quality_scores.py:28-31 / _python_models.yml:107-108
        tags=("python", "data_quality", "monitoring"),
        # _python_models.yml:110-114 (unique + not_null country_code)
        tests=(("unique", "country_code"), ("not_null", "country_code")),
    )
    def py_data_quality_scores(ctx: Context) -> DataFrame:
        """py_data_quality_scores.py:19-240 — per-country quality
        scorecard: completeness / timeliness / validity / consistency
        weighted 0.30/0.25/0.25/0.20, grade ladder, primary issue,
        attention flag. One country-window pass for consecutive-value
        diffs, then ONE groupBy (q_quality_scorecard's oracle-pinned
        shape).

        Pinned pandas semantics:

        - validity over the non-null values only, and only when any
          exist (:91-107) — an all-null series contributes NOTHING to
          the overall mean (not a zero), while its per-series output
          column falls back to 0 via ``.get`` (:204-206);
        - consistency guard >10 non-null values (:124,133); repetition
          = diff==0 count over the DROPNA'D series — i.e. each value
          vs the previous NON-NULL value; absent scores default the
          overall to 100 (:138-141);
        - timeliness: 100 within 90 days, then −10 per fractional
          30-day month, floored at 0 (:72-77); days_since uses
          timedelta.days (floor);
        - overall completeness/validity/consistency are plain means of
          the present per-series scores (:54,111,139).
        """
        fct = ctx.ref("fct_economic_indicators")
        # the reference loads rpt_annual_economic_summary and never
        # uses it (:35 `annual_df`, no further reference) — ref'd here
        # for lineage parity; the lazy frame costs nothing unbuilt
        ctx.ref("rpt_annual_economic_summary")

        # reference iterates warehouse row order (:148-149, no sort) —
        # nondeterministic; this engine pins reference_date order (see
        # module docstring)
        w = Window.partitionBy("country_code").orderBy("reference_date")
        w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
        fct = fct.select(
            "country_code",
            "reference_date",
            _nan_to_null("unemployment_rate_pct"),
            _nan_to_null("inflation_rate_mom_pct"),
        )
        with_prev = fct.select(
            "country_code",
            "reference_date",
            "unemployment_rate_pct",
            "inflation_rate_mom_pct",
            F.last("unemployment_rate_pct", ignorenulls=True).over(w_prev).alias("_prev_u"),
            F.last("inflation_rate_mom_pct", ignorenulls=True).over(w_prev).alias("_prev_i"),
        )

        def same_count(col: str, prev: str) -> Column:
            return F.sum(
                F.when(F.col(col).isNotNull() & (F.col(col) == F.col(prev)), 1).otherwise(0)
            )

        total = F.count(F.lit(1))
        n_u, n_i = F.count("unemployment_rate_pct"), F.count("inflation_rate_mom_pct")
        valid_u = F.sum(
            F.when(F.col("unemployment_rate_pct").between(*_UNEMP_RANGE), 1).otherwise(0)
        )
        valid_i = F.sum(
            F.when(F.col("inflation_rate_mom_pct").between(*_INFL_RANGE), 1).otherwise(0)
        )
        agg = with_prev.groupBy("country_code").agg(
            total.alias("total_records"),
            (n_u * 100.0 / total).alias("unemployment_completeness"),
            (n_i * 100.0 / total).alias("inflation_completeness"),
            F.max("reference_date").alias("_latest"),
            # try_divide: an all-null series has no validity score
            # (null → excluded from the overall mean), and ANSI mode
            # must not crash on the 0 divisor
            F.try_divide(valid_u * 100.0, n_u).alias("_valid_u"),
            F.try_divide(valid_i * 100.0, n_i).alias("_valid_i"),
            n_u.alias("_n_u"),
            n_i.alias("_n_i"),
            same_count("unemployment_rate_pct", "_prev_u").alias("_same_u"),
            same_count("inflation_rate_mom_pct", "_prev_i").alias("_same_i"),
        )

        completeness = (F.col("unemployment_completeness") + F.col("inflation_completeness")) / 2.0

        days = F.floor(
            (F.unix_timestamp(_now_ts(ctx)) - F.unix_timestamp(F.col("_latest").cast("timestamp")))
            / 86400
        )
        timeliness = F.when(days <= _TIMELINESS_DAYS, F.lit(100.0)).otherwise(
            F.greatest(
                F.lit(0.0),
                100.0 - (days - _TIMELINESS_DAYS).cast("double") / 30.0 * 10.0,
            )
        )

        def present_mean(cols: list[Column], default: float) -> Column:
            arr = F.filter(F.array(*cols), lambda x: ~x.isNull())
            return F.when(F.size(arr) == 0, F.lit(default)).otherwise(
                F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v) / F.size(arr).cast("double")
            )

        validity = present_mean([F.col("_valid_u"), F.col("_valid_i")], 100.0)

        def cons_score(same: str, n: str) -> Column:
            # max(0, 100 − pct_repeated·2), guard >10 obs (:124-129)
            return F.when(
                F.col(n) > _MIN_OBS_ANOM,
                F.greatest(F.lit(0.0), 100.0 - F.col(same) * 200.0 / F.col(n)),
            )

        consistency = present_mean(
            [cons_score("_same_u", "_n_u"), cons_score("_same_i", "_n_i")], 100.0
        )

        scored = agg.withColumns(
            {
                "completeness_score": completeness,
                "timeliness_score": timeliness,
                "days_since_latest_data": days,
                "validity_score": validity,
                "consistency_score": consistency,
            }
        ).withColumn(
            "overall_quality_score",
            F.col("completeness_score") * 0.30
            + F.col("timeliness_score") * 0.25
            + F.col("validity_score") * 0.25
            + F.col("consistency_score") * 0.20,
        )

        grade = (
            F.when(F.col("overall_quality_score") >= 90, "A")
            .when(F.col("overall_quality_score") >= 80, "B")
            .when(F.col("overall_quality_score") >= 70, "C")
            .when(F.col("overall_quality_score") >= 60, "D")
            .otherwise("F")
        )
        # first dimension under 80, in fixed order (:227-236)
        primary_issue = (
            F.when(F.col("completeness_score") < 80, "completeness")
            .when(F.col("timeliness_score") < 80, "timeliness")
            .when(F.col("validity_score") < 80, "validity")
            .when(F.col("consistency_score") < 80, "consistency")
            .otherwise("none")
        )

        # record keys :189-218 + appended :227-238, reference order
        return scored.select(
            "country_code",
            "total_records",
            "completeness_score",
            "unemployment_completeness",
            "inflation_completeness",
            "timeliness_score",
            "days_since_latest_data",
            # the reference stores pd.to_datetime(...).max() — a
            # Timestamp (:65,83); emitted as timestamp accordingly
            F.col("_latest").cast("timestamp").alias("latest_data_date"),
            "validity_score",
            # per-series outputs fall back to 0 when absent (:204-206)
            F.coalesce(F.col("_valid_u"), F.lit(0.0)).alias("unemployment_validity"),
            F.coalesce(F.col("_valid_i"), F.lit(0.0)).alias("inflation_validity"),
            "consistency_score",
            "overall_quality_score",
            grade.alias("quality_grade"),
            _now_ts(ctx).alias("scored_at"),
            F.lit("1.0.0").alias("scoring_model_version"),
            primary_issue.alias("primary_issue"),
            (F.col("overall_quality_score") < 70).alias("requires_attention"),
        )
