"""Semantic metrics layer — the reference README's MetricFlow surface.

Reference: ``README.md:226-258`` documents a semantic layer over the
marts — eight bulleted metrics plus ``gdp_per_capita_derived`` from the
yml snippet, nine total (``_semantic_models.yml`` is described but not
committed in the reference tree, so the README's metric list and its
``mf query --metrics ... --group-by ...`` example are the spec). This
module is the Spark-first equivalent: each metric is a declarative
definition compiled into ONE groupBy (+ windows for the time-series
metrics) over the intermediate marts — no per-metric scans, JVM-side
Column algebra only.

Grain model: annual metrics read ``int_country_annual_metrics``,
monthly metrics read ``int_country_monthly_indicators``. Group-by
accepts the entity (``country_code``) and the grain's time dimension
(``reference_year`` / ``reference_date``). A MIXED-grain query (the
reference README's own example, ``mf query --metrics
unemployment_rate,gdp_growth --group-by country_code,
metric_time__year`` — README.md:292-296) is supported the way
MetricFlow resolves it: the monthly metrics ROLL UP to the shared
annual ``metric_time`` grain (their measures re-aggregate per year
from the monthly mart) and the per-grain results full-outer-join on
the query dimensions (ADVICE r6 #3). Only window-derived monthly
metrics cannot roll up (a 12-month rolling average has no annual
meaning), and a mixed query cannot group by ``reference_date`` — both
are loud errors.

At 100 TB the shape holds: one shuffle on the (entity, time) group key
per grain, map-side partial aggregation, at most one window exchange
keyed on the entity for the YoY/rolling/cumulative metrics, and for a
mixed query one join of two already-aggregated (entity × time)-sized
frames — AQE broadcasts the smaller side.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Metric:
    name: str
    description: str
    grain: str  # 'annual' | 'monthly'
    # simple metrics: an aggregate Column over the grain's mart
    measure: Callable[[], Column] | None = None
    # derived metrics: post-aggregation expression over the measure
    # columns (no window)
    derive: Callable[[dict[str, Column]], Column] | None = None
    # time-series metrics: expression over the measure columns AND the
    # entity window (partitioned by the entity, ordered by the time
    # dimension) — declared HERE so adding a tenth metric never
    # requires touching query_metrics
    window_derive: Callable[[dict[str, Column], Window], Column] | None = None
    # measures this metric needs aggregated first (name -> aggregate)
    requires: tuple[tuple[str, Callable[[], Column]], ...] = ()

    def __post_init__(self):
        n_set = sum(
            x is not None for x in (self.measure, self.derive, self.window_derive)
        )
        if n_set != 1:
            raise ValueError(
                f"metric {self.name!r}: exactly one of measure / derive / "
                f"window_derive must be set (got {n_set})"
            )


def _sum(col: str) -> Callable[[], Column]:
    return lambda: F.sum(col)


def _avg(col: str) -> Callable[[], Column]:
    return lambda: F.avg(col)


_TIME = {"annual": "reference_year", "monthly": "reference_date"}
_MART = {"annual": "int_country_annual_metrics", "monthly": "int_country_monthly_indicators"}


# The README's metric list (README.md:249-258), one definition each.
METRICS: dict[str, Metric] = {
    m.name: m
    for m in [
        Metric(
            "total_gdp", "Sum of GDP", "annual",
            measure=_sum("gdp_million_eur"),
        ),
        Metric(
            "average_gdp_per_capita", "Average GDP per capita", "annual",
            measure=_avg("gdp_per_capita_eur"),
        ),
        Metric(
            "gdp_per_capita_derived",
            "GDP per capita (calculated): (total_gdp * 1,000,000) / population",
            "annual",
            requires=(
                ("total_gdp", _sum("gdp_million_eur")),
                ("population", _sum("population_count")),
            ),
            # try_divide: a zero/absent population yields NULL under
            # ANSI instead of crashing (same convention as the marts)
            derive=lambda m: F.try_divide(m["total_gdp"] * F.lit(1_000_000.0), m["population"]),
        ),
        Metric(
            "gdp_growth", "YoY GDP growth rate (%)", "annual",
            requires=(("total_gdp", _sum("gdp_million_eur")),),
            window_derive=lambda m, w: (
                F.try_divide(m["total_gdp"] - F.lag("total_gdp").over(w),
                             F.lag("total_gdp").over(w)) * 100
            ),
        ),
        Metric(
            "cumulative_gdp_growth",
            "Cumulative growth vs first observed year (%)", "annual",
            requires=(("total_gdp", _sum("gdp_million_eur")),),
            window_derive=lambda m, w: (
                F.try_divide(
                    m["total_gdp"]
                    - F.first("total_gdp").over(
                        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                    ),
                    F.first("total_gdp").over(
                        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                    ),
                ) * 100
            ),
        ),
        Metric(
            "unemployment_rate",
            "Average unemployment rate (seasonally adjusted)", "monthly",
            measure=_avg("unemployment_rate_pct"),
        ),
        Metric(
            "unemployment_trend", "12-month rolling average unemployment", "monthly",
            requires=(("unemployment_rate", _avg("unemployment_rate_pct")),),
            window_derive=lambda m, w: F.avg("unemployment_rate").over(
                w.rowsBetween(-11, 0)
            ),
        ),
        Metric(
            "monthly_inflation", "MoM inflation rate", "monthly",
            measure=_avg("inflation_rate_mom_pct"),
        ),
        Metric(
            "annual_inflation", "Annual inflation (sum of MoM rates)", "annual",
            measure=_avg("annual_inflation_rate_pct"),
        ),
    ]
}


def _grain_frame(
    ctx,
    defs: list[Metric],
    group_by: list[str],
    where: Column | None,
    grain: str,
    time_col: str,
    mixed: bool = False,
) -> DataFrame:
    """One grain's metric frame: a single aggregation pass over the
    grain's mart (every simple measure + every required intermediate,
    deduped by name), then the derive/window expressions. ``time_col``
    is the time dimension the query groups on — the grain's own for a
    single-grain query, ``reference_year`` when a mixed query rolls
    monthly measures up to the annual grain (the monthly mart carries
    ``reference_year``, so the rollup is a plain re-aggregation)."""
    df = ctx.ref(_MART[grain])
    if where is not None:
        from pyspark.errors import AnalysisException

        try:
            df = df.filter(where)
        except AnalysisException as e:
            # a loud, actionable error instead of a raw plan failure —
            # bites mixed-grain queries whose where uses a column only
            # one mart carries (e.g. reference_date), and plain typos
            hint = (
                "a mixed-grain query's where must use columns shared by "
                "both marts"
                if mixed
                else "check the column names against the mart's schema"
            )
            raise ValueError(
                f"where filter does not resolve against the {grain} mart "
                f"({_MART[grain]}); {hint}. Underlying error: {e}"
            ) from e
    aggs: dict[str, Column] = {}
    for d in defs:
        if d.measure is not None:
            aggs[d.name] = d.measure().alias(d.name)
        for req_name, req_agg in d.requires:
            aggs.setdefault(req_name, req_agg().alias(req_name))
    grouped = df.groupBy(*group_by).agg(*aggs.values())

    parts = [c for c in group_by if c != time_col]
    w = Window.partitionBy(*parts).orderBy(time_col)
    measures = {k: F.col(k) for k in aggs}
    cols: dict[str, Column] = {}
    for d in defs:
        if d.window_derive is not None:
            cols[d.name] = d.window_derive(measures, w)
        elif d.derive is not None:
            cols[d.name] = d.derive(measures)
        else:
            cols[d.name] = F.col(d.name)
    return grouped.select(*group_by, *[cols[d.name].alias(d.name) for d in defs])


def query_metrics(
    ctx,
    metrics: list[str],
    group_by: list[str],
    where: Column | None = None,
) -> DataFrame:
    """MetricFlow-style query (README.md:292-296 ``mf query``): compile
    the requested metrics into one aggregation per grain over the
    grain's mart. ``group_by`` lists dimensions (``country_code``
    and/or a time column); ``where`` is a pre-aggregation filter (for a
    mixed-grain query it applies to both marts, so it must use shared
    columns).

    Window-derived metrics (YoY growth, rolling trend, cumulative
    growth) require the time dimension in ``group_by`` — without a time
    axis they are undefined, and the error says so instead of emitting
    nonsense. Mixed-grain queries roll monthly metrics up to the annual
    grain (see module docstring); window-derived MONTHLY metrics cannot
    roll up and are rejected.
    """
    if not metrics:
        raise ValueError(f"no metrics requested; available: {sorted(METRICS)}")
    unknown = [m for m in metrics if m not in METRICS]
    if unknown:
        raise ValueError(f"unknown metrics: {unknown}; available: {sorted(METRICS)}")
    defs = [METRICS[m] for m in metrics]
    grains = {d.grain for d in defs}
    mixed = len(grains) > 1
    time_dims_in_query = [c for c in group_by if c in ("reference_year", "reference_date")]
    if len(time_dims_in_query) > 1:
        raise ValueError(
            "group_by carries two time dimensions "
            f"{time_dims_in_query}; a metric query runs at one metric_time grain"
        )
    requested_time = time_dims_in_query[0] if time_dims_in_query else None
    # the time dimension the query runs at: the shared ANNUAL
    # metric_time for a mixed query (monthly rolls up), the annual
    # grain's own for annual metrics, and for monthly-only metrics
    # whichever the caller asked for — MetricFlow always allows
    # querying a metric at a COARSER time grain, so
    # group_by=[..., reference_year] rolls a lone monthly metric up to
    # annual exactly like the mixed path does
    if mixed or "annual" in grains:
        time_col = "reference_year"
    else:
        time_col = requested_time or "reference_date"
    rolling_up = "monthly" in grains and time_col == "reference_year"
    if rolling_up:
        bad_windows = [
            d.name for d in defs if d.grain == "monthly" and d.window_derive is not None
        ]
        if bad_windows:
            raise ValueError(
                f"monthly window metrics {sorted(bad_windows)} cannot roll up "
                "to the annual metric_time grain (a rolling/monthly-ordered "
                "window has no annual meaning)"
            )
    # group_by accepts DECLARED dimensions only — the entity and the
    # query's time column, like MetricFlow's dimension registry. An
    # arbitrary mart column (a second time-derived column, a key) would
    # land in the window's partitionBy and silently reset the
    # YoY/rolling/cumulative frames mid-series — wrong numbers, no
    # error — so it is rejected here instead.
    allowed_dims = {"country_code", time_col}
    bad = [c for c in group_by if c not in allowed_dims]
    if bad:
        scope = "mixed-grain (annual metric_time)" if mixed else next(iter(grains))
        raise ValueError(
            f"unknown group_by dimensions: {bad}; the {scope} query declares "
            f"{sorted(allowed_dims)}"
        )
    windowed = [d.name for d in defs if d.window_derive is not None]
    if windowed and time_col not in group_by:
        raise ValueError(
            f"metrics {sorted(windowed)} need the time "
            f"dimension {time_col!r} in group_by"
        )

    if not mixed:
        frame = _grain_frame(ctx, defs, group_by, where, grains.pop(), time_col)
        return frame.select(*group_by, *metrics)

    # mixed grain: per-grain frames at the shared annual key, then one
    # full outer join on the query dimensions (MetricFlow joins metric
    # frames on the shared dimensions; outer, so a year present in only
    # one mart still surfaces with nulls for the other grain's metrics)
    annual = _grain_frame(
        ctx, [d for d in defs if d.grain == "annual"], group_by, where,
        "annual", time_col, mixed=True,
    )
    monthly = _grain_frame(
        ctx, [d for d in defs if d.grain == "monthly"], group_by, where,
        "monthly", time_col, mixed=True,
    )
    joined = (
        annual.join(monthly, group_by, "full") if group_by else annual.crossJoin(monthly)
    )
    return joined.select(*group_by, *metrics)
