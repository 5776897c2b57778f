"""Column-returning helpers — the Spark port of the reference's Jinja
macros (reference ``macros/calculations.sql``).

The reference templates SQL *text* at compile time; the idiomatic Spark
equivalent is plain Python functions returning ``Column`` expressions, so
every call stays inside one Catalyst plan (no runtime UDFs, full
whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def surrogate_key(*cols: Column | str) -> Column:
    """md5 surrogate key, byte-identical to the reference's
    ``generate_surrogate_key`` (reference ``macros/calculations.sql:1-13``):
    ``md5(concat_ws('||', coalesce(cast(f as varchar), '') ...))``.

    NOTE: only feed string / integral / date columns. Casting *doubles*
    to string is not guaranteed to render identically across engines
    (Java may use scientific notation) — normalize floats upstream.
    """
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"), F.lit(""))
        for c in cols
    ]
    return F.md5(F.concat_ws("||", *parts))


def safe_divide(numerator: Column, denominator: Column) -> Column:
    """NULL instead of error/inf on zero or null denominator
    (reference ``macros/calculations.sql:91-108``)."""
    return F.when(
        denominator.isNotNull() & (denominator != 0), numerator / denominator
    ).otherwise(F.lit(None))


def yoy_change(value: Column, order_by: Column, partition_by: list[Column | str], periods: int = 1) -> Column:
    """Year-over-year % change via lag, with null/zero guards
    (reference ``macros/calculations.sql:16-48``)."""
    w = Window.partitionBy(*partition_by).orderBy(order_by)
    prev = F.lag(value, periods).over(w)
    return F.when(
        prev.isNotNull() & (prev != 0), (value - prev) / prev * 100.0
    ).otherwise(F.lit(None))


def null_safe_pct_change(cur: Column, prev: Column) -> Column:
    """% change between two already-aligned columns with guards."""
    return F.when(prev.isNotNull() & (prev != 0), (cur - prev) / prev * 100.0).otherwise(
        F.lit(None)
    )


def rolling_average(value: Column, order_by: Column, partition_by: list[Column | str], periods: int = 12) -> Column:
    """Trailing ``periods``-row average incl. current row (expanding at
    the head of each partition) — reference ``macros/calculations.sql:51-69``.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(order_by)
        .rowsBetween(-(periods - 1), Window.currentRow)
    )
    return F.avg(value).over(w)


def rank_within_group(order_by: Column, partition_by: list[Column | str], ascending: bool = False) -> Column:
    """``rank()`` (gap semantics, matching DuckDB) within a partition —
    reference ``macros/calculations.sql:72-88``. ASC pins NULLS LAST:
    DuckDB's default_null_order ranks NULLs last on ASC while Spark's
    plain asc() sorts them first; DESC agrees between engines."""
    key = order_by.asc_nulls_last() if ascending else order_by.desc()
    w = Window.partitionBy(*partition_by).orderBy(key)
    return F.rank().over(w)


def month_start(year: Column, month: Column | None = None) -> Column:
    """``make_date(year, month, 1)`` — reference ``stg_eurostat__gdp.sql:34``."""
    m = month if month is not None else F.lit(1)
    return F.make_date(year, m, F.lit(1))

