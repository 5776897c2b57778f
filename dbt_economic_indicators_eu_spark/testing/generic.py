"""Generic data tests — the dbt test surface as violation-row queries
(OP-TEST-UNIQUE / NOTNULL / REL / RANGE / NOFUTURE / COMPLETE / FRESH).

dbt semantics: each test compiles to a SELECT whose returned rows are
failures; 0 rows = pass (SURVEY §2.10). Every function here returns a
lazy violations DataFrame so the runner can count, report, or persist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def test_unique(df: DataFrame, *cols: str) -> DataFrame:
    """Duplicated key values (reference _staging__models.yml:11-13).
    dbt's compiled unique test excludes NULL keys (``where column is
    not null``) — two NULLs are NOT a uniqueness violation; declare a
    separate not_null test to reject them."""
    for c in cols:
        df = df.filter(F.col(c).isNotNull())
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def test_not_null(df: DataFrame, *cols: str) -> DataFrame:
    """Rows with any null in ``cols`` (reference _staging__models.yml:16-17)."""
    pred = None
    for c in cols:
        p = F.col(c).isNull()
        pred = p if pred is None else (pred | p)
    return df.filter(pred)


def test_relationships(child: DataFrame, parent: DataFrame, key: str) -> DataFrame:
    """Orphaned foreign keys (reference _marts__models.yml:90-93) — the
    one anti-join in the system. dbt's compiled relationships test
    excludes NULL child keys (``where from_field is not null``): a
    nullable FK is not an orphan."""
    return child.filter(F.col(key).isNotNull()).join(
        parent.select(key).distinct(), on=key, how="left_anti"
    )


def test_value_in_range(df: DataFrame, col: str, lo: float, hi: float) -> DataFrame:
    """Out-of-range values (reference macros/data_quality.sql:1-15)."""
    return df.filter((F.col(col) < lo) | (F.col(col) > hi))


def test_no_future_dates(df: DataFrame, col: str, today: Column | None = None) -> DataFrame:
    """Dates beyond today (reference macros/data_quality.sql:18-27);
    ``today`` injectable for determinism."""
    t = today if today is not None else F.current_date()
    return df.filter(F.col(col) > t)


def test_completeness_threshold(df: DataFrame, col: str, threshold: float = 0.95) -> DataFrame:
    """One violation row when non-null ratio < threshold (reference
    macros/data_quality.sql:30-46).

    An EMPTY table passes, faithfully to the reference: its
    ``non_null_rows::float / total_rows`` is 0.0/0 = NaN and
    ``NaN < threshold`` is false; here 0/0 is NULL and ``NULL <
    threshold`` drops the row — same observable outcome. Dead-feed
    detection is source freshness' job (check_freshness errors on
    empty), not this test's."""
    return (
        df.agg(
            (F.count(F.col(col)) / F.count(F.lit(1))).alias("completeness"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .withColumn("threshold", F.lit(threshold))
        .filter(F.col("completeness") < F.col("threshold"))
    )


def check_freshness(
    df: DataFrame,
    loaded_at_col: str,
    now: Column,
    warn_after_days: int = 7,
    error_after_days: int = 30,
) -> DataFrame:
    """Source freshness (reference _sources.yml:27-30): one row with
    max(loaded_at), staleness days, and status pass/warn/error."""
    agg = df.agg(F.max(loaded_at_col).alias("max_loaded_at"))
    days = F.datediff(F.to_date(now), F.to_date(F.col("max_loaded_at")))
    # an EMPTY source (max NULL -> days NULL) is the dead-feed case
    # freshness monitoring exists to catch: report 'error', never let
    # NULL fall through both whens into 'pass' (dbt also errors here)
    status = (
        F.when(F.col("max_loaded_at").isNull(), "error")
        .when(days > error_after_days, "error")
        .when(days > warn_after_days, "warn")
        .otherwise("pass")
    )
    return agg.select(
        F.col("max_loaded_at"),
        days.alias("days_stale"),
        status.alias("freshness_status"),
    )
