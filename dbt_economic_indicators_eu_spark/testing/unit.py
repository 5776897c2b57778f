"""Unit-test runner with mock-ref injection — OP-TEST-UNIT.

Reference: dbt 1.8 ``unit_tests:`` blocks
(models/intermediate/_intermediate__unit_tests.yml:8-134): each test
supplies literal ``given`` rows per upstream ref, runs the model, and
compares against ``expect`` rows.

Spark port: ``Context.ref`` resolves mocks before registered models, so
the model-under-test runs unmodified over ``spark.createDataFrame(given)``
inputs. Comparison is order-insensitive via two-sided ``exceptAll``
(duplicates significant — same as dbt's row-bag compare).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..localdata import local_df
from ..plans.registry import Registry


class UnitTestFailure(AssertionError):
    pass


def mock_df(
    spark: SparkSession,
    rows: Sequence[Mapping[str, Any]],
    schema: StructType | str,
) -> DataFrame:
    """Build a mock input from literal given-rows. An explicit schema is
    required (dbt infers from the real model; we cannot — a mock with a
    None in every row of a column would otherwise be untyped)."""
    return local_df(spark, list(rows), schema)


def run_unit_test(
    registry: Registry,
    spark: SparkSession,
    model: str,
    given: Mapping[str, DataFrame],
    expect: DataFrame,
    *,
    compare_cols: Sequence[str] | None = None,
    float_tol: float = 1e-6,
) -> None:
    """Build ``model`` with refs replaced by ``given``; assert the output
    row-bag equals ``expect`` (on ``compare_cols`` if given).

    Floats are rounded on both sides before compare (exceptAll is exact;
    the reference's expected values are 6-decimal literals, e.g.
    _intermediate__unit_tests.yml:32-33).
    """
    from pyspark.sql import functions as F

    ctx = registry.context(spark, mocks=dict(given))
    actual = ctx.ref(model)
    if compare_cols:
        actual = actual.select(*compare_cols)
        expect = expect.select(*compare_cols)
    else:
        # exceptAll binds columns by POSITION; dbt's unit-test compare
        # aligns by NAME. Reorder the expect frame to the model's
        # column order (and fail loudly on a column-set mismatch)
        # before comparing — otherwise an expect frame authored in a
        # different column order is compared against the wrong columns.
        if sorted(actual.columns) != sorted(expect.columns):
            raise UnitTestFailure(
                f"unit test for {model!r}: expect columns "
                f"{sorted(expect.columns)} != model columns "
                f"{sorted(actual.columns)}"
            )
        expect = expect.select(*actual.columns)

    # float_tol is implemented as ROUNDING to its decimal digit, not a
    # true |a-b| tolerance: set-difference compare (exceptAll) needs a
    # canonical per-row value, and literal unit-test fixtures are
    # authored at a precision where boundary-straddling (two values
    # within tol rounding apart) does not arise. float_tol=0 or
    # negative = exact float compare (no rounding).
    digits = (
        max(0, round(-1 * __import__("math").log10(float_tol)))
        if float_tol > 0
        else None
    )

    def norm(df: DataFrame) -> DataFrame:
        if digits is None:
            return df
        cols = []
        for f in df.schema.fields:
            kind = f.dataType.simpleString()
            if kind in ("double", "float"):
                cols.append(F.round(F.col(f.name), digits).alias(f.name))
            elif kind in ("array<double>", "array<float>"):
                # tolerance applies INSIDE float arrays too — leaving
                # them exact would flake on platform FP-ordering noise
                # with no hint the tolerance was never applied. (Floats
                # nested in structs/maps are still compared exactly —
                # no fixture model emits those; flatten before
                # comparing if one ever does.)
                cols.append(
                    F.transform(F.col(f.name), lambda x: F.round(x, digits)).alias(
                        f.name
                    )
                )
            else:
                cols.append(F.col(f.name))
        return df.select(*cols)

    a, e = norm(actual), norm(expect)
    missing = e.exceptAll(a).collect()
    extra = a.exceptAll(e).collect()
    if missing or extra:
        raise UnitTestFailure(
            f"unit test for {model!r} failed:\n"
            f"  expected-but-absent: {missing}\n"
            f"  actual-but-unexpected: {extra}"
        )
