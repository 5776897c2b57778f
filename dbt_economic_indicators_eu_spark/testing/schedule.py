"""Declarative schema-test runner — the ``dbt test`` equivalent.

The reference declares column tests per model in yml
(``models/staging/_staging__models.yml``,
``models/intermediate/_intermediate__models.yml``,
``models/marts/_marts__models.yml``) and ``dbt test`` compiles each to
a violations SELECT. Here the declarations live on
``ModelDef.tests`` (plans/registry.py) and this runner compiles the
WHOLE suite into ONE Spark plan: each test reduces to a single-row
count aggregate over its violations frame (testing/generic.py), and
the rows union into a report DataFrame

    (model string, test string, column string, violations bigint)

so the entire test run is one action. dbt runs one query per test; a
unioned plan lets Catalyst share scans between tests on the same model
(ReusedExchange / same FileScan) and schedules everything in one job —
the shape that matters when the suite runs against 100 TB marts.
Per-test violation ROWS (for triage) remain available through
``testing.generic`` directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.registry import Context, Registry, RegistryError
from . import generic

REPORT_SCHEMA = "model string, test string, column string, violations bigint"


def _violations_frame(ctx: Context, model: str, decl: tuple) -> tuple[str, str, DataFrame]:
    kind = decl[0]
    df = ctx.ref(model)
    if kind == "unique":
        return kind, decl[1], generic.test_unique(df, decl[1])
    if kind == "not_null":
        return kind, decl[1], generic.test_not_null(df, decl[1])
    if kind == "relationships":
        _, col, parent_model, parent_col = decl
        parent = ctx.ref(parent_model).select(F.col(parent_col).alias(col))
        return kind, col, generic.test_relationships(df, parent, col)
    if kind == "accepted_values":
        # dbt semantics: NULLs are not violations (the NOT IN predicate
        # is null for them, and dbt's compiled test keeps only TRUE
        # rows) — declare a separate not_null test to reject nulls
        _, col, values = decl
        return kind, col, df.filter(~F.col(col).isin(*values))
    raise RegistryError(f"unknown schema test {kind!r} on model {model!r}")


def schema_test_report(
    registry: Registry,
    ctx: Context,
    select: list[str] | None = None,
) -> DataFrame:
    """Lazy report over every declared test of ``select`` models
    (default: all models that declare tests). One row per test; the
    whole suite is one unioned plan — collect/write it once to run
    every test in a single job."""
    names = select if select is not None else list(registry.models)
    counts: list[DataFrame] = []
    for name in names:
        for decl in registry.get(name).tests:
            kind, col, viol = _violations_frame(ctx, name, decl)
            counts.append(
                viol.agg(
                    F.lit(name).alias("model"),
                    F.lit(kind).alias("test"),
                    F.lit(col).alias("column"),
                    F.count(F.lit(1)).alias("violations"),
                )
            )
    spark = ctx.spark
    if not counts:
        return spark.createDataFrame([], REPORT_SCHEMA)
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def run_schema_tests(
    registry: Registry,
    ctx: Context,
    select: list[str] | None = None,
) -> tuple[bool, list]:
    """Execute the suite; returns (all_passed, report rows)."""
    rows = schema_test_report(registry, ctx, select).collect()
    return all(r["violations"] == 0 for r in rows), rows
