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

so the entire test run is one action. dbt runs one query per test,
paying a scheduler round-trip each; the unioned plan runs the whole
suite as ONE job whose branches execute concurrently, and each branch
scans only ITS test's column (per-branch column pruning — a
uniqueness check on a key never reads the table's wide columns).
Branches do NOT share scan output (Catalyst has no common-scan reuse
across union branches — verified in the executed plan), which is the
right trade at 100 TB: pruned single-column scans beat materializing
one shared wide scan. Per-test violation ROWS (for triage) remain
available through ``testing.generic`` directly.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.registry import Context, Registry, RegistryError
from . import generic

REPORT_SCHEMA = "model string, test string, column string, violations bigint"


def _violations_frame(
    ctx: Context,
    model: str,
    decl: tuple,
    df: DataFrame | None = None,
    resolve: "Callable[[str], DataFrame | None] | None" = None,
) -> tuple[str, str, DataFrame]:
    kind = decl[0]

    def _frame(name: str) -> DataFrame:
        # dbt test checks the MATERIALIZED relation when one exists:
        # a merge defect accumulated in the warehouse must fail the
        # unique test even though a fresh single-batch recompute would
        # pass. ``resolve`` maps a model to its stored artifact (None
        # -> view/ephemeral: recompute via ref, like dbt does).
        if resolve is not None:
            stored = resolve(name)
            if stored is not None:
                return stored
        # a relationships parent may be a SOURCE, not a model (dbt
        # supports `to: source(...)`): an explicit `source:` namespace
        # forces the source side even when a model shares the name
        # (models win the bare-name lookup below, so a shared name
        # would otherwise silently validate against the wrong relation)
        if name.startswith("source:"):
            return ctx.source(name[len("source:"):])
        if ctx.registry.has_source(name) and not ctx.registry.has_model(name):
            return ctx.source(name)
        return ctx.ref(name)

    if df is None:
        df = _frame(model)
    if kind == "unique":
        return kind, decl[1], generic.test_unique(df, decl[1])
    if kind == "not_null":
        return kind, decl[1], generic.test_not_null(df, decl[1])
    if kind == "relationships":
        _, col, parent_model, parent_col = decl
        parent = _frame(parent_model).select(F.col(parent_col).alias(col))
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
    resolve: "Callable[[str], DataFrame | None] | None" = None,
    with_decl_ids: bool = False,
) -> DataFrame:
    """Lazy report over every declared test of ``select`` models
    (default: all models AND all bound sources that declare tests —
    dbt test covers source tests too). One row per test; the whole
    suite is one unioned plan — collect/write it once to run every
    test in a single job.

    ``with_decl_ids=True`` appends a ``decl_id`` column
    (``model:<i>`` / ``source:<i>`` — the declaration's side and index
    in its tests tuple), so a consumer can attribute a failing row to
    its EXACT declaration even when siblings share (model, column,
    kind). Off by default: the public 4-column report schema is
    oracle-pinned (queries/engine.py:q_schema_test_suite)."""
    counts: list[DataFrame] = []

    def add(label: str, decl: tuple, df: DataFrame | None = None,
            decl_id: str | None = None) -> None:
        kind, col, viol = _violations_frame(ctx, label, decl, df, resolve)
        aggs = [
            F.lit(label).alias("model"),
            F.lit(kind).alias("test"),
            F.lit(col).alias("column"),
            F.count(F.lit(1)).alias("violations"),
        ]
        if with_decl_ids:
            aggs.append(F.lit(decl_id).alias("decl_id"))
        counts.append(viol.agg(*aggs))

    if select is not None:
        for name in select:
            # models and sources are separate namespaces that may share
            # a name — run BOTH sides when both declare tests, exactly
            # like the unscoped run below (a source-only branch would
            # silently skip the model's declarations, and the scoped
            # store-failures pruner would then delete their stored
            # relations without re-executing them)
            if registry.has_source(name):
                src = registry.get_source(name)
                if src.loader is not None:  # declared-only: same skip as full run
                    for i, decl in enumerate(src.tests):
                        add(name, decl, ctx.source(name), f"source:{i}")
            if registry.has_model(name):
                for i, decl in enumerate(registry.get(name).tests):
                    add(name, decl, decl_id=f"model:{i}")
            elif not registry.has_source(name):
                registry.get(name)  # unknown everywhere: raise like before
    else:
        for name, model in registry.models.items():
            for i, decl in enumerate(model.tests):
                add(name, decl, decl_id=f"model:{i}")
        for name, src in registry.sources.items():
            if src.loader is None:
                continue  # declared-only source: nothing to scan
            for i, decl in enumerate(src.tests):
                add(name, decl, ctx.source(name), f"source:{i}")
    spark = ctx.spark
    if not counts:
        schema = REPORT_SCHEMA + (", decl_id string" if with_decl_ids else "")
        return spark.createDataFrame([], schema)
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def source_freshness_report(registry: Registry, ctx: Context, now) -> DataFrame:
    """``dbt source freshness`` equivalent: one row per bound source
    with max(loaded_at), staleness days, and pass/warn/error per its
    declared policy (_sources.yml warn_after/error_after) — again one
    unioned plan, one job."""
    rows: list[DataFrame] = []
    now_col = now if isinstance(now, Column) else F.lit(now).cast("timestamp")
    for name, src in registry.sources.items():
        if src.loader is None or src.loaded_at_field is None:
            continue
        rep = generic.check_freshness(
            ctx.source(name),
            src.loaded_at_field,
            now_col,
            warn_after_days=src.warn_after_days,
            error_after_days=src.error_after_days,
        )
        rows.append(rep.select(F.lit(name).alias("source"), "*"))
    spark = ctx.spark
    if not rows:
        return spark.createDataFrame(
            [], "source string, max_loaded_at timestamp, days_stale int, freshness_status string"
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def run_schema_tests(
    registry: Registry,
    ctx: Context,
    select: list[str] | None = None,
    resolve: "Callable[[str], DataFrame | None] | None" = None,
    with_decl_ids: bool = False,
) -> tuple[bool, list]:
    """Execute the suite; returns (all_passed, report rows)."""
    rows = schema_test_report(
        registry, ctx, select, resolve, with_decl_ids=with_decl_ids
    ).collect()
    return all(r["violations"] == 0 for r in rows), rows


def audit_relation_name(model: str, column: str, kind: str, ordinal: int = 0) -> str:
    """Audit relation naming for ``--store-failures`` generic tests —
    the single definition shared by the writer (store_test_failures)
    and the scoped-run pruner (__main__.cmd_test), so the two can
    never drift apart. Sibling declarations beyond the first get a
    stable ``__N`` ordinal suffix."""
    suffix = "" if ordinal == 0 else f"__{ordinal + 1}"
    return f"{model}__{column}__{kind}{suffix}"


def audit_relation_globs(model: str, column: str, kind: str) -> list[str]:
    """Glob patterns matching EVERY ordinal of a test's audit relations
    (base name + ``__N`` siblings) — kept beside audit_relation_name so
    a suffix-format change can never leave the pruner matching
    nothing. The literal prefix is glob-escaped: registry names are
    unvalidated strings, and a ``[``/``*`` in one must not make the
    pruner silently match nothing (or something else)."""
    import glob

    base = glob.escape(audit_relation_name(model, column, kind))
    return [base, base + "__[0-9]*"]


def store_test_failures(
    registry: Registry,
    ctx: Context,
    failed_rows: list,
    audit_base: str,
    resolve: "Callable[[str], DataFrame | None] | None" = None,
) -> list[str]:
    """dbt ``--store-failures``: persist each FAILING generic test's
    violation rows as an audit relation under
    ``<audit_base>/<model>__<column>__<test>`` (dbt's
    ``dbt_test__audit`` schema). Only failing tests are rebuilt and
    written — the passing suite stays one count-only job. Returns the
    written paths.

    Rows from a ``with_decl_ids=True`` report carry the failing
    declaration's exact identity, so exactly that declaration is
    rebuilt and written — zero extra jobs. Rows without ``decl_id``
    (e.g. programmatic callers collecting the 4-column report) fall
    back to probing each sibling declaration sharing
    (model, column, kind) with a cheap ``limit(1)`` job, storing only
    the ones that actually fail — an empty relation for a passing
    sibling would read as "0 current violations" for a test that did
    not fail at all. Either way the ``__N`` ordinal suffix is the
    declaration's position among its canonical siblings (source-side
    declarations first, then model-side), stable across runs even when
    a different sibling fails next time."""
    import os

    def sibling_decls(name: str, kind: str, col: str) -> list[tuple]:
        """(side, index, decl, frame) for every declaration matching
        (name, kind, col), in canonical source-then-model order — the
        ordinal-suffix ordering shared by both store paths. A name may
        be BOTH a source and a model (Context caches are namespaced
        for exactly this); each side resolves against its own frame."""
        out: list[tuple] = []
        if registry.has_source(name):
            out += [
                ("source", i, d, ctx.source(name))
                for i, d in enumerate(registry.get_source(name).tests)
                if d[0] == kind and d[1] == col
            ]
        if registry.has_model(name):
            out += [
                ("model", i, d, None)
                for i, d in enumerate(registry.get(name).tests)
                if d[0] == kind and d[1] == col
            ]
        if not out:
            raise RegistryError(
                f"no declared {kind!r} test on {name}.{col} to store failures for"
            )
        return out

    written: list[str] = []
    # one store per DECLARED failing test: the report emits one row per
    # declaration, so duplicate (name, kind, col) keys mean multiple
    # declarations (e.g. two relationships tests on one column to
    # different parents) — each gets its own audit relation, suffixed
    seen: set = set()
    for r in failed_rows:
        name, kind, col = r["model"], r["test"], r["column"]
        fields = getattr(r, "__fields__", r)
        decl_id = r["decl_id"] if "decl_id" in fields else None
        if (name, kind, col, decl_id) in seen:
            continue
        seen.add((name, kind, col, decl_id))
        siblings = sibling_decls(name, kind, col)
        if decl_id is not None:
            side, idx = decl_id.split(":")
            hits = [
                (ordinal, s)
                for ordinal, s in enumerate(siblings)
                if (s[0], s[1]) == (side, int(idx))
            ]
            if not hits:
                raise RegistryError(
                    f"decl_id {decl_id!r} does not match a declared "
                    f"{kind!r} test on {name}.{col}"
                )
            todo = hits
            probe = False
        else:
            todo = list(enumerate(siblings))
            probe = len(siblings) > 1
        for ordinal, (_, _, decl, src_df) in todo:
            _, _, viol = _violations_frame(ctx, name, decl, src_df, resolve)
            if probe and viol.limit(1).count() == 0:
                continue
            path = os.path.join(
                audit_base, audit_relation_name(name, col, kind, ordinal)
            )
            viol.write.mode("overwrite").parquet(path)
            written.append(path)
    return written
