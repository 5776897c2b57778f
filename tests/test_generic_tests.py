"""Generic data tests + freshness (testing/generic.py ↔ reference
macros/data_quality.sql + schema yml tests)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dbt_economic_indicators_eu_spark.testing.generic import (
    check_freshness,
    test_completeness_threshold,
    test_no_future_dates,
    test_not_null,
    test_relationships,
    test_unique,
    test_value_in_range,
)

# pytest collects the imported test_* functions as tests too (they take a
# DataFrame, not fixtures) — shield them:
test_unique.__test__ = False  # type: ignore[attr-defined]
test_not_null.__test__ = False  # type: ignore[attr-defined]
test_relationships.__test__ = False  # type: ignore[attr-defined]
test_value_in_range.__test__ = False  # type: ignore[attr-defined]
test_no_future_dates.__test__ = False  # type: ignore[attr-defined]
test_completeness_threshold.__test__ = False  # type: ignore[attr-defined]


def test_unique_flags_dupes(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    out = test_unique(df, "k").collect()
    assert len(out) == 1 and out[0]["k"] == 1 and out[0]["n_rows"] == 2


def test_not_null_flags_any_null(spark):
    df = spark.createDataFrame([(1, "a"), (None, "b"), (3, None)], "k int, s string")
    assert test_not_null(df, "k", "s").count() == 2


def test_relationships_anti_join(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,)], "fk int")
    out = test_relationships(child, parent, "fk").collect()
    assert [r["fk"] for r in out] == [9]


def test_value_in_range_bounds(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (101.0,), (-1.0,)], "v double")
    assert test_value_in_range(df, "v", 0, 100).count() == 2


def test_no_future_dates_injectable_today(spark):
    df = spark.createDataFrame([("2024-01-01",), ("2024-03-01",)], "d string").select(
        F.to_date("d").alias("d")
    )
    assert test_no_future_dates(df, "d", today=F.lit("2024-02-01").cast("date")).count() == 1


def test_completeness_threshold_violation_row(spark):
    df = spark.createDataFrame([(1,), (None,), (None,), (None,)], "v int")
    out = test_completeness_threshold(df, "v", 0.95).collect()
    assert len(out) == 1 and out[0]["completeness"] == 0.25
    ok = spark.createDataFrame([(1,), (2,)], "v int")
    assert test_completeness_threshold(ok, "v", 0.95).count() == 0


def test_freshness_statuses(spark):
    now = F.lit("2024-02-01").cast("timestamp")

    def status(loaded_at: str) -> str:
        df = spark.createDataFrame([(loaded_at,)], "t string").select(
            F.to_timestamp("t").alias("t")
        )
        return check_freshness(df, "t", now, 7, 30).collect()[0]["freshness_status"]

    assert status("2024-01-31") == "pass"
    assert status("2024-01-20") == "warn"   # 12 days > 7
    assert status("2023-12-01") == "error"  # 62 days > 30


def test_store_failures_writes_only_failing_sibling_declaration(spark, tmp_path):
    """ADVICE r8 #2: two relationships tests on ONE column to different
    parents share a (model, column, kind) report key; when only one
    fails, store_test_failures must write ONLY the failing
    declaration's audit relation — an empty relation for the passing
    sibling would read as a current-zero-violations test result."""
    import os

    from dbt_economic_indicators_eu_spark.plans.registry import Registry
    from dbt_economic_indicators_eu_spark.testing.schedule import (
        schema_test_report,
        store_test_failures,
    )

    reg = Registry()

    @reg.model("parent_full")
    def parent_full(ctx):
        return spark.createDataFrame([(1,), (2,), (3,)], "id int")

    @reg.model("parent_partial")
    def parent_partial(ctx):
        return spark.createDataFrame([(1,), (2,)], "id int")  # 3 missing

    @reg.model(
        "child",
        tests=(
            ("relationships", "id", "parent_full", "id"),     # passes
            ("relationships", "id", "parent_partial", "id"),  # fails (3)
        ),
    )
    def child(ctx):
        return spark.createDataFrame([(1,), (2,), (3,)], "id int")

    ctx = reg.context(spark)
    rows = schema_test_report(reg, ctx, select=["child"]).collect()
    failed = [r for r in rows if r["violations"] != 0]
    assert len(failed) == 1  # one report row per declaration

    audit = str(tmp_path / "audit")
    written = store_test_failures(reg, ctx, failed, audit)
    # only the SECOND declaration (ordinal suffix __2) is stored
    assert written == [os.path.join(audit, "child__id__relationships__2")]
    assert not os.path.isdir(os.path.join(audit, "child__id__relationships"))
    viol = spark.read.parquet(written[0])
    assert viol.count() == 1 and viol.collect()[0]["id"] == 3


def test_relationships_parent_source_namespace(spark):
    """A relationships parent named like BOTH a model and a source
    resolves to the model on the bare name (models win _frame's
    lookup); the explicit `source:` namespace must force the source
    side — dbt's `to: source(...)` — so a child key present in the
    model but missing from the raw source is caught."""
    from dbt_economic_indicators_eu_spark.plans.registry import Registry
    from dbt_economic_indicators_eu_spark.testing.schedule import schema_test_report

    reg = Registry()
    # source 'dual' has keys {1}; model 'dual' has keys {1, 2}
    reg.source("dual", lambda s: s.createDataFrame([(1,)], "id int"))

    @reg.model("dual")
    def dual(ctx):
        return spark.createDataFrame([(1,), (2,)], "id int")

    @reg.model(
        "child",
        tests=(
            ("relationships", "id", "dual", "id"),         # model side: passes
            ("relationships", "id", "source:dual", "id"),  # source side: fails
        ),
    )
    def child(ctx):
        return spark.createDataFrame([(1,), (2,)], "id int")

    rows = schema_test_report(reg, reg.context(spark), select=["child"]).collect()
    by_violations = sorted(r["violations"] for r in rows)
    assert by_violations == [0, 1]  # bare name → model (pass); source: → fail


def test_store_failures_decl_id_fast_path(spark, tmp_path):
    """With decl ids in the report (the CLI path), the failing sibling
    is identified exactly — no probe jobs — and gets the same stable
    ordinal-suffixed relation name as the probe path."""
    import os

    from dbt_economic_indicators_eu_spark.plans.registry import Registry
    from dbt_economic_indicators_eu_spark.testing.schedule import (
        schema_test_report,
        store_test_failures,
    )

    reg = Registry()

    @reg.model("parent_full2")
    def parent_full2(ctx):
        return spark.createDataFrame([(1,), (2,), (3,)], "id int")

    @reg.model("parent_partial2")
    def parent_partial2(ctx):
        return spark.createDataFrame([(1,), (2,)], "id int")

    @reg.model(
        "child2",
        tests=(
            ("relationships", "id", "parent_full2", "id"),     # passes
            ("relationships", "id", "parent_partial2", "id"),  # fails
        ),
    )
    def child2(ctx):
        return spark.createDataFrame([(1,), (2,), (3,)], "id int")

    ctx = reg.context(spark)
    rows = schema_test_report(
        reg, ctx, select=["child2"], with_decl_ids=True
    ).collect()
    failed = [r for r in rows if r["violations"] != 0]
    assert [r["decl_id"] for r in failed] == ["model:1"]
    audit = str(tmp_path / "audit")
    written = store_test_failures(reg, ctx, failed, audit)
    assert written == [os.path.join(audit, "child2__id__relationships__2")]
    viol = spark.read.parquet(written[0])
    assert viol.count() == 1 and viol.collect()[0]["id"] == 3


def test_scoped_report_covers_model_and_source_sharing_a_name(spark):
    """Models and sources are separate registry namespaces, so one name
    can exist in both. A scoped ``--select name`` run must execute BOTH
    sides' declarations, exactly like the unscoped run — a source-only
    branch would silently skip the model's tests (and the scoped
    store-failures pruner would then delete their stored relations
    without re-executing them)."""
    import pytest

    from dbt_economic_indicators_eu_spark.plans.registry import Registry, RegistryError
    from dbt_economic_indicators_eu_spark.testing.schedule import schema_test_report

    reg = Registry()
    reg.source(
        "dual",
        loader=lambda s: s.createDataFrame([(1,), (None,)], "id int"),
        tests=(("not_null", "id"),),  # fails: 1 null
    )

    @reg.model("dual", tests=(("unique", "id"),))  # fails: one duped value
    def dual(ctx):
        return spark.createDataFrame([(7,), (7,)], "id int")

    ctx = reg.context(spark)
    rows = schema_test_report(
        reg, ctx, select=["dual"], with_decl_ids=True
    ).collect()
    got = {(r["decl_id"], r["test"], r["violations"]) for r in rows}
    assert got == {("source:0", "not_null", 1), ("model:0", "unique", 1)}

    # unscoped run sees the same two declarations
    all_rows = schema_test_report(reg, ctx, with_decl_ids=True).collect()
    assert {(r["decl_id"], r["test"]) for r in all_rows if r["model"] == "dual"} == {
        ("source:0", "not_null"),
        ("model:0", "unique"),
    }

    # unknown names still raise
    with pytest.raises(RegistryError):
        schema_test_report(reg, ctx, select=["nope"])
