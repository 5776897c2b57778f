"""DAG runner: materialize registered models into a warehouse directory
(the engine-side equivalent of ``dbt run`` — SURVEY §3.1).

- ``view``        → nothing written; the lazy DataFrame *is* the view
                    (Catalyst inlines it into downstream plans), plus a
                    temp view for SQL access (OP-SINK-VIEW).
- ``table``       → overwrite parquet (OP-SINK-TABLE).
- ``incremental`` → merge_upsert on unique_key + watermark (OP-SINK-INCR).
- ``snapshot``    → scd2_merge with check_cols (OP-SINK-SCD2).

Contract enforcement happens inside Context.ref() before any write
(OP-TEST-CONTRACT; reference ``_marts__models.yml:9-11``).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import Context, Registry
from .incremental import (
    has_parquet_files,
    recover_interrupted_swap,
    run_incremental,
    swap_into_place,
)
from .snapshot import run_snapshot, scd2_merge

logger = logging.getLogger(__name__)


def schema_name(target: str, custom_schema: str) -> str:
    """Target-aware namespace policy (reference
    ``macros/data_quality.sql:66-73`` generate_schema_name): prod gets
    the bare schema, every other target gets a ``<target>_`` prefix so
    dev/CI runs land beside — never on top of — prod tables."""
    custom_schema = custom_schema.strip()
    return custom_schema if target == "prod" else f"{target}_{custom_schema}"


def warehouse_base(warehouse: str, target: str, schema: str | None) -> str:
    """The on-disk root written models land under — THE single source
    of the namespace policy (run_models and the CLI test verb must
    resolve artifacts identically, or tests silently recompute via ref
    instead of checking the stored relations)."""
    if schema is None:
        return warehouse
    return os.path.join(warehouse, schema_name(target, schema))


def observe_row_count(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Row-count monitoring (reference ``macros/data_quality.sql:49-63``
    log_row_count) the Spark-first way: ``df.observe`` piggybacks an
    accumulator on the NEXT action instead of running a second
    count(*) scan — zero extra jobs, exact even mid-pipeline. Read
    ``observation.get["row_count"]`` after the write/collect; pair with
    ``log_observed`` to mirror the macro's info-log line."""
    obs = Observation(f"row_count_{name}")
    return df.observe(obs, F.count(F.lit(1)).alias("row_count")), obs


def log_observed(name: str, obs: Observation) -> int:
    n = int(obs.get["row_count"])
    logger.info("Row count for %s: %d", name, n)
    return n


def _overwrite_table(df: DataFrame, model, name: str, path: str) -> None:
    """Overwrite-write a model's frame as its stored relation, honoring
    the declared partition layout (a fact-grain table partitioned by
    year gives downstream readers partition pruning instead of full
    scans). Used by table materializations and by ``--full-refresh``
    incremental rebuilds."""
    observed, obs = observe_row_count(df, name)
    writer = observed.write.mode("overwrite")
    if model.partition_by:
        writer = writer.partitionBy(model.partition_by)
    # crash-safe swap shared with run_incremental and run_snapshot: a
    # plain overwrite deletes the target BEFORE writing, so a crash
    # mid-write would destroy the stored relation (fatal for a
    # --full-refresh rebuild of an incremental's accumulated history)
    swap_into_place(writer, path)
    log_observed(name, obs)


def _materialize_one(
    ctx: Context,
    spark: SparkSession,
    name: str,
    base: str,
    watermark_col,
    now,
    build_lock,
    full_refresh: bool = False,
) -> DataFrame:
    """Build + write one model. Plan construction and cache updates run
    under ``build_lock`` (Context memoization is not thread-safe); the
    WRITE — the expensive Spark action — runs outside it, so
    independent models' jobs overlap."""
    model = ctx.registry.get(name)
    with build_lock:
        df = ctx.ref(name)  # builds upstream chain lazily, checks contracts
    path = os.path.join(base, name)
    if model.materialization == "view":
        with build_lock:
            df.createOrReplaceTempView(name)
        return df
    if model.materialization == "table":
        _overwrite_table(df, model, name, path)
    elif model.materialization == "incremental":
        assert model.unique_key, f"incremental model {name} needs unique_key"
        if full_refresh:
            # dbt `run --full-refresh`: drop-and-rebuild the incremental
            # from the model's current plan — watermark and keyed upsert
            # skipped, accumulated state replaced (snapshots are NOT
            # rebuilt, matching dbt: history is immutable)
            _overwrite_table(df, model, name, path)
        else:
            # per-model watermark (the reference's is_incremental()
            # predicate); the run-level param is a global override
            run_incremental(
                spark, path, df, model.unique_key,
                watermark_col if watermark_col is not None else model.watermark_col,
                partition_by=model.partition_by,
            )
    elif model.materialization == "snapshot":
        assert model.unique_key and model.check_cols
        run_snapshot(spark, path, df, model.unique_key, list(model.check_cols), now)
    # a rowless materialization (e.g. project vars scoping the run to an
    # empty slice) writes no parquet footers — read back with the
    # STORED-RELATION schema so downstream refs see an empty,
    # correctly-typed relation instead of UNABLE_TO_INFER_SCHEMA.
    if has_parquet_files(path):
        fresh = read_stored(spark, path)
    else:
        fresh = spark.read.schema(stored_schema_for(model, df)).parquet(path)
    with build_lock:
        ctx.set_relation(name, fresh)
    return fresh


def stored_schema_for(model, build_df: DataFrame):
    """THE schema of a model's STORED relation derived from its build
    plan — shared by the rowless read-back here, the CLI test verb, and
    catalog generation (one definition, or the SCD2-schema rule
    drifts). For a snapshot that schema is NOT the build plan's:
    scd2_merge appends valid_from/valid_to/is_current, which downstream
    refs and schema tests select — derive it from the merge itself on
    an empty slice (lazy plan construction, no job)."""
    if model.materialization == "snapshot":
        return scd2_merge(
            None, build_df.limit(0), model.unique_key,
            list(model.check_cols), "1970-01-01 00:00:00",
        ).schema
    return build_df.schema


def read_stored(spark: SparkSession, path: str) -> DataFrame:
    """THE reader for stored relations (shared by the run read-back,
    the stored resolver, the CLI test verb, and docs catalog): always
    footer-merging. A partition-scoped incremental after an
    append_new_columns batch legitimately holds mixed parquet footers
    (only touched partitions rewrote) — a single-footer sample would
    hide the evolved column from whoever reads the relation next, and
    each consumer re-implementing the read is how one of them drifts
    to a plain read and crashes on exactly that table."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def make_stored_resolver(registry, spark, base, *, exclude: set[str] | None = None):
    """THE warehouse stored-relation resolver (dbt ref semantics),
    shared by run_models' real context, the probe edge harvest, and
    the CLI test verb — one definition so the three consumers can
    never drift. Views return None (a stored view is a stored QUERY;
    recomputing the plan is its read semantics), as do names in
    ``exclude`` (models materializing in-run arrive via set_relation)
    and never-materialized paths (fall back to a fresh build)."""

    def stored_resolver(name: str):
        if exclude is not None and name in exclude:
            return None
        model = registry.get(name)
        if model.materialization == "view":
            return None
        path = os.path.join(base, name)
        # finish any crashed swap BEFORE probing: a missing path with a
        # live .old must resolve to the recovered relation, not read as
        # never-materialized (which would silently rebuild a downstream
        # against a single-batch recompute — the history-loss mode
        # recover_interrupted_swap exists to prevent)
        recover_interrupted_swap(path)
        if has_parquet_files(path):
            return read_stored(spark, path)
        return None

    return stored_resolver


def _selected_upstream_map(registry, spark, names, mocks, vars, base):
    """For each selected model, its SELECTED upstreams — transitively
    THROUGH unselected nodes: with A(selected) -> B(unselected view) ->
    C(selected), A must wait for C, because A's build recomputes B,
    whose ref(C) must resolve to C's stored relation.

    The probe resolves refs of already-materialized models to their
    STORED relations under ``base`` (the same resolution the real run
    will use): a downstream plan may select columns that exist only in
    the stored relation (snapshot SCD2 columns; incremental
    append_new_columns from earlier batches) and would otherwise fail
    analysis during the edge harvest."""

    deps = registry.dependency_graph(
        spark, mocks=mocks, vars=vars, select=names,
        stored_resolver=make_stored_resolver(registry, spark, base),
    )
    selected = set(names)

    def sel_ups(n: str) -> set[str]:
        out: set[str] = set()
        stack, seen = list(deps.get(n, ())), set()
        while stack:
            d = stack.pop()
            if d in seen:
                continue
            seen.add(d)
            if d in selected:
                out.add(d)
            else:
                stack.extend(deps.get(d, ()))
        return out

    return {n: sel_ups(n) for n in names}


def run_models(
    registry: Registry,
    spark: SparkSession,
    warehouse: str,
    *,
    select: list[str] | None = None,
    watermark_col: str | None = None,
    now=None,
    mocks: dict[str, DataFrame] | None = None,
    target: str = "prod",
    schema: str | None = None,
    threads: int = 1,
    vars: dict | None = None,
    full_refresh: bool = False,
) -> dict[str, DataFrame]:
    """Materialize ``select`` (default: all) models. Returns the final
    DataFrame per model (for views: the lazy plan; for written models:
    a fresh scan of what was just written).

    ``target``/``schema`` apply the ``schema_name`` namespace policy:
    with a schema, written models land under
    ``<warehouse>/<schema_name(target, schema)>/`` — so a dev/CI run
    can never overwrite prod tables in a shared warehouse.

    ``threads`` mirrors dbt's node-level concurrency (reference
    ``profiles.yml:11,14`` — ``threads: 4`` dev / ``8`` prod): models
    whose upstreams have finished materialize concurrently from a
    thread pool. Spark supports concurrent job submission from multiple
    driver threads; the scheduler interleaves their stages. Semantics
    are identical to the serial run — a model's plan is built only
    after every upstream it refs has materialized (so ``ref`` resolves
    to the STORED relation, dbt's contract), which the dependency-
    ordered scheduler guarantees at any thread count.

    ``vars`` are run-level project variables (reference
    ``dbt_project.yml:20-26``), resolved by models via ``ctx.var``.

    ``full_refresh`` mirrors ``dbt run --full-refresh``: incremental
    models drop-and-rebuild from their current plan instead of
    merging; tables/views are unaffected (always rebuilt) and
    snapshots keep their immutable history, exactly like dbt."""
    base = warehouse_base(warehouse, target, schema)
    os.makedirs(base, exist_ok=True)
    names = select if select is not None else list(registry.models)
    # dedupe a repeated selection (order-preserving): the threaded
    # scheduler would otherwise submit the same model twice
    # CONCURRENTLY — two overwrite writes racing on one table path
    names = list(dict.fromkeys(names))

    # expose the injectable run clock to models via ctx.var("now") (the
    # Python-model ports' scored_at/forecast_generated_at — reference
    # py_data_quality_scores.py:216, py_unemployment_forecast.py:186
    # use datetime.now(); --now pins it for reproducible runs). An
    # explicit run-level "now" var wins; the key is inert for the
    # staging filter (models/econ.py _FILTER_VARS).
    if now is not None and "now" not in (vars or {}):
        vars = {**(vars or {}), "now": now}

    # dbt ref semantics for UNSELECTED written upstreams: an explicit
    # --select run must resolve refs to the already-materialized
    # warehouse relation (an incremental's fresh recompute would see
    # only the current batch, not its accumulated history). Selected
    # names are excluded — they materialize in-run and land in the
    # context via set_relation.
    ctx: Context = registry.context(
        spark, mocks=mocks, vars=vars,
        stored_resolver=make_stored_resolver(
            registry, spark, base, exclude=set(names)
        ),
    )
    out: dict[str, DataFrame] = {}

    if threads <= 1:
        import threading

        lock = threading.Lock()  # uncontended in the serial path
        # dependency-order a non-topological selection before running:
        # a mart listed before its incremental upstream would silently
        # build from a fresh single-batch recompute instead of the
        # stored relation (the same contract the threaded scheduler
        # enforces). A selection already in registry DECLARATION order
        # (any subsequence of it is topological — this covers both the
        # default all-models run and the CLI, which always passes an
        # explicit list) skips the probe-build edge harvest.
        decl = {n: i for i, n in enumerate(registry.models)}
        in_decl_order = all(
            decl[a] < decl[b] for a, b in zip(names, names[1:]) if a in decl and b in decl
        )
        if not in_decl_order and len(names) > 1:
            upstream = _selected_upstream_map(registry, spark, names, mocks, vars, base)
            ordered: list[str] = []
            done_names: set[str] = set()
            pending_names = list(names)  # given order = stable tie-break
            while pending_names:
                ready = [n for n in pending_names if upstream[n] <= done_names]
                if not ready:  # cycle — ctx.ref would also raise
                    raise RuntimeError(f"unschedulable models: {pending_names}")
                for n in ready:
                    pending_names.remove(n)
                    ordered.append(n)
                    done_names.add(n)
            names = ordered
        for name in names:
            out[name] = _materialize_one(
                ctx, spark, name, base, watermark_col, now, lock,
                full_refresh=full_refresh,
            )
        return out

    # -- concurrent DAG execution ------------------------------------
    # Upstream edges come from Registry.dependency_graph's THROWAWAY
    # context (plans built once purely to harvest refs — lazy,
    # driver-side, no jobs — then discarded). The REAL context builds
    # each model's plan only after its upstreams materialized,
    # preserving stored-relation semantics; the probe build is the
    # price of not having a static manifest to read edges from.
    import threading
    from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

    upstream = _selected_upstream_map(registry, spark, names, mocks, vars, base)

    build_lock = threading.Lock()
    done: set[str] = set()
    pending = list(names)  # registry order = stable tie-break
    with ThreadPoolExecutor(max_workers=threads) as pool:
        running: dict = {}
        while pending or running:
            ready = [n for n in pending if upstream[n] <= done]
            for n in ready:
                pending.remove(n)
                running[
                    pool.submit(
                        _materialize_one,
                        ctx, spark, n, base, watermark_col, now, build_lock,
                        full_refresh=full_refresh,
                    )
                ] = n
            if not running:
                # only reachable on a cycle, which ctx.ref would also
                # have raised on — defensive
                raise RuntimeError(f"unschedulable models: {pending}")
            finished, _ = wait(running, return_when=FIRST_COMPLETED)
            for fut in finished:
                n = running.pop(fut)
                try:
                    out[n] = fut.result()
                except BaseException:
                    # stop-at-first-failure like the serial path:
                    # cancel everything queued (in-flight writes — at
                    # most threads-1 — drain; threads cannot be killed)
                    # so no NEW model materializes downstream of a
                    # failure
                    for f in running:
                        f.cancel()
                    pool.shutdown(wait=True, cancel_futures=True)
                    raise
                done.add(n)
    return {n: out[n] for n in names}
