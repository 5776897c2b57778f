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
from .incremental import run_incremental
from .snapshot import run_snapshot

logger = logging.getLogger(__name__)


def schema_name(target: str, custom_schema: str) -> str:
    """Target-aware namespace policy (reference
    ``macros/data_quality.sql:66-73`` generate_schema_name): prod gets
    the bare schema, every other target gets a ``<target>_`` prefix so
    dev/CI runs land beside — never on top of — prod tables."""
    custom_schema = custom_schema.strip()
    return custom_schema if target == "prod" else f"{target}_{custom_schema}"


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
) -> dict[str, DataFrame]:
    """Materialize ``select`` (default: all) models. Returns the final
    DataFrame per model (for views: the lazy plan; for written models:
    a fresh scan of what was just written).

    ``target``/``schema`` apply the ``schema_name`` namespace policy:
    with a schema, written models land under
    ``<warehouse>/<schema_name(target, schema)>/`` — so a dev/CI run
    can never overwrite prod tables in a shared warehouse."""
    base = warehouse if schema is None else os.path.join(
        warehouse, schema_name(target, schema)
    )
    os.makedirs(base, exist_ok=True)
    ctx: Context = registry.context(spark, mocks=mocks)
    names = select if select is not None else list(registry.models)
    out: dict[str, DataFrame] = {}
    for name in names:
        model = registry.get(name)
        df = ctx.ref(name)  # builds upstream chain lazily, checks contracts
        path = os.path.join(base, name)
        if model.materialization == "view":
            df.createOrReplaceTempView(name)
            out[name] = df
        elif model.materialization == "table":
            observed, obs = observe_row_count(df, name)
            observed.write.mode("overwrite").parquet(path)
            log_observed(name, obs)
            out[name] = spark.read.parquet(path)
            ctx.set_relation(name, out[name])
        elif model.materialization == "incremental":
            assert model.unique_key, f"incremental model {name} needs unique_key"
            # per-model watermark (the reference's is_incremental()
            # predicate); the run-level param is a global override
            run_incremental(
                spark, path, df, model.unique_key,
                watermark_col if watermark_col is not None else model.watermark_col,
                partition_by=model.partition_by,
            )
            out[name] = spark.read.parquet(path)
            ctx.set_relation(name, out[name])
        elif model.materialization == "snapshot":
            assert model.unique_key and model.check_cols
            run_snapshot(spark, path, df, model.unique_key, list(model.check_cols), now)
            out[name] = spark.read.parquet(path)
            ctx.set_relation(name, out[name])
    return out
