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

import os

from pyspark.sql import DataFrame, SparkSession

from ..plans.registry import Context, Registry
from .incremental import run_incremental
from .snapshot import run_snapshot


def run_models(
    registry: Registry,
    spark: SparkSession,
    warehouse: str,
    *,
    select: list[str] | None = None,
    watermark_col: str | None = None,
    now=None,
    mocks: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Materialize ``select`` (default: all) models. Returns the final
    DataFrame per model (for views: the lazy plan; for written models:
    a fresh scan of what was just written)."""
    os.makedirs(warehouse, exist_ok=True)
    ctx: Context = registry.context(spark, mocks=mocks)
    names = select if select is not None else list(registry.models)
    out: dict[str, DataFrame] = {}
    for name in names:
        model = registry.get(name)
        df = ctx.ref(name)  # builds upstream chain lazily, checks contracts
        path = os.path.join(warehouse, name)
        if model.materialization == "view":
            df.createOrReplaceTempView(name)
            out[name] = df
        elif model.materialization == "table":
            df.write.mode("overwrite").parquet(path)
            out[name] = spark.read.parquet(path)
        elif model.materialization == "incremental":
            assert model.unique_key, f"incremental model {name} needs unique_key"
            run_incremental(spark, path, df, model.unique_key, watermark_col)
            out[name] = spark.read.parquet(path)
        elif model.materialization == "snapshot":
            assert model.unique_key and model.check_cols
            run_snapshot(spark, path, df, model.unique_key, list(model.check_cols), now)
            out[name] = spark.read.parquet(path)
    return out
