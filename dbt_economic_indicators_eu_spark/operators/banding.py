"""Group-then-pair candidate generation for banded LSH dedup.

Shared by ``q_dedup_minhash`` (text minhash bands) and
``q_dedup_embedding`` (hyperplane buckets). The shape: group the banded
rows on the bucket key, collect the sorted member ids once, and emit
each bucket's ordered pairs from that list — one shuffle on the bucket
key, versus a banded self-join that recomputes the banding expression
on both sides.

Hot-bucket guard: pair count is quadratic per bucket, so one
degenerate bucket (all-identical documents, a null-ish embedding
region, an adversarial corpus) can dominate the whole job. Buckets
larger than ``cap`` are DROPPED before pairing, and the drop is never
silent — the count of dropped buckets and member ids is attached to
the query via ``DataFrame.observe`` (collected with the action itself,
no extra job; the same Observation mechanism ``materialize/run.py``
uses for row counts). Callers pass a ``pyspark.sql.Observation`` to
read the counts programmatically, or keep the default named metric
which surfaces through ``QueryExecutionListener`` / the Spark UI.

At the correctness scales (sf0.01/sf0.1) the largest real bucket is
~30 members, so ``HOT_BUCKET_CAP = 1024`` never fires on the gate;
recall loss from capping is deliberate and bounded (a 1024-member
near-dup bucket still emits ~524k verified pairs — beyond that the
members are better handled by the connected-components pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOT_BUCKET_CAP = 1024


def candidate_pairs(
    banded: DataFrame,
    bucket_keys: list[str],
    id_col: str,
    a_name: str,
    b_name: str,
    cap: int = HOT_BUCKET_CAP,
    observation=None,
) -> DataFrame:
    """Distinct ordered candidate pairs (a < b) from banded rows.

    ``banded`` has one row per (member id, bucket); ``bucket_keys``
    name the bucket columns. ``observation`` is a name (str) or a
    ``pyspark.sql.Observation`` receiving ``hot_buckets_dropped`` /
    ``hot_ids_dropped`` when the action runs.
    """
    grouped = (
        banded.groupBy(*bucket_keys)
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    hot = F.size("ids") > F.lit(cap)
    grouped = grouped.observe(
        observation if observation is not None else "hot_buckets",
        F.coalesce(F.sum(hot.cast("long")), F.lit(0)).alias("hot_buckets_dropped"),
        F.coalesce(F.sum(F.when(hot, F.size("ids")).otherwise(0)).cast("long"), F.lit(0)).alias(
            "hot_ids_dropped"
        ),
    ).filter(~hot)
    # One F.expr string instead of nested Column lambdas: identical
    # expression tree, a fraction of the py4j round trips (plan-build
    # latency was measurable on the banded dedup queries).
    pair_structs = F.expr(
        f"flatten(transform(ids, (x, i) -> "
        f"transform(slice(ids, i + 2, size(ids)), "
        f"y -> struct(x AS {a_name}, y AS {b_name}))))"
    )
    return (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select(f"p.{a_name}", f"p.{b_name}")
        .distinct()
    )
