"""Fast small literal relations.

``spark.createDataFrame(list_of_rows)`` serializes through a pickled
Python RDD and evaluates it with executor-side Python workers — ~250 ms
per call even for ONE row on a warm local[32] session, because every
such relation pays a Python-worker round trip. Routing the same rows
through an object-dtype pandas frame takes the Arrow LocalRelation path
instead: the data lands JVM-side at plan build time (~40 ms), with
identical null / date / TIMESTAMP_NTZ semantics (pinned by
tests/test_localdata.py).

Every fixture/mock/seed-style relation in the query surface builds
through :func:`local_df`. At cluster scale this is not a hot path —
literal relations are bounded by definition — but the latency matters
for interactive sessions and for any per-micro-batch mock input.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

try:
    import pandas as pd
except ImportError:  # pragma: no cover — pandas is a hard dep of pyspark[sql]
    pd = None


def _has_strict_nullability(dt: DataType) -> bool:
    """True when any level of the type declares non-nullable content
    (StructField nullable=False, ArrayType containsNull=False, MapType
    valueContainsNull=False). Such schemas take the CLASSIC
    createDataFrame path, whose verifySchema raises on a violating row
    — the Arrow pandas path skips row verification entirely, so it
    would silently land nulls inside fields declared non-nullable at
    ANY nesting depth. Strict fixtures are rare; paying the slow path
    for exact verify parity beats re-implementing verifySchema here."""
    if isinstance(dt, StructType):
        return any(
            (not f.nullable) or _has_strict_nullability(f.dataType)
            for f in dt.fields
        )
    if isinstance(dt, ArrayType):
        return (not dt.containsNull) or _has_strict_nullability(dt.elementType)
    if isinstance(dt, MapType):
        return (
            (not dt.valueContainsNull)
            or _has_strict_nullability(dt.keyType)
            or _has_strict_nullability(dt.valueType)
        )
    return False


def local_df(
    spark: SparkSession,
    rows: Sequence[Any],
    schema: Union[str, StructType],
) -> DataFrame:
    """Literal rows (tuples or mappings) + explicit schema → DataFrame
    via the Arrow local-relation path, falling back to the classic
    pickled path if pandas/Arrow is unavailable or rejects the data."""
    rows = list(rows)
    if pd is None:
        return spark.createDataFrame(rows, schema=schema)
    if isinstance(schema, StructType):
        st = schema
    else:
        # Parse the DDL string into a StructType without running a job
        # (an empty createDataFrame builds only the plan).
        st = spark.createDataFrame([], schema).schema
    if _has_strict_nullability(st):
        return spark.createDataFrame(rows, schema=schema)
    names = [f.name for f in st.fields]
    if rows and isinstance(rows[0], Mapping):
        data = {n: [r.get(n) for r in rows] for n in names}
    else:
        # match the classic createDataFrame path, which raises on a
        # length mismatch — silently dropping trailing tuple elements
        # would lose fixture data instead of failing loudly
        for r in rows:
            if len(r) != len(names):
                raise ValueError(
                    f"row length {len(r)} != schema width {len(names)}: {r!r}"
                )
        data = {n: [r[i] for r in rows] for i, n in enumerate(names)}
    # object dtype keeps None as None (a float64 column would coerce it
    # to NaN, which Arrow ships as NaN, not NULL).
    pdf = pd.DataFrame(data, columns=names, dtype=object)
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        return spark.createDataFrame(pdf, st)
    except Exception:
        # Arrow conversion rejected the data (exotic type) — classic path.
        return spark.createDataFrame(rows, schema=schema)
    finally:
        # restore: a session that deliberately disabled Arrow must not
        # have the conf silently flipped by a fixture build
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
