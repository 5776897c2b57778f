"""JSON-stat decoder — OP-SRC-JSONSTAT.

The reference decodes Eurostat JSON-stat responses with driver-side
stride arithmetic over the flat ``value`` array
(scripts/extract_eurostat.py:120-178: strides from the reversed ``size``
array :150-155, per-value div/mod decode :157-175).

Spark-native re-expression: the payload is parsed with ``from_json``
(MapType/ArrayType — the one place semi-structured types appear in the
reference surface, SURVEY §1.2), the value array is ``posexplode``d and
each flat index is decoded to dimension codes with integer div/mod —
all JVM-side expressions, no Python in the loop. At scale this runs one
payload per row of an input DataFrame (e.g. one REST response per
dataset partition), parallelizing decode across executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# JSON-stat subset the reference consumes: dimension id order, sizes,
# per-dimension category labels (index order), and the flat value
# cells. JSON-stat 2.0 ships ``value`` in TWO physical forms — a dense
# ARRAY, or the SPARSE OBJECT {"<flat_index>": v, ...} the live
# Eurostat API (and the reference's own parser,
# extract_eurostat.py:133: ``data.get("value", {}).items()``) uses for
# tables with missing cells. from_json nulls a mismatched field
# silently, so the payload is parsed against BOTH schemas and the
# decoder coalesces — an array-only schema would decode real API
# responses to zero rows with no error.
_BASE_FIELDS = [
    StructField("id", ArrayType(StringType())),
    StructField("size", ArrayType(IntegerType())),
    StructField("dimension", MapType(StringType(), ArrayType(StringType()))),
]
JSONSTAT_SCHEMA = StructType(
    _BASE_FIELDS + [StructField("value", ArrayType(DoubleType()))]
)
JSONSTAT_SCHEMA_SPARSE = StructType(
    _BASE_FIELDS + [StructField("value", MapType(StringType(), DoubleType()))]
)


def decode_jsonstat(payloads: DataFrame, json_col: str = "payload") -> DataFrame:
    """Decode a DataFrame of JSON-stat payload strings into flat rows
    ``(dim_0_code, dim_1_code, ..., flat_index, value)`` — generic over
    dimensionality because strides are computed from ``size`` per row.

    Output: one row per non-null value cell, with a ``codes`` map
    dimension-id → category code (the caller projects the dims it knows,
    e.g. ``codes['geo']``), mirroring parse_eurostat_json's records.
    """
    doc = F.from_json(F.col(json_col), JSONSTAT_SCHEMA)
    sparse = F.from_json(F.col(json_col), JSONSTAT_SCHEMA_SPARSE)
    # unify both physical forms into (flat_index, value) pairs: dense
    # array -> posexplode positions; sparse object -> int(map key).
    # Exactly one of the two parses yields a non-null value field.
    cells = (
        F.when(
            doc["value"].isNotNull() & (F.size(doc["value"]) > 0),
            F.transform(
                F.sequence(F.lit(0), F.size(doc["value"]) - 1),
                lambda i: F.struct(
                    i.cast("int").alias("flat_index"),
                    F.element_at(doc["value"], (i + 1).cast("int")).alias("value"),
                ),
            ),
        )
        .when(
            sparse["value"].isNotNull(),
            F.transform(
                F.map_entries(sparse["value"]),
                lambda e: F.struct(
                    e["key"].cast("int").alias("flat_index"),
                    e["value"].alias("value"),
                ),
            ),
        )
        .otherwise(F.array().cast("array<struct<flat_index:int,value:double>>"))
    )
    exploded = payloads.select(
        doc.alias("doc"),
        F.explode(cells).alias("cell"),
    ).select(
        "doc",
        F.col("cell.flat_index").alias("flat_index"),
        F.col("cell.value").alias("value"),
    ).filter(F.col("value").isNotNull())

    # stride for dim i = product of sizes of dims AFTER i
    # (extract_eurostat.py:150-155); code index = (flat // stride) % size.
    # One F.expr string instead of nested Column builders: the identical
    # expression tree, but ~3 py4j round trips instead of ~50 — Column
    # construction latency was a measurable share of this source's cost
    # (it is built twice per ingest run).
    codes = F.expr(
        """
        map_from_arrays(
          doc.id,
          transform(
            sequence(0, size(doc.id) - 1),
            i -> element_at(
              element_at(doc.dimension, element_at(doc.id, i + 1)),
              CAST(
                floor(
                  flat_index / aggregate(
                    slice(doc.size, i + 2, size(doc.id)),
                    CAST(1 AS BIGINT),
                    (acc, x) -> acc * x
                  )
                ) % element_at(doc.size, i + 1)
                AS INT
              ) + 1
            )
          )
        )
        """
    )
    return exploded.select(
        codes.alias("codes"),
        F.col("flat_index"),
        F.col("value"),
    )


def decode_jsonstat_str(spark: SparkSession, payload: str) -> DataFrame:
    """Single-payload convenience wrapper (tests / demo queries)."""
    from ..localdata import local_df

    return decode_jsonstat(local_df(spark, [(payload,)], "payload string"))
