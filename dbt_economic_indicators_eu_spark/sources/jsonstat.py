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
# per-dimension category positions, and the flat value cells. TWO
# fields ship in multiple physical forms, and from_json nulls a
# mismatched field silently — so each is parsed against every schema
# and the decoder coalesces (a single-schema parse would decode real
# API responses to zero rows / all-NULL codes with no error):
#
# - ``value``: a dense ARRAY, or the SPARSE OBJECT
#   {"<flat_index>": v, ...} the live Eurostat API (and the
#   reference's own parser, extract_eurostat.py:133:
#   ``data.get("value", {}).items()``) uses for tables with missing
#   cells.
# - ``dimension``: real JSON-stat 2.0 (and the live API) nests
#   per-dimension categories as ``{"<id>": {"category": {"index":
#   {"<code>": position, ...}}}}`` (extract_eurostat.py:135-146
#   inverts that object), while the simplified fixture form maps
#   ``{"<id>": ["<code0>", "<code1>", ...]}`` directly in index
#   order. The decoder accepts both.
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
# real JSON-stat 2.0 dimension form: category.index maps code -> flat
# position (the decoder inverts it position -> code per lookup)
JSONSTAT_SCHEMA_CATEGORY = StructType(
    [
        StructField(
            "dimension",
            MapType(
                StringType(),
                StructType(
                    [
                        StructField(
                            "category",
                            StructType(
                                [
                                    StructField(
                                        "index",
                                        MapType(StringType(), IntegerType()),
                                    )
                                ]
                            ),
                        )
                    ]
                ),
            ),
        )
    ]
)


def decode_jsonstat(payloads: DataFrame, json_col: str = "payload") -> DataFrame:
    """Decode a DataFrame of JSON-stat payload strings into flat rows
    ``(..., codes, flat_index, value)`` — generic over dimensionality
    because strides are computed from ``size`` per row.

    Output: one row per non-null value cell, with a ``codes`` map
    dimension-id → category code (the caller projects the dims it knows,
    e.g. ``codes['geo']``), mirroring parse_eurostat_json's records.
    Every NON-payload input column passes through unchanged, so a
    many-payload frame (e.g. ``(dataset_code, payload)`` per REST
    response) decodes in ONE parallel pass with each output row still
    attributable to its source — the scale story of the module
    docstring.
    """
    doc = F.from_json(F.col(json_col), JSONSTAT_SCHEMA)
    sparse = F.from_json(F.col(json_col), JSONSTAT_SCHEMA_SPARSE)
    cat = F.from_json(F.col(json_col), JSONSTAT_SCHEMA_CATEGORY)
    carry = [c for c in payloads.columns if c != json_col]
    # 'cell' is the intermediate explode alias below — a carry column
    # of that name would make the post-explode select ambiguous
    clash = {"__js_doc", "__js_cat", "cell", "flat_index", "value", "codes"} & set(carry)
    if clash:
        raise ValueError(f"input columns collide with decoder outputs: {sorted(clash)}")
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
        *carry,
        doc.alias("__js_doc"),
        cat.alias("__js_cat"),
        F.explode(cells).alias("cell"),
    ).select(
        *carry,
        "__js_doc",
        "__js_cat",
        F.col("cell.flat_index").alias("flat_index"),
        F.col("cell.value").alias("value"),
    ).filter(F.col("value").isNotNull())

    # stride for dim i = product of sizes of dims AFTER i
    # (extract_eurostat.py:150-155); position = (flat // stride) % size;
    # code = the position-th entry of the simplified array form, OR the
    # key whose category.index value equals the position (the real
    # JSON-stat 2.0 form — the same inversion extract_eurostat.py:146
    # does driver-side; the map_filter scan is O(categories), which is
    # dimension-cardinality small). One F.expr string instead of nested
    # Column builders: the identical expression tree, but ~3 py4j round
    # trips instead of ~50 — Column construction latency was a
    # measurable share of this source's cost (it is built twice per
    # ingest run).
    codes = F.expr(
        """
        map_from_arrays(
          __js_doc.id,
          zip_with(
            __js_doc.id,
            transform(
              sequence(0, size(__js_doc.id) - 1),
              i -> CAST(
                floor(
                  flat_index / aggregate(
                    slice(__js_doc.size, i + 2, size(__js_doc.id)),
                    CAST(1 AS BIGINT),
                    (acc, x) -> acc * x
                  )
                ) % element_at(__js_doc.size, i + 1)
                AS INT
              )
            ),
            (d, p) -> coalesce(
              try_element_at(try_element_at(__js_doc.dimension, d), p + 1),
              try_element_at(
                map_keys(
                  map_filter(
                    try_element_at(__js_cat.dimension, d).category.index,
                    (k, v) -> v = p
                  )
                ),
                1
              )
            )
          )
        )
        """
    )
    return exploded.select(
        *carry,
        codes.alias("codes"),
        F.col("flat_index"),
        F.col("value"),
    )


def decode_jsonstat_str(spark: SparkSession, payload: str) -> DataFrame:
    """Single-payload convenience wrapper (tests / demo queries)."""
    from ..localdata import local_df

    return decode_jsonstat(local_df(spark, [(payload,)], "payload string"))
