"""Pin the Arrow local-relation fast path's semantics: local_df must be
indistinguishable from classic list-based createDataFrame for every
shape the query surface feeds it (tuples, dicts, None cells, dates,
NTZ timestamps, empty frames)."""

import datetime

from dbt_economic_indicators_eu_spark.localdata import local_df


def test_tuples_with_nulls_and_dates(spark):
    rows = [
        ("DE", 2023, 4000000.0, datetime.date(2023, 1, 1)),
        ("MT", None, None, None),
    ]
    schema = "c string, y int, g double, d date"
    fast = local_df(spark, rows, schema)
    slow = spark.createDataFrame(rows, schema)
    assert fast.schema == slow.schema
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_dict_rows_match_schema_order(spark):
    rows = [
        {"b": 2.5, "a": "x"},
        {"a": "y"},  # missing key -> NULL
    ]
    fast = local_df(spark, rows, "a string, b double")
    got = {r["a"]: r["b"] for r in fast.collect()}
    assert got == {"x": 2.5, "y": None}


def test_timestamp_ntz(spark):
    rows = [("a", datetime.datetime(2023, 1, 1, 12, 0, 0)), ("b", None)]
    fast = local_df(spark, rows, "k string, ts timestamp_ntz")
    assert fast.schema.simpleString() == "struct<k:string,ts:timestamp_ntz>"
    got = dict(fast.collect())
    assert got["a"] == datetime.datetime(2023, 1, 1, 12, 0, 0)
    assert got["b"] is None


def test_empty_rows_keep_schema(spark):
    fast = local_df(spark, [], "a string, b int")
    assert fast.schema.simpleString() == "struct<a:string,b:int>"
    assert fast.count() == 0


def test_non_nullable_field_rejects_none_like_classic(spark):
    """verifySchema parity: classic createDataFrame(rows, schema)
    raises on a NULL in a non-nullable field at ANY nesting depth; the
    Arrow pandas path skips row verification, so local_df routes any
    strict-nullability schema through the classic (verifying) path —
    a fixture silently landing nulls in a field declared non-nullable
    is exactly the loud build-time failure the docstring promises."""
    import pytest
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    st = StructType([StructField("a", LongType(), nullable=False)])
    with pytest.raises(Exception, match="(?i)not? *null"):
        local_df(spark, [(None,)], st)
    # clean rows still pass, schema nullability preserved
    ok = local_df(spark, [(1,)], st)
    assert ok.schema["a"].nullable is False
    assert ok.collect()[0]["a"] == 1
    # nested strictness: a null ELEMENT inside containsNull=False
    nested = StructType(
        [StructField("a", ArrayType(LongType(), containsNull=False))]
    )
    with pytest.raises(Exception, match="(?i)not? *null"):
        local_df(spark, [([1, None],)], nested)
    ok2 = local_df(spark, [([1, 2],)], nested)
    assert list(ok2.collect()[0]["a"]) == [1, 2]


def test_property_fast_path_equals_classic(spark):
    """Randomized equivalence: for strings/ints/doubles/bools with
    arbitrary None placement, the Arrow fast path and the classic
    pickled path must produce identical rows and schema. (Every
    fixture/mock/seed in the engine funnels through local_df, so this
    is the guard for the whole literal-relation surface.)"""
    from hypothesis import given, settings, strategies as st

    def key(row):  # None-safe sort key
        return tuple((v is None, str(v)) for v in row)

    @settings(max_examples=15, deadline=None)
    @given(
        data=st.lists(
            st.tuples(st.text(max_size=8), st.integers(-2**31, 2**31 - 1) | st.none(),
                      st.floats(allow_nan=False, allow_infinity=False, width=32) | st.none(),
                      st.booleans() | st.none()),
            min_size=0, max_size=6,
        )
    )
    def check(data):
        schema = "a string, b int, c double, d boolean"
        fast = local_df(spark, data, schema)
        slow = spark.createDataFrame(data, schema)
        assert fast.schema == slow.schema
        assert sorted(map(tuple, fast.collect()), key=key) == sorted(
            map(tuple, slow.collect()), key=key
        )

    check()
