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
