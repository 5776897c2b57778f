"""Empty-input totality: every query must run (and return an empty or
well-defined result) when every source table has ZERO rows. At cluster
scale empty inputs are routine — a fresh partition, a filtered-out date
range, a cold-start table — and an engine whose operators crash on them
fails the first day of production. Catches: numpy paths assuming a
non-empty collected workload, schema inference on rowless partitioned
writes, and driver-side artifacts built from empty collect()s.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from dbt_economic_indicators_eu_spark.queries.common import TABLES, all_queries

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_total_on_empty_tables(spark, empty_sf, name):
    q = all_queries()[name]
    df = q.builder(spark, empty_sf)
    df.count()  # must not raise; row count itself is query-defined
