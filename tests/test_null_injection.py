"""Null-injection cross-engine parity: mutate the synthetic tables so
every 7th row carries NULLs in its nullable value/text columns, then
run each query AND its DuckDB oracle on the mutated data and compare
values. The driver gate runs on clean data; this pins the null
SEMANTICS — 3VL comparisons, null group keys surviving joins, codec
null conventions, try_divide — that only null-bearing data exercises.

The queries listed in _DIVERGERS are the ones that historically
diverged (round 4): quality_scorecard crashed on DIVIDE_BY_ZERO,
sketch_agg dropped the NULL event_type group at its equi-join,
schema_evolve_read merged genuine NULLs into the legacy group, and the
media trio disagreed with their oracles on NULL media.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from dbt_economic_indicators_eu_spark.queries.common import TABLES, all_queries

SRC = "/root/testdata/sf0.001"


def _shared_nullable() -> dict:
    # THE column recipe is tools/mutate_corpus.NULLABLE (the null
    # regime the gate runs); importing it keeps this regression and
    # the regime from drifting — a column added to one but not the
    # other (ts in round 9) would silently narrow coverage here
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    )
    import mutate_corpus

    return mutate_corpus.NULLABLE


_NULLABLE = _shared_nullable()

_DIVERGERS = [
    "quality_scorecard",
    "sketch_agg",
    "schema_evolve_read",
    "media_features",
    "media_pipeline",
    "frame_sample",
    "pack_sequences",
    "anomaly_zscore",
    "text_stats",
]


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_nulls"))
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        cols = [c for c in _NULLABLE.get(t, []) if c in tbl.column_names]
        if cols:
            n = tbl.num_rows
            mask = pa.array([(i % 7) == 3 for i in range(n)])
            for c in cols:
                arr = tbl.column(c)
                new = pc.if_else(mask, pa.nulls(n, arr.type), arr.combine_chunks())
                tbl = tbl.set_column(tbl.column_names.index(c), c, new)
        pq.write_table(tbl, f"{d}/{t}.parquet")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    return d, con


@pytest.mark.parametrize("name", _DIVERGERS)
def test_null_semantics_match_oracle(spark, null_sf, oracle_normalize, name):
    d, con = null_sf
    q = all_queries()[name]
    sdf = q.builder(spark, d).toPandas()
    odf = con.execute(q.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = oracle_normalize(sdf), oracle_normalize(odf)
    pd.testing.assert_frame_equal(
        a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )
