"""Degenerate-distribution parity: every document identical (one giant
near-dup class), every event from ONE user of ONE type (maximal key
skew), every embedding identical (all-ties ANN). These are the shapes
that break engines at scale — hot keys, capped LSH buckets, rank ties
— and the shapes synthetic uniform data never exercises. Each checked
query must still match its DuckDB oracle value-for-value.

pivot_events is the round-4 catch: Spark's pivot emits NULL for a
(user, type) cell with no rows, SQL's count(*) FILTER says 0 — only
visible once a user lacks some event type.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dbt_economic_indicators_eu_spark.queries.common import TABLES, all_queries

SRC = "/root/testdata/sf0.001"

_CHECK = [
    "pivot_events",       # absent pivot cells (the round-4 catch)
    "sketch_agg",         # single group, exact-vs-approx on ties
    "salted_agg",         # one hot key through the two-phase salt
    "temperature_resample",  # single language -> keep-everything edge
    "dedup_minhash",      # one giant bucket -> HOT_BUCKET_CAP path
    "dedup_cluster",      # one connected component spanning the corpus
    "knn_brute",          # all-ties cosine -> neighbor_id tie-break
    "funnel_steps",       # single-type events -> empty funnel tail
    "event_transitions",  # self-transitions only
]


@pytest.fixture(scope="module")
def skew_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_skew"))
    same = "the same boilerplate text repeated across every document in the corpus"
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        n = tbl.num_rows
        if t == "documents":
            tbl = (
                tbl.set_column(tbl.column_names.index("text"), "text", pa.array([same] * n))
                .set_column(tbl.column_names.index("lang"), "lang", pa.array(["en"] * n))
                .set_column(tbl.column_names.index("source"), "source", pa.array(["src0"] * n))
                .set_column(
                    tbl.column_names.index("n_chars"),
                    "n_chars",
                    pa.array([len(same)] * n, pa.int64()),
                )
            )
        elif t == "events":
            tbl = (
                tbl.set_column(
                    tbl.column_names.index("user_id"), "user_id", pa.array([1] * n, pa.int64())
                ).set_column(
                    tbl.column_names.index("event_type"),
                    "event_type",
                    pa.array(["click"] * n),
                )
            )
        elif t == "embeddings":
            one = tbl.column("embedding").combine_chunks()[0]
            tbl = tbl.set_column(
                tbl.column_names.index("embedding"),
                "embedding",
                pa.array([one.as_py()] * n, tbl.schema.field("embedding").type),
            )
        pq.write_table(tbl, f"{d}/{t}.parquet")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    return d, con


@pytest.mark.parametrize("name", _CHECK)
def test_degenerate_distribution_matches_oracle(spark, skew_sf, oracle_normalize, name):
    normalize = oracle_normalize
    d, con = skew_sf
    q = all_queries()[name]
    sdf = q.builder(spark, d).toPandas()
    odf = con.execute(q.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    pd.testing.assert_frame_equal(
        normalize(sdf), normalize(odf), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )
