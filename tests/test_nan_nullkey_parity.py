"""NaN-value and NULL-join-key cross-engine parity for the queries
hardened against those shapes (round-8 review pass): the gate corpora
carry neither NaN ``events.value`` nor NULL ``events.user_id``, so
these semantics are pinned here.

- ``forecast_ensemble``: a NaN in a user's series poisons every fold;
  the all-NaN triple must average to NULL in BOTH engines (unguarded
  0.0/0.0 is engine-dependent: IEEE NaN in Spark, NULL in DuckDB).
- ``anomaly_zscore``: the finite guard skips NaN like NULL.
- ``sketch_agg``: exact distinct-user counts must skip NULL users the
  way SQL count(DISTINCT user_id) does.
- ``asof_join``: NULL join keys never match (DuckDB ASOF ON-equality
  semantics); NULL-key left rows pass through unmatched.
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

_QUERIES = [
    "forecast_ensemble",
    "anomaly_zscore",
    "sketch_agg",
    "asof_join",
    # NULL-embedding rows: numpy np.stack crashes where the oracles
    # drop the row — both sides now filter at the scan (embeddings_scan)
    "knn_brute",
    "knn_quantized",
    "knn_lsh",
    "lsh_buckets",
    "knn_ivf",
    "dedup_embedding",
    "embedding_normalize",
    "kmeans_refine",
    "label_centroids",
]


@pytest.fixture(scope="module")
def mutated_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_nan_nullkey"))
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "events":
            n = tbl.num_rows
            # every 11th row: NaN value (a *value*, not a NULL — it
            # flows through aggregates where NULL would be skipped)
            val = tbl.column("value").combine_chunks()
            nan_mask = pa.array([(i % 11) == 5 for i in range(n)])
            val = pc.if_else(nan_mask, pa.scalar(float("nan"), pa.float64()), val)
            tbl = tbl.set_column(tbl.column_names.index("value"), "value", val)
            # every 13th row: NULL user_id (join/group key)
            uid = tbl.column("user_id").combine_chunks()
            null_mask = pa.array([(i % 13) == 7 for i in range(n)])
            uid = pc.if_else(null_mask, pa.nulls(n, uid.type), uid)
            tbl = tbl.set_column(tbl.column_names.index("user_id"), "user_id", uid)
        if t == "embeddings":
            n = tbl.num_rows
            emb = tbl.column("embedding").combine_chunks()
            mask = pa.array([(i % 17) == 3 for i in range(n)])
            emb = pc.if_else(mask, pa.nulls(n, emb.type), emb)
            tbl = tbl.set_column(tbl.column_names.index("embedding"), "embedding", emb)
        pq.write_table(tbl, f"{d}/{t}.parquet")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    return d, con


@pytest.mark.parametrize("name", _QUERIES)
def test_nan_and_nullkey_semantics_match_oracle(spark, mutated_sf, oracle_normalize, name):
    d, con = mutated_sf
    q = all_queries()[name]
    sdf = q.builder(spark, d).toPandas()
    odf = con.execute(q.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = oracle_normalize(sdf), oracle_normalize(odf)
    pd.testing.assert_frame_equal(
        a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )
