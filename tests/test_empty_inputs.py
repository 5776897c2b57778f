"""Empty/vanishing-corpus parity: every query must run AND match its
DuckDB oracle when the source tables are empty (zero rows, schema
preserved) — and the shape-sensitive queries must also match on the
``tiny`` corpus (3 rows per table). At cluster scale empty inputs are
routine — a fresh partition, a filtered-out date range, a cold-start
table — and an engine whose operators crash (or silently diverge) on
them fails the first day of production.

Both corpora are built through ``tools/mutate_corpus.build`` — the
same recipes the full regime gate certifies at sf0.01 — so tool and
regression can never encode different shapes. The parity compare (not
just totality) is load-bearing: the plain "does it run" form of this
test missed the ANSI-vs-Spark grand-total-row divergence in
``rollup_time``'s rollup-over-zero-rows oracle, which the ``empty``
regime gate caught in round 12 (now pinned in the oracle twin with a
vacuous-on-data ``HAVING count(*) > 0``).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

from dbt_economic_indicators_eu_spark.queries.common import TABLES, all_queries

SRC = "/root/testdata/sf0.001"

# tiny-corpus subset: queries whose semantics hinge on group/window
# cardinality — single-element windows, sub-guard statistics, ANN
# corpora smaller than k, zero-pair candidate stages
_TINY_SENSITIVE = [
    "anomaly_zscore",
    "forecast_ols",
    "forecast_ensemble",
    "quality_scorecard",
    "sketch_agg",
    "table_profile",
    "rollup_time",
    "rolling_avg",
    "monthly_lag",
    "rank_in_year",
    "latest_per_entity",
    "dedup_minhash",
    "dedup_embedding",
    "dedup_cluster",
    "knn_brute",
    "knn_lsh",
    "knn_ivf",
    "kmeans_refine",
    "tfidf_topk",
    "temperature_resample",
    "paragraph_dedup",
    "sessionize",
]


def _load_mutator():
    tools_dir = os.path.join(os.path.dirname(__file__), "..", "tools")
    if tools_dir not in sys.path:
        sys.path.insert(0, tools_dir)
    import mutate_corpus

    return mutate_corpus


def _regime_fixture(tmp_path_factory, regime: str):
    mc = _load_mutator()
    d = str(tmp_path_factory.mktemp(f"sf_{regime}"))
    mc.build(regime, SRC, d)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    return d, con


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    return _regime_fixture(tmp_path_factory, "empty")


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    return _regime_fixture(tmp_path_factory, "tiny")


def _assert_parity(spark, corpus, oracle_normalize, name):
    d, con = corpus
    q = all_queries()[name]
    sdf = q.builder(spark, d).toPandas()
    odf = con.execute(q.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = oracle_normalize(sdf), oracle_normalize(odf)
    pd.testing.assert_frame_equal(
        a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_matches_oracle_on_empty_tables(
    spark, empty_sf, oracle_normalize, name
):
    _assert_parity(spark, empty_sf, oracle_normalize, name)


@pytest.mark.parametrize("name", _TINY_SENSITIVE)
def test_query_matches_oracle_on_tiny_tables(
    spark, tiny_sf, oracle_normalize, name
):
    _assert_parity(spark, tiny_sf, oracle_normalize, name)
