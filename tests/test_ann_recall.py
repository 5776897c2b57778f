"""Approximate-NN QUALITY pins: the oracle gate proves ivf/lsh compute
exactly what they claim (their own bucketed semantics); this test pins
that the approximation is USEFUL — recall@5 against the exact
brute-force top-5 on the same query workload stays above a floor.

Floors are deliberately modest: the synthetic corpus is near-random
(max pair cosine ~0.5-0.6), the hardest regime for bucketed ANN —
random vectors spread across buckets, so nprobe=2 / one LSH table
misses real neighbors. A recall collapse to ~0 would still mean a
wiring bug (e.g. probing the wrong lists); that is what these floors
catch, while real corpora (clustered embeddings) sit far higher."""

import pytest

from dbt_economic_indicators_eu_spark.queries import simsearch as S

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def exact_top5(spark):
    rows = S.q_knn_brute(spark, SF_DIR).filter("rnk <= 5").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    return by_q


def _recall(by_q_exact, approx_rows):
    approx = {}
    for r in approx_rows:
        approx.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for q, exact in by_q_exact.items():
        total += len(exact)
        hits += len(exact & approx.get(q, set()))
    return hits / total


def test_ivf_recall_floor(spark, exact_top5):
    rows = S.q_knn_ivf(spark, SF_DIR).collect()
    assert _recall(exact_top5, rows) >= 0.25


def test_lsh_recall_floor(spark, exact_top5):
    # Single 6-plane table, exact-bucket probe: for a cos≈0.5 neighbor
    # the per-pair collision probability is (1 - θ/π)^6 = (2/3)^6 ≈ 8.8%
    # — the THEORETICAL ceiling on this corpus (near-random, max pair
    # cos ~0.5-0.6). Measured 0.06 ≈ theory; random chance (expected
    # bucket occupancy / corpus ≈ 1.6%) is 4x lower, which is what a
    # wiring bug would collapse to. Real corpora (clustered embeddings,
    # cos > 0.8 near-dups) collide at (1-θ/π)^6 > 50%.
    assert _recall(exact_top5, rows := S.q_knn_lsh(spark, SF_DIR).collect()) >= 0.03


def test_brute_is_self_consistent(spark, exact_top5):
    # every query returns exactly 5 exact neighbors, none of them itself
    for q, ns in exact_top5.items():
        assert len(ns) == 5
        assert q not in ns


def test_quantized_recall_high(spark, exact_top5):
    """int8 quantization perturbs cosines by ~1e-2 on random 64-dim
    vectors, so the quantized top-5 should recover most of the exact
    top-5 — far above any bucketed method on this corpus. A collapse
    means the quantizer (not the search) broke."""
    rows = S.q_knn_quantized(spark, SF_DIR).filter("rnk <= 5").collect()
    assert _recall(exact_top5, rows) >= 0.7
