"""Fused ANN scans (queries/simsearch.py): the single-pass
mapInPandas local-top-k reduction must equal an independent
brute-force reference — including across MULTIPLE input partitions
(the local-top-k union property) and under exact cosine TIES
(duplicate vectors), neither of which the driver testdata exercises.
"""

from __future__ import annotations

import numpy as np
import pytest

from dbt_economic_indicators_eu_spark.queries import simsearch as s

# N chosen so the IVF probe mask is REAL: centroids {7,132,257} (3 >
# nprobe=2), so some (query, candidate) pairs are excluded and a
# transposed/mis-indexed mask cannot pass. Queries {0,50,...,250}.
N = 300
DIM = s._DIM
N_DISTINCT = 30  # each vector duplicated 10x -> guaranteed cos==1.0 ties


def _corpus() -> np.ndarray:
    rng = np.random.RandomState(42)
    base = rng.randn(N_DISTINCT, DIM).astype(np.float32)
    return base[np.arange(N) % N_DISTINCT]


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    """A synthetic sf dir whose embeddings table is 4 parquet files —
    4 scan partitions, so each mapInPandas batch sees only a slice and
    the global answer exists only after the union."""
    d = str(tmp_path_factory.mktemp("ann"))
    vecs = _corpus()
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(N)],
        "vec_id bigint, embedding array<float>",
    )
    df.repartition(4).write.parquet(f"{d}/embeddings.parquet")
    return d


def _cos_matrix() -> np.ndarray:
    v = _corpus().astype(np.float64)
    nrm = np.sqrt((v * v).sum(axis=1))
    return (v @ v.T) / (nrm[:, None] * nrm[None, :])


def _ref_topk(cand_ok, k):
    """Sequential reference: per query, order candidates by
    (cos DESC, neighbor_id ASC), take k. cand_ok[q][i] -> candidate?"""
    cos = _cos_matrix()
    out = set()
    for q in range(0, N, s._QUERY_MOD):
        cands = [i for i in range(N) if i != q and cand_ok(q, i)]
        cands.sort(key=lambda i: (-cos[q, i], i))
        for rnk, i in enumerate(cands[:k], start=1):
            out.add((q, i, round(cos[q, i], 6), rnk))
    return out


def _rows(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_knn_brute_fused_equals_reference(spark, sf_dir):
    got = _rows(
        s.q_knn_brute(spark, sf_dir), ["q_id", "neighbor_id", "cosine", "rnk"]
    )
    assert got == _ref_topk(lambda q, i: True, s._TOP_K)
    # ties actually occurred: every query has 9 exact duplicates, so
    # the whole top-10 but one is cosine 1.0 broken by neighbor_id
    ones = sorted(r[1] for r in got if r[0] == 0 and r[2] == 1.0)
    dups = sorted(i for i in range(N) if i % N_DISTINCT == 0 and i != 0)
    assert len(ones) >= s._TOP_K - 1 and ones == dups[: len(ones)]


def test_knn_ivf_fused_equals_reference(spark, sf_dir):
    cos = _cos_matrix()
    c_ids = [i for i in range(N) if i % s._IVF_CENTROID_STRIDE == 7]

    def nearest_cent(i, n):
        order = sorted(c_ids, key=lambda c: (-cos[i, c], c))
        return order[:n]

    assigned = {i: nearest_cent(i, 1)[0] for i in range(N)}
    probes = {
        q: set(nearest_cent(q, s._IVF_NPROBE)) for q in range(0, N, s._QUERY_MOD)
    }
    # the probe mask must be non-trivial, else this test degenerates to
    # brute force and the mask indexing goes untested
    assert any(
        assigned[i] not in ps for ps in probes.values() for i in range(N)
    )
    got = _rows(
        s.q_knn_ivf(spark, sf_dir), ["q_id", "neighbor_id", "cosine", "rnk"]
    )
    assert got == _ref_topk(lambda q, i: assigned[i] in probes[q], s._TOP_K_IVF)


def test_knn_lsh_fused_equals_reference(spark, sf_dir):
    v = _corpus().astype(np.float64)
    planes = np.array(s._PLANES)
    shifts = np.array([1 << j for j in range(len(s._PLANES))])
    buckets = (((v @ planes.T) > 0) * shifts).sum(axis=1)

    got = _rows(
        s.q_knn_lsh(spark, sf_dir),
        ["q_id", "bucket_id", "neighbor_id", "cosine", "rnk"],
    )
    ref = {
        (q, int(buckets[q]), i, c, r)
        for (q, i, c, r) in _ref_topk(
            lambda q, i: buckets[i] == buckets[q], s._TOP_K_LSH
        )
    }
    assert got == ref


def test_query_workload_cap_guard(spark, sf_dir, monkeypatch):
    """The driver-side query collect is legitimate only while queries
    are a workload, not data: with the cap lowered below the fixture's
    6 queries, _query_artifacts must fail FAST with the batching
    guidance (not OOM or silently broadcast) — and the guard must cost
    no extra job at the normal cap (limit(cap+1) rides the one
    collect)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # normal cap: works, full query set survives the limit()
    arts = s._query_artifacts(emb)
    assert arts is not None and len(arts[0]) == len(range(0, N, s._QUERY_MOD))
    monkeypatch.setattr(s, "_MAX_DRIVER_QUERIES", 3)
    with pytest.raises(ValueError, match="exceeds 3 vectors.*chunk"):
        s._query_artifacts(emb)
