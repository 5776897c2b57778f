"""Property-based invariants for the round-4 corpus/embedding
operators, checked against independent pure-Python/numpy reference
implementations on randomized inputs (the oracle gate checks one fixed
corpus; these check ARBITRARY ones):

P1  paragraph_dedup == brute-force window hashing + cross-doc counting
P2  temperature_resample thresholds are monotone decreasing in corpus
    size, the smallest language keeps everything, and membership is
    the deterministic md5 bucket
P3  kmeans_refine matches a numpy Lloyd iteration exactly (assignment
    argmin with lowest-k tie-break, per-cluster means, shift norms)
P4  tfidf_topk scores match a pure-Python tf*round(ln(N/df)*1e6)
    computation, and ranking is (score desc, token asc)

Small deterministic profile: pyspark actions are slow, so few examples
with rich shapes beat many trivial ones.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_economic_indicators_eu_spark.localdata import local_df
from dbt_economic_indicators_eu_spark.queries import corpus, simsearch

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "x", "y"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=25).map(" ".join),
    min_size=1,
    max_size=8,
)


def _mkdocs(spark, texts):
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    return local_df(
        spark,
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def _norm_words(t):
    return " ".join((t or "").lower().split()).split(" ")


@given(texts=doc_strategy)
@settings(**_SETTINGS)
def test_paragraph_dedup_matches_brute_force(spark, texts):
    # pure-python reference of the documented semantics
    paras = {}
    for i, t in enumerate(texts):
        w = _norm_words(t)
        n = math.ceil(len(w) / 10)
        ps = [" ".join(w[j * 10 : j * 10 + 10]) for j in range(n)]
        paras[i] = [p for p in ps if p != ""]
    docs_per_h = defaultdict(set)
    for i, ps in paras.items():
        for p in ps:
            docs_per_h[p].add(i)
    want = {
        i: (len(ps), sum(1 for p in ps if len(docs_per_h[p]) > 1))
        for i, ps in paras.items()
        if ps
    }

    import unittest.mock as mock

    with mock.patch.object(corpus, "load", lambda s, d, n: _mkdocs(spark, texts)):
        got = {
            r.doc_id: (r.n_paras, r.n_dup_paras)
            for r in corpus.q_paragraph_dedup(spark, "ignored").collect()
        }
    assert got == want


@given(
    sizes=st.lists(st.integers(1, 30), min_size=2, max_size=4),
)
@settings(**_SETTINGS)
def test_temperature_thresholds_monotone_and_deterministic(spark, sizes):
    texts, langs = [], []
    for li, n in enumerate(sizes):
        for _ in range(n):
            texts.append(f"doc {len(texts)} text")
            langs.append(f"l{li}")
    rows = [
        (i, t, lang, "s0", len(t)) for i, (t, lang) in enumerate(zip(texts, langs))
    ]
    docs = local_df(
        spark,
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    import unittest.mock as mock

    with mock.patch.object(corpus, "load", lambda s, d, n: docs):
        out = {
            r.lang: r for r in corpus.q_temperature_resample(spark, "i").collect()
        }
    n_min = min(sizes)
    for li, n in enumerate(sizes):
        r = out[f"l{li}"]
        assert r.thresh == math.floor(1e6 * math.sqrt(n_min / n))
        assert 0 <= r.n_kept <= r.n_docs == n
        if n == n_min:
            assert r.thresh == 1_000_000 and r.n_kept == n  # keeps everything
    # monotone: bigger language -> smaller threshold
    pairs = sorted((out[f"l{li}"].n_docs, out[f"l{li}"].thresh) for li in range(len(sizes)))
    for (n1, t1), (n2, t2) in zip(pairs, pairs[1:]):
        assert n1 == n2 or t1 >= t2
    # membership is the content-independent md5 bucket
    for li, n in enumerate(sizes):
        r = out[f"l{li}"]
        kept = sum(
            1
            for i, lang in enumerate(langs)
            if lang == f"l{li}"
            and int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1_000_000
            < r.thresh
        )
        assert r.n_kept == kept


@given(data=st.data())
@settings(**_SETTINGS)
def test_kmeans_refine_matches_numpy_lloyd(spark, data):
    rng = np.random.RandomState(data.draw(st.integers(0, 10_000)))
    k, dim, n = 3, 4, data.draw(st.integers(4, 20))
    vecs = rng.randn(n, dim).astype(np.float32)
    emb = local_df(
        spark,
        [(i, [float(x) for x in vecs[i]], 0) for i in range(n)],
        "vec_id bigint, embedding array<float>, label int",
    )
    import unittest.mock as mock

    with mock.patch.object(simsearch, "load", lambda s, d, nm: emb), mock.patch.object(
        simsearch, "_KM_K", k
    ):
        got = {r.k: r for r in simsearch.q_kmeans_refine(spark, "i").collect()}

    v = vecs.astype(np.float64)
    seeds = v[:k]
    d2 = ((v[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)  # argmin takes the first minimum = lowest k
    for kk in range(k):
        members = v[assign == kk]
        if len(members) == 0:
            assert kk not in got
            continue
        newc = members.mean(axis=0)
        r = got[kk]
        assert r.n_members == len(members)
        assert r.shift == pytest.approx(
            float(np.sqrt(((newc - seeds[kk]) ** 2).sum())), abs=1e-5
        )
        assert r.new_norm == pytest.approx(
            float(np.sqrt((newc**2).sum())), abs=1e-5
        )


@given(texts=doc_strategy)
@settings(**_SETTINGS)
def test_tfidf_matches_pure_python(spark, texts):
    toks = {i: [t for t in _norm_words(tx) if t] for i, tx in enumerate(texts)}
    n_docs = len(texts)
    df = Counter()
    for ts in toks.values():
        for t in set(ts):
            df[t] += 1
    want = {}
    for i, ts in toks.items():
        tf = Counter(ts)
        scored = sorted(
            (
                (-tf[t] * round(math.log(n_docs / df[t]) * 1e6), t)
                for t in tf
            ),
        )[:3]
        want[i] = [(t, -s / 1e6) for s, t in scored]

    import unittest.mock as mock

    with mock.patch.object(corpus, "load", lambda s, d, n: _mkdocs(spark, texts)):
        rows = corpus.q_tfidf_topk(spark, "ignored").collect()
    got = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.doc_id, r.rk)):
        got[r.doc_id].append((r.tok, r.tfidf))
    assert dict(got) == {i: v for i, v in want.items() if v}
