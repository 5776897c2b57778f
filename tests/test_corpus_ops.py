"""Semantics pins for the round-4 corpus/analytics operators
(queries/corpus.py, kmeans_refine, funnel_steps, event_transitions) on
hand-built inputs where the expected answer is computable by eye. The
cross-engine value check lives in the oracle gate; these pin SEMANTICS:
bloom prefilter exactness, strict funnel ordering, tf-idf ranking,
cross-doc (not intra-doc) paragraph dup counting, argmin tie-breaks.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbt_economic_indicators_eu_spark.localdata import local_df
from dbt_economic_indicators_eu_spark.queries import corpus, relational, simsearch


def _docs(spark, rows):
    """rows: list of (text, lang) or (text, lang, source)."""
    full = [
        (i, r[0], r[1], (r[2] if len(r) > 2 else "src0"), len(r[0]) if r[0] else 0)
        for i, r in enumerate(rows)
    ]
    return local_df(
        spark,
        full,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def _events(spark, rows):
    """rows: list of (event_id, minute, user_id, event_type)."""
    full = [
        (eid, dt.datetime(2025, 1, 1, 0, m), uid, et, 1.0, "{}")
        for eid, m, uid, et in rows
    ]
    return local_df(
        spark,
        full,
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string,"
        " value double, props string",
    )


# ---------------------------------------------------------------- tfidf


def test_tfidf_rare_term_outranks_common(spark, monkeypatch):
    rows = [
        ("shared zebra shared shared", "en"),
        ("shared shared shared", "en"),
        ("shared other", "en"),
    ]
    monkeypatch.setattr(corpus, "load", lambda s, d, n: _docs(spark, rows))
    out = corpus.q_tfidf_topk(spark, "ignored").collect()
    top = {r.doc_id: r.tok for r in out if r.rk == 1}
    # 'shared' is in every doc -> idf = ln(1) = 0 -> score 0; the
    # doc-unique terms win despite lower tf
    assert top[0] == "zebra" and top[2] == "other"
    # scores for the unique terms: 1 * ln(3/1)
    z = [r.tfidf for r in out if r.doc_id == 0 and r.tok == "zebra"][0]
    assert z == pytest.approx(1.098612, abs=1e-6)


def test_tfidf_topk_caps_at_three_and_breaks_ties_lexically(spark, monkeypatch):
    rows = [("a b c d e", "en"), ("x", "en")]
    monkeypatch.setattr(corpus, "load", lambda s, d, n: _docs(spark, rows))
    out = [r for r in corpus.q_tfidf_topk(spark, "ignored").collect() if r.doc_id == 0]
    assert [r.tok for r in sorted(out, key=lambda r: r.rk)] == ["a", "b", "c"]


# ---------------------------------------------------------- paragraph dedup


def test_paragraph_dedup_counts_cross_doc_only(spark, monkeypatch):
    p1 = " ".join(f"w{i}" for i in range(10))  # one exact 10-word window
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    rows = [
        (f"{p1} {uniq_a}", "en"),  # doc 0: [p1, uniq_a]
        (f"{p1} {uniq_b}", "en"),  # doc 1: [p1, uniq_b]
        (f"{uniq_a[:0]}solo text here", "en"),  # doc 2: one short unique para
    ]
    monkeypatch.setattr(corpus, "load", lambda s, d, n: _docs(spark, rows))
    out = {r.doc_id: r for r in corpus.q_paragraph_dedup(spark, "ignored").collect()}
    assert out[0].n_paras == 2 and out[0].n_dup_paras == 1
    assert out[1].n_paras == 2 and out[1].n_dup_paras == 1
    assert out[2].n_paras == 1 and out[2].n_dup_paras == 0
    assert out[0].dup_ratio == 0.5


def test_paragraph_dedup_intra_doc_repeat_is_not_cross_doc_dup(spark, monkeypatch):
    p = " ".join(f"r{i}" for i in range(10))
    rows = [(f"{p} {p}", "en")]  # same paragraph twice IN ONE doc
    monkeypatch.setattr(corpus, "load", lambda s, d, n: _docs(spark, rows))
    out = corpus.q_paragraph_dedup(spark, "ignored").collect()[0]
    assert out.n_paras == 2 and out.n_dup_paras == 0


# ------------------------------------------------------- bloom decontam


def test_bloom_decontaminate_equals_exact_join(spark, monkeypatch):
    # Big-ish corpus: 40 docs, doc 0 and 37 are "benchmark". The bloom
    # path must be output-identical to the exact join (false positives
    # are removed by the confirm join; bloom has no false negatives).
    rows = []
    for i in range(40):
        if i % 7 == 0:
            rows.append((f"common phrase here plus tail{i}", "en", f"s{i % 3}"))
        else:
            rows.append((f"unique{i} words{i} only{i} doc{i}", "en", f"s{i % 3}"))
    docs = _docs(spark, rows)
    monkeypatch.setattr(corpus, "load", lambda s, d, n: docs)
    got = {
        r.source: (r.n_docs_contaminated, r.n_shared_shingles)
        for r in corpus.q_bloom_decontaminate(spark, "ignored").collect()
    }
    # exact reference computed with DataFrame ops, no bloom
    from dbt_economic_indicators_eu_spark.queries.datapipe import _with_shingles

    bench = (
        _with_shingles(docs.filter(F.col("doc_id") % 37 == 0))
        .select(F.explode("shingles").alias("sg"))
        .filter(F.col("sg") != "")
        .distinct()
    )
    corp = _with_shingles(
        docs.filter(F.col("doc_id") % 37 != 0), extra=("source",)
    ).select("doc_id", "source", F.explode("shingles").alias("sg"))
    want = {
        r.source: (r.nd, r.ns)
        for r in corp.join(bench, "sg")
        .groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("nd"), F.count(F.lit(1)).alias("ns")
        )
        .collect()
    }
    assert got == want and got  # non-empty: docs 7/14/21/28/35 share shingles


# -------------------------------------------------- temperature resample


def test_temperature_resample_rates(spark, monkeypatch):
    # 16 en docs vs 4 de docs -> r_en = sqrt(4/16) = 0.5, r_de = 1.0
    rows = [("text en " + "x " * i, "en") for i in range(16)]
    rows += [("text de " + "y " * i, "de") for i in range(4)]
    monkeypatch.setattr(corpus, "load", lambda s, d, n: _docs(spark, rows))
    out = {r.lang: r for r in corpus.q_temperature_resample(spark, "i").collect()}
    assert out["de"].thresh == 1_000_000 and out["de"].n_kept == 4
    assert out["en"].thresh == 500_000
    assert 0 <= out["en"].n_kept <= 16
    assert out["en"].keep_rate == 0.5


# ----------------------------------------------------------- kmeans


def test_kmeans_refine_assignment_and_shift(spark, monkeypatch):
    dim = 8
    def vec(hot, val=1.0):
        v = [0.0] * dim
        v[hot] = val
        return v

    # seeds 0..7 = unit axes; extra vectors sit exactly on seed 3's axis
    rows = [(k, vec(k), 0) for k in range(8)]
    rows += [(100 + j, vec(3, 2.0), 0) for j in range(3)]
    emb = local_df(
        spark, rows, "vec_id bigint, embedding array<float>, label int"
    )
    monkeypatch.setattr(simsearch, "load", lambda s, d, n: emb)
    out = {r.k: r for r in simsearch.q_kmeans_refine(spark, "ignored").collect()}
    assert set(out) == set(range(8))
    assert out[3].n_members == 4  # seed + three satellites
    for k in (0, 1, 2, 4, 5, 6, 7):
        assert out[k].n_members == 1 and out[k].shift == 0.0
    # cluster 3 centroid moves from 1.0 to (1+2+2+2)/4 = 1.75 on its axis
    assert out[3].shift == pytest.approx(0.75, abs=1e-6)
    assert out[3].new_norm == pytest.approx(1.75, abs=1e-6)


def test_kmeans_equidistant_tie_breaks_to_lowest_k(spark, monkeypatch):
    # a vector equidistant from seeds 0 and 1 must join cluster 0
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 0),
        (100, [0.5, 0.5], 0),
    ]
    emb = local_df(spark, rows, "vec_id bigint, embedding array<float>, label int")
    monkeypatch.setattr(simsearch, "load", lambda s, d, n: emb)
    monkeypatch.setattr(simsearch, "_KM_K", 2)
    out = {r.k: r.n_members for r in simsearch.q_kmeans_refine(spark, "i").collect()}
    assert out == {0: 2, 1: 1}


# ----------------------------------------------------------- funnel


def test_funnel_strict_ordering(spark, monkeypatch):
    rows = [
        # user 1: full funnel in order
        (1, 0, 1, "view"), (2, 1, 1, "click"), (3, 2, 1, "purchase"),
        # user 2: purchase BEFORE click -> purchaser not counted
        (4, 0, 2, "view"), (5, 2, 2, "click"), (6, 1, 2, "purchase"),
        # user 3: click at the same minute as view -> strict > excludes
        (7, 0, 3, "view"), (8, 0, 3, "click"),
        # user 4: no view at all -> not in any cohort
        (9, 0, 4, "click"), (10, 1, 4, "purchase"),
    ]
    monkeypatch.setattr(relational, "load", lambda s, d, n: _events(spark, rows))
    out = relational.q_funnel_steps(spark, "ignored").collect()
    assert len(out) == 1
    r = out[0]
    assert r.cohort_date == dt.date(2025, 1, 1)
    assert (r.n_viewers, r.n_clickers, r.n_purchasers) == (3, 2, 1)


# ----------------------------------------------------- event transitions


def test_event_transitions_counts_and_shares(spark, monkeypatch):
    rows = [
        (1, 0, 1, "view"), (2, 1, 1, "click"), (3, 2, 1, "view"),
        (4, 3, 1, "click"),
        (5, 0, 2, "view"), (6, 1, 2, "purchase"),
    ]
    monkeypatch.setattr(relational, "load", lambda s, d, n: _events(spark, rows))
    out = {
        (r.prev_type, r.next_type): r
        for r in relational.q_event_transitions(spark, "ignored").collect()
    }
    assert out[("view", "click")].n_transitions == 2
    assert out[("view", "purchase")].n_transitions == 1
    assert out[("click", "view")].n_transitions == 1
    assert out[("view", "click")].p_next == pytest.approx(2 / 3)
    # per-prev shares sum to 1
    from collections import defaultdict

    sums = defaultdict(float)
    for (prev, _), r in out.items():
        sums[prev] += r.p_next
    assert all(abs(v - 1.0) < 1e-12 for v in sums.values())


def test_event_transitions_tie_on_ts_breaks_by_event_id(spark, monkeypatch):
    rows = [(2, 0, 1, "click"), (1, 0, 1, "view"), (3, 1, 1, "purchase")]
    monkeypatch.setattr(relational, "load", lambda s, d, n: _events(spark, rows))
    out = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in relational.q_event_transitions(spark, "ignored").collect()
    }
    # order is view(id1) -> click(id2) -> purchase(id3)
    assert out == {("view", "click"): 1, ("click", "purchase"): 1}


# ----------------------------------------------------------- z-order


def test_zorder_blocks_are_tiles_in_both_dims(spark):
    from dbt_economic_indicators_eu_spark.queries import storage

    out = storage.q_zorder_layout(spark, "/root/testdata/sf0.001").collect()
    assert out  # non-empty
    # a 256-z-value block is a 16x16 tile: BOTH spans bounded — the
    # whole point of z-order vs a 1-D sort (where the second dimension
    # would span up to 255)
    assert max(r.x_span for r in out) <= 15
    assert max(r.y_span for r in out) <= 15


def test_zorder_interleave_roundtrip():
    from dbt_economic_indicators_eu_spark.queries.storage import _interleave_sql

    # pure-python evaluation of the unrolled SQL on sample points
    def z(x, y):
        return eval(_interleave_sql(str(x), str(y)))

    assert z(0, 0) == 0
    assert z(255, 255) == 65535
    assert z(1, 0) == 1 and z(0, 1) == 2  # x even bits, y odd bits
    # Morton property: block index = interleave of (x//16, y//16)
    for x, y in [(3, 200), (130, 7), (99, 99)]:
        assert z(x, y) // 256 == z(x // 16, y // 16)


# ------------------------------------------------------ text_clean parity


def test_text_clean_adversarial_cross_engine(spark, tmp_path):
    import duckdb

    from dbt_economic_indicators_eu_spark.queries.corpus import (
        ORACLE_TEXT_CLEAN,
        q_text_clean,
    )

    rows = [
        "<p>hello <b>world</b></p>",
        "a\x00b\x01c\x1fd\x7fe",            # control chars
        "tabs\tand\nnewlines\r\nstay-as-whitespace",
        "unclosed <tag still here",          # no '>' -> not a tag
        "a  <br/>  b",
        "",
        "   ",
        None,
        "<<double>> <angle <nested> brackets>",
    ]
    data = [
        (i, t, "en", "s0", len(t) if t else 0) for i, t in enumerate(rows)
    ]
    df = local_df(
        spark, data, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    import dbt_economic_indicators_eu_spark.queries.corpus as corpus_mod

    got = (
        q_text_clean(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    want = con.execute(ORACLE_TEXT_CLEAN).df().sort_values("doc_id").reset_index(drop=True)
    for c in ("n_tags", "n_ctrl", "clean_len", "clean_md5"):
        assert list(got[c]) == list(want[c]), c
    # sanity on the semantics themselves
    assert got.loc[0, "n_tags"] == 4 and got.loc[3, "n_tags"] == 0
    assert got.loc[1, "n_ctrl"] == 4 and got.loc[1, "clean_len"] == len("abcde")


# ------------------------------------------------- embedding normalize


def test_embedding_normalize_units_and_zero_guard(spark, monkeypatch):
    rows = [
        (0, [3.0, 4.0], 0),     # norm 5
        (1, [0.0, 2.0], 0),     # norm 2
        (2, [0.0, 0.0], 0),     # zero vector -> cos is NULL
    ]
    emb = local_df(spark, rows, "vec_id bigint, embedding array<float>, label int")
    monkeypatch.setattr(simsearch, "load", lambda s, d, n: emb)
    out = {r.vec_id: r for r in simsearch.q_embedding_normalize(spark, "i").collect()}
    assert out[0].norm == 5.0 and out[1].norm == 2.0 and out[2].norm == 0.0
    assert out[2].cos_to_mean is None
    # mean vector is (1, 2); cos for vec_id 1 = 2*2 / (2 * sqrt(5))
    import math

    assert out[1].cos_to_mean == pytest.approx(4 / (2 * math.sqrt(5)), abs=1e-6)


def test_kmeans_labels_by_seed_vec_id_not_position(spark, monkeypatch):
    """vec_ids below _KM_K need not be contiguous from 0: cluster labels
    must be the seed VEC_IDs (what the oracle emits), not array
    positions."""
    rows = [
        (1, [1.0, 0.0], 0),
        (5, [0.0, 1.0], 0),
        (100, [0.0, 3.0], 0),  # nearest seed 5
    ]
    emb = local_df(spark, rows, "vec_id bigint, embedding array<float>, label int")
    monkeypatch.setattr(simsearch, "load", lambda s, d, n: emb)
    monkeypatch.setattr(simsearch, "_KM_K", 8)
    out = {r.k: r.n_members for r in simsearch.q_kmeans_refine(spark, "i").collect()}
    assert out == {1: 1, 5: 2}


def test_salted_join_total_over_negative_and_null_ids(spark, monkeypatch):
    """The salted join's contract is 'equal to the unsalted join': rows
    with negative (sign-preserving %) or NULL event_ids must still
    match the replicated dim."""
    import datetime as dt_

    rows = [
        (-1, dt_.datetime(2025, 1, 1), 1, "view", 1.0, "{}"),
        (None, dt_.datetime(2025, 1, 1), 2, "view", 2.0, "{}"),
        (7, dt_.datetime(2025, 1, 1), 3, "view", 4.0, "{}"),
    ]
    ev = local_df(
        spark,
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(relational, "load", lambda s, d, n: ev)
    out = relational.q_salted_join(spark, "ignored").collect()
    assert len(out) == 1
    assert out[0].n_events == 3 and out[0].total_value == 7.0


def test_knn_family_total_on_zero_norm_vectors(spark, monkeypatch):
    """Zero-norm embeddings make cosine undefined (0/0): the ANN
    queries must exclude them on BOTH engines rather than silently
    dropping NaN rows Spark-side while the oracle top-sorts NaN."""
    import numpy as np

    rng = np.random.RandomState(7)
    dim = simsearch._DIM  # the LSH hyperplanes are dim-bound
    rows = []
    for i in range(120):
        if i % 10 == 5:
            v = [0.0] * dim                    # zero-norm corpus vectors
        else:
            v = [float(x) for x in rng.randn(dim)]
        rows.append((i, v, 0))
    rows.append((150, [0.0] * dim, 0))         # zero-norm QUERY (150 % 50 == 0)
    emb = local_df(spark, rows, "vec_id bigint, embedding array<float>, label int")
    monkeypatch.setattr(simsearch, "load", lambda s, d, n: emb)
    for q in (simsearch.q_knn_brute, simsearch.q_knn_lsh, simsearch.q_knn_ivf):
        out = q(spark, "ignored").collect()
        ids = {r.q_id for r in out} | {r.neighbor_id for r in out}
        assert 150 not in ids and 5 not in ids, q.__name__
        for r in out:
            assert r.cosine == r.cosine, q.__name__  # no NaN emitted
    # quantized twin (score column is qcos, guard is in the batch closure)
    out = simsearch.q_knn_quantized(spark, "ignored").collect()
    ids = {r.q_id for r in out} | {r.neighbor_id for r in out}
    assert 150 not in ids and 5 not in ids
    for r in out:
        assert r.qcos == r.qcos
    # dedup: a zero-norm vector buckets to 0 in every LSH table, so it
    # pairs with every bucket-0 neighbor — the pair must DROP (NULL
    # cosine via try_divide), not crash the query under ANSI (0/0).
    out = simsearch.q_dedup_embedding(spark, "ignored").collect()
    zero_ids = {i for i in range(120) if i % 10 == 5} | {150}
    for r in out:
        assert r.id_a not in zero_ids and r.id_b not in zero_ids
        assert r.cosine == r.cosine
