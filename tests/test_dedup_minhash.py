"""Behavioral tests for the MinHash-LSH near-dup pipeline
(queries/datapipe.py:q_dedup_minhash) on a crafted corpus with known
duplicates — the synthetic documents table is random text, so its
verified output is usually tiny; these tests pin recall/precision
behavior the oracle comparison alone can't distinguish from "always
empty".

Also pins the single-scan verify shape: candidate pairs are exploded
into members, joined once against the shingle table, and regrouped —
a doc appearing in MANY pairs must still line up the right shingle
set on each pair (regression for the pair-explode + first(when(...))
regroup).
"""

from __future__ import annotations

import pytest

from dbt_economic_indicators_eu_spark.queries.datapipe import q_dedup_minhash

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles watch from a mossy log near the river bend and "
    "the afternoon sun warms the quiet meadow beyond the old mill"
)


def _write_docs(spark, tmp_path, docs):
    rows = [(i, text, "en", "test") for i, text in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string")
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_exact_copies_found_with_jaccard_1(spark, tmp_path):
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            BASE,
            BASE,  # exact copy of 0
            "completely different text about database engines and "
            "distributed query planning with columnar storage layouts "
            "and vectorized execution kernels for analytic workloads",
        ],
    )
    rows = q_dedup_minhash(spark, sf_dir).collect()
    pairs = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"] for r in rows}
    assert (0, 1) in pairs
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert all(2 not in p for p in pairs)


def test_near_duplicate_above_threshold(spark, tmp_path):
    # one word changed in a long doc → shingle Jaccard just below 1,
    # above the 0.8 threshold
    near = BASE.replace("seventeen", "nineteen")
    sf_dir = _write_docs(spark, tmp_path, [BASE, near])
    rows = q_dedup_minhash(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id_a"], r["doc_id_b"]) == (0, 1)
    assert 0.8 <= r["jaccard"] < 1.0


def test_low_similarity_pair_is_filtered(spark, tmp_path):
    # share a few shingles but well under the 0.8 threshold: the LSH
    # stage may or may not emit the candidate, the verify must drop it
    half_different = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "silver falcons circle above a rocky cliff near the canyon rim "
        "and the evening wind cools the dusty plateau beyond the ridge"
    )
    sf_dir = _write_docs(spark, tmp_path, [BASE, half_different])
    rows = q_dedup_minhash(spark, sf_dir).collect()
    assert rows == []


def test_doc_in_many_pairs_gets_correct_shingles(spark, tmp_path):
    # doc 0 duplicated three times: every pair among {0,1,2,3} must
    # verify at jaccard 1.0 — regression for the regroup lining up the
    # wrong side's shingle set when one doc occurs in many pairs
    sf_dir = _write_docs(spark, tmp_path, [BASE, BASE, BASE, BASE])
    rows = q_dedup_minhash(spark, sf_dir).collect()
    pairs = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"] for r in rows}
    expected = {(a, b) for a in range(4) for b in range(a + 1, 4)}
    assert set(pairs) == expected
    assert all(j == pytest.approx(1.0) for j in pairs.values())


def test_cluster_merges_chain_via_transitivity(spark, tmp_path):
    # sliding windows over one word sequence: A~B and B~C clear the 0.8
    # Jaccard bar, A~C (0.667) does not — yet all three must land in ONE
    # component with the min doc_id as canonical
    from dbt_economic_indicators_eu_spark.queries.datapipe import q_dedup_cluster

    words = [f"w{i:03d}" for i in range(122)]
    docs = [
        " ".join(words[0:102]),    # shingles 0..99
        " ".join(words[10:112]),   # shingles 10..109  (J(A,B)=90/110≈0.82)
        " ".join(words[20:122]),   # shingles 20..119  (J(A,C)=80/120≈0.67)
    ]
    sf_dir = _write_docs(spark, tmp_path, docs)
    rows = q_dedup_cluster(spark, sf_dir).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert set(by_id) == {0, 1, 2}
    assert {r["component_id"] for r in rows} == {0}
    assert all(r["component_size"] == 3 for r in rows)
    assert [r["is_canonical"] for r in sorted(rows, key=lambda r: r["doc_id"])] == [
        True, False, False,
    ]
