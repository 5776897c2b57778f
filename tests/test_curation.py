"""Semantics pins for the curation operators (queries/curation.py) on
hand-built corpora where the expected answer is computable by eye —
the cross-engine value check lives in the oracle gate; these tests pin
the SEMANTICS (partial-overlap contamination, redaction order, window
dedup keep-first) against adversarial inputs the synthetic corpus
doesn't contain."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dbt_economic_indicators_eu_spark.localdata import local_df
from dbt_economic_indicators_eu_spark.queries import curation


def _docs(spark, rows):
    return local_df(
        spark,
        [(i, t, lang, "src0", len(t) if t else 0) for i, (t, lang) in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def test_decontaminate_flags_partial_overlap(spark, monkeypatch, tmp_path):
    # doc 0 (37|0 -> benchmark) shares a 3-shingle with doc 1 but not 2
    rows = [
        ("alpha beta gamma delta", "en"),      # doc 0: benchmark
        ("x alpha beta gamma y", "en"),        # doc 1: contains 'alpha beta gamma'
        ("unrelated words entirely here", "en"),  # doc 2: clean
    ]
    docs = _docs(spark, rows)
    monkeypatch.setattr(curation, "load", lambda s, d, n: docs)
    out = {r["doc_id"]: r["n_shared_shingles"] for r in
           curation.q_decontaminate(spark, "ignored").collect()}
    assert out == {1: 1}  # doc 1 contaminated via exactly one shared shingle


def test_pii_redact_order_and_counts(spark, monkeypatch):
    text = "mail a@b.com or https://x.test/a@b.com ref 123456"
    docs = _docs(spark, [(text, "en")])
    monkeypatch.setattr(curation, "load", lambda s, d, n: docs)
    row = curation.q_pii_redact(spark, "ignored").collect()[0]
    # the email inside the URL is swallowed by the URL placeholder first
    assert row["n_urls"] == 1
    assert row["n_emails"] == 2  # pattern counts run on the RAW text
    assert row["n_long_numbers"] == 1
    assert row["redacted_len"] == len("mail <EMAIL> or <URL> ref <NUM>")


def test_corpus_curation_keep_first_among_quality(spark, monkeypatch):
    good = "one two three four five six seven eight"  # passes quality
    rows = [
        (good, "en"),        # doc 0: canonical (min doc_id of dup group)
        (good, "en"),        # doc 1: duplicate -> dropped
        ("tiny", "en"),      # doc 2: fails quality
    ]
    docs = _docs(spark, rows)
    monkeypatch.setattr(curation, "load", lambda s, d, n: docs)
    row = curation.q_corpus_curation(spark, "ignored").collect()[0]
    assert (row["n_raw"], row["n_quality_pass"], row["n_kept_final"]) == (3, 2, 1)


def test_training_shuffle_covers_all_docs(spark, monkeypatch):
    docs = _docs(spark, [(f"doc number {i}", "en") for i in range(40)])
    monkeypatch.setattr(curation, "load", lambda s, d, n: docs)
    out = curation.q_training_shuffle(spark, "ignored").collect()
    assert sum(r["n_docs"] for r in out) == 40
    assert all(0 <= r["shard"] < curation._N_SHARDS for r in out)


def test_repetition_stats_flags_degenerate_text(spark, monkeypatch):
    rows = [
        ("spam spam spam spam spam", "en"),           # 4 identical 2-grams
        ("all words here are different tokens", "en"),  # no dups
        ("", "en"),
    ]
    docs = _docs(spark, rows)
    monkeypatch.setattr(curation, "load", lambda s, d, n: docs)
    out = {r["doc_id"]: r for r in curation.q_repetition_stats(spark, "ignored").collect()}
    assert out[0]["n_2grams"] == 4 and out[0]["n_distinct_2grams"] == 1
    assert out[0]["dup_2gram_fraction"] == 0.75
    assert out[1]["dup_2gram_fraction"] == 0.0
    assert out[2]["n_2grams"] == 0 and out[2]["dup_2gram_fraction"] == 0.0


def test_wordlist_ratio_counts_duplicates(spark, monkeypatch):
    docs = _docs(spark, [("the key the KEY unknown", "en")])
    monkeypatch.setattr(curation, "load", lambda s, d, n: docs)
    r = curation.q_wordlist_ratio(spark, "ignored").collect()[0]
    # lowercased first: the, key, the, key hit; 'unknown' does not
    assert r["n_tokens"] == 5 and r["n_wordlist_hits"] == 4
    assert r["wordlist_ratio"] == 0.8


def test_source_mix_weights_inverse_property(spark, monkeypatch):
    rows = [(f"text {i}", "en") for i in range(30)]
    docs = local_df(
        spark,
        [(i, t, lang, f"src{i % 3}", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    monkeypatch.setattr(curation, "load", lambda s, d, n: docs)
    out = curation.q_source_mix_weights(spark, "ignored").collect()
    # uniform input -> every weight is exactly 1.0; shares sum to 1
    assert all(abs(r["sampling_weight"] - 1.0) < 1e-12 for r in out)
    assert abs(sum(r["actual_share"] for r in out) - 1.0) < 1e-12


def test_unigram_logprob_matches_hand_computation(spark, tmp_path):
    """3-doc corpus with a hand-checkable unigram model: counts a=3,
    b=2, c=1 (total 6). Each doc's nll must equal the sum of its
    tokens' -ln(tf/6) quantized to micro-nats; null text contributes no
    rows (tokenizes to [''], filtered)."""
    import math

    from dbt_economic_indicators_eu_spark.queries.curation import q_unigram_logprob

    rows = [(1, "a a b"), (2, "b c A"), (3, None)]
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/sf/documents.parquet")

    got = {r.doc_id: r for r in q_unigram_logprob(spark, str(tmp_path / "sf")).collect()}

    def micro(tf):
        return round(math.log(tf / 6) * 1_000_000)

    exp1 = -(2 * micro(3) + micro(2)) / 1e6   # "a a b" (a x2, b)
    exp2 = -(micro(2) + micro(1) + micro(3)) / 1e6  # "b c A" (lowercased a)
    assert set(got) == {1, 2}
    assert got[1].n_tokens == 3 and abs(got[1].nll - exp1) < 1e-12
    assert got[2].n_tokens == 3 and abs(got[2].nll - exp2) < 1e-12
    assert abs(got[1].avg_nll - exp1 / 3) < 1e-12


def test_chunk_documents_overlap_and_edges(spark, tmp_path):
    """Chunk geometry edge cases: shorter-than-window doc (1 chunk),
    exact stride multiple, overlap really contains the boundary bytes,
    null/empty text emits no chunks."""
    from dbt_economic_indicators_eu_spark.queries.datapipe import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
        q_chunk_documents,
    )

    long_text = "".join(chr(97 + (i % 26)) for i in range(380))  # 380 chars
    rows = [(1, "short doc"), (2, long_text), (3, "x" * 300), (4, None), (5, "")]
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/sf/documents.parquet")

    out = {}
    for r in q_chunk_documents(spark, str(tmp_path / "sf")).collect():
        out.setdefault(r.doc_id, []).append(r)

    assert len(out[1]) == 1 and out[1][0].chunk_len == 9
    # 380 chars, stride 150 -> chunks at 0/150/300
    c2 = sorted(out[2], key=lambda r: r.chunk_idx)
    assert [r.chunk_start for r in c2] == [0, 150, 300]
    assert [r.chunk_len for r in c2] == [_CHUNK_SIZE, _CHUNK_SIZE, 80]
    # overlap: chunk 1 starts inside chunk 0's span
    assert c2[1].chunk_start < c2[0].chunk_start + _CHUNK_SIZE
    import hashlib

    assert c2[1].chunk_md5 == hashlib.md5(long_text[150:350].encode()).hexdigest()
    # 300 = exact multiple of stride -> 2 chunks (300/150); the second
    # starts at 150 with 150 chars remaining
    assert [r.chunk_len for r in sorted(out[3], key=lambda r: r.chunk_idx)] == [200, 150]
    assert 4 not in out and 5 not in out
