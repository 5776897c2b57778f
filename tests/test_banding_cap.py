"""Hot-bucket cap in the banded group-then-pair helper
(operators/banding.py:candidate_pairs).

Pair count is quadratic per bucket, so one degenerate bucket (an
all-identical corpus, an adversarial upload) can dominate a 100 TB
job. The cap must (a) drop only the over-cap buckets, (b) report the
drop through the attached Observation (no silent truncation), and
(c) never fire at the correctness scales — the default cap (1024) is
far above the largest real bucket (~30 members at sf0.1).
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from dbt_economic_indicators_eu_spark.operators.banding import (
    HOT_BUCKET_CAP,
    candidate_pairs,
)


def _banded(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, band_idx int, band_hash string")


def test_adversarial_hot_bucket_dropped_and_counted(spark):
    # 50 identical docs → one 50-member bucket (1225 pairs) plus a sane
    # 2-member bucket; cap=10 must drop only the hot bucket
    rows = [(i, 0, "hot") for i in range(50)] + [(100, 1, "ok"), (101, 1, "ok")]
    obs = Observation()
    out = candidate_pairs(
        _banded(spark, rows), ["band_idx", "band_hash"], "doc_id",
        "doc_id_a", "doc_id_b", cap=10, observation=obs,
    ).collect()
    assert {(r["doc_id_a"], r["doc_id_b"]) for r in out} == {(100, 101)}
    assert obs.get == {"hot_buckets_dropped": 1, "hot_ids_dropped": 50}


def test_bucket_at_cap_boundary_survives(spark):
    # exactly-cap bucket is NOT hot: 3 members at cap=3 → all 3 pairs
    rows = [(i, 0, "b") for i in range(3)]
    obs = Observation()
    out = candidate_pairs(
        _banded(spark, rows), ["band_idx", "band_hash"], "doc_id",
        "doc_id_a", "doc_id_b", cap=3, observation=obs,
    ).collect()
    assert {(r["doc_id_a"], r["doc_id_b"]) for r in out} == {(0, 1), (0, 2), (1, 2)}
    assert obs.get == {"hot_buckets_dropped": 0, "hot_ids_dropped": 0}


def test_pairs_dedupe_across_buckets(spark):
    # same pair surfacing in two bands emits once (the .distinct())
    rows = [(0, 0, "x"), (1, 0, "x"), (0, 1, "y"), (1, 1, "y")]
    out = candidate_pairs(
        _banded(spark, rows), ["band_idx", "band_hash"], "doc_id",
        "doc_id_a", "doc_id_b",
    ).collect()
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in out] == [(0, 1)]


def test_default_cap_headroom_vs_gate_scales(spark):
    # the gate's largest observed bucket is ~30 members (sf0.1
    # embeddings); keep 30x headroom so driver reruns can't trip it
    assert HOT_BUCKET_CAP >= 1024


def test_all_identical_corpus_end_to_end(spark, tmp_path):
    # adversarial corpus through the REAL minhash query: 12 identical
    # docs form one 12-member bucket per band — under the default cap,
    # so all 66 pairs verify at jaccard 1.0 (the cap only bites past
    # 1024 members; behavior pinned above with a small cap)
    from dbt_economic_indicators_eu_spark.queries.datapipe import q_dedup_minhash

    text = " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame(
        [(i, text, "en", "t") for i in range(12)],
        "doc_id bigint, text string, lang string, source string",
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    rows = q_dedup_minhash(spark, sf_dir).collect()
    assert len(rows) == 66
    assert all(r["jaccard"] == 1.0 for r in rows)


def test_cap_is_mirrored_in_oracle_sql(spark, tmp_path):
    """When the cap fires, BOTH engines must drop the hot bucket: an
    all-identical corpus of HOT_BUCKET_CAP+1 docs collapses every band
    into one over-cap bucket, so q_dedup_minhash and its DuckDB oracle
    must both emit zero pairs (before the oracle mirrored the cap it
    would have emitted all ~500k of them)."""
    import duckdb

    from dbt_economic_indicators_eu_spark.queries.datapipe import (
        ORACLE_DEDUP_MINHASH,
        q_dedup_minhash,
    )

    n = HOT_BUCKET_CAP + 1
    text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(i, text, "en", "t", len(text)) for i in range(n)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    assert q_dedup_minhash(spark, sf_dir).count() == 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    assert con.execute(f"SELECT count(*) FROM ({ORACLE_DEDUP_MINHASH})").fetchone()[0] == 0


def test_cap_drops_same_pairs_in_both_engines(spark, tmp_path):
    """Recall contract of the cap (VERDICT r3 #6): when the cap fires
    on SOME buckets, the pairs that survive must be the SAME pairs in
    Spark and in the oracle — not merely the same bucket-level count.
    Corpus: a 1025-member identical group (every band over-cap in both
    engines → zero pairs from it) interleaved with a 40-member
    identical group of different text (under cap → all 780 pairs). Any
    off-by-one between candidate_pairs' `size(ids) > cap` and the
    oracle's `bucket_n <= cap` flips the hot group from 0 to ~524k
    pairs on one side only; any id leakage between groups shows up as
    pair-set inequality."""
    import duckdb

    from dbt_economic_indicators_eu_spark.queries.datapipe import (
        ORACLE_DEDUP_MINHASH,
        q_dedup_minhash,
    )

    hot_text = "alpha beta gamma delta epsilon zeta"
    ok_text = "one two three four five six seven"
    rows = [(i, hot_text, "en", "t") for i in range(HOT_BUCKET_CAP + 1)]
    rows += [(10_000 + i, ok_text, "en", "t") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string")
    sf_dir = str(tmp_path / "sf")
    # interleave groups across files so bucket members span partitions
    df.repartition(8).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    spark_pairs = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in q_dedup_minhash(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    oracle_pairs = {
        (a, b)
        for a, b in con.execute(
            f"SELECT doc_id_a, doc_id_b FROM ({ORACLE_DEDUP_MINHASH})"
        ).fetchall()
    }
    expected = {
        (10_000 + i, 10_000 + j) for i in range(40) for j in range(i + 1, 40)
    }
    assert spark_pairs == expected
    assert oracle_pairs == expected


def test_bucket_exactly_at_cap_survives_in_both_engines(spark, tmp_path):
    """Other edge of the off-by-one: a bucket of EXACTLY cap members is
    not hot — both engines must emit its full cap*(cap-1)/2 pair set.
    (An engine dropping at `>= cap` instead of `> cap` zeroes one side;
    counts are compared, not sets — 523,776 rows would be wasteful to
    ship to Python and a 0-vs-full divergence is unmistakable.)"""
    import duckdb

    from dbt_economic_indicators_eu_spark.queries.datapipe import (
        ORACLE_DEDUP_MINHASH,
        q_dedup_minhash,
    )

    n = HOT_BUCKET_CAP
    text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(i, text, "en", "t") for i in range(n)],
        "doc_id bigint, text string, lang string, source string",
    )
    sf_dir = str(tmp_path / "sf")
    df.repartition(4).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    expected = n * (n - 1) // 2

    assert q_dedup_minhash(spark, sf_dir).count() == expected

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    assert (
        con.execute(f"SELECT count(*) FROM ({ORACLE_DEDUP_MINHASH})").fetchone()[0]
        == expected
    )
