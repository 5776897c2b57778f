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
