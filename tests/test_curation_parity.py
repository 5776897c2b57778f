"""Cross-engine regex-dialect parity for the curation operators on
adversarial texts the synthetic corpus doesn't contain: emails inside
URLs, unicode, tabs/newlines, digit runs at token boundaries, null and
empty text. Runs the REAL queries and their REAL oracle SQL on the
same parquet and diffs outputs — the exact failure mode this guards is
Java-regex vs RE2 disagreeing on a metacharacter (the patterns are
deliberately restricted to the common subset; this pins it).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from dbt_economic_indicators_eu_spark.queries.curation import (
    ORACLE_CORPUS_CURATION,
    ORACLE_LENGTH_BUCKETS,
    ORACLE_PII_REDACT,
    q_corpus_curation,
    q_length_buckets,
    q_pii_redact,
)

ADVERSARIAL = [
    "contact john.doe+spam@sub.example.co.uk or visit https://a.b/c?d=e@f.gg now",
    "bare domain example.com is not an email but x@y.io is",
    "digits 123 1234 12345 end-1234 1234-start a1234b\t9999\n0000",
    # digit runs ADJACENT TO NON-ASCII letters: Java's \b is
    # Unicode-aware while RE2's is ASCII-only, so a \b-bounded number
    # pattern diverges exactly here (caught round 9 — the reason
    # _PAT_LONGNUM carries no \b); Unicode digits stay uncounted in
    # both engines (\d is ASCII in the common subset)
    "a1234b 1234 é1234é 9999 中9999文 ٣4567 é12345",
    "https://example.com/path#frag followed by text",
    "unicode éèê café 中文文本 with spaces",
    "UPPER@CASE.COM and MiXeD@CaSe.Org",
    "",
    "   ",
    None,
    "short",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 3,
    "dup dup dup dup dup dup dup dup dup dup dup dup dup dup dup dup dup",
    "dup dup dup dup dup dup dup dup dup dup dup dup dup dup dup dup dup",
]


def _corpus(spark, tmp_path):
    rows = [
        (i, t, ["en", "de"][i % 2], f"src{i % 3}", len(t) if t else 0)
        for i, t in enumerate(ADVERSARIAL)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    return sf_dir, con


def _diff(sdf: pd.DataFrame, odf: pd.DataFrame, keys):
    a = sdf.sort_values(keys).reset_index(drop=True)
    b = odf[a.columns].sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_pii_redact_dialect_parity(spark, tmp_path):
    sf_dir, con = _corpus(spark, tmp_path)
    sdf = q_pii_redact(spark, sf_dir).toPandas()
    odf = con.execute(ORACLE_PII_REDACT).fetchdf()
    # sanity: the adversarial corpus actually exercises every pattern
    assert sdf["n_emails"].fillna(0).sum() > 0
    assert sdf["n_urls"].fillna(0).sum() > 0
    assert sdf["n_long_numbers"].fillna(0).sum() > 0
    _diff(sdf, odf, ["doc_id"])


def test_length_buckets_dialect_parity(spark, tmp_path):
    sf_dir, con = _corpus(spark, tmp_path)
    sdf = q_length_buckets(spark, sf_dir).toPandas()
    odf = con.execute(ORACLE_LENGTH_BUCKETS).fetchdf()
    _diff(sdf, odf, ["bucket"])


def test_corpus_curation_dialect_parity(spark, tmp_path):
    sf_dir, con = _corpus(spark, tmp_path)
    sdf = q_corpus_curation(spark, sf_dir).toPandas()
    odf = con.execute(ORACLE_CORPUS_CURATION).fetchdf()
    # the duplicated quality doc must be deduped to one kept row
    _diff(sdf, odf, ["lang"])
