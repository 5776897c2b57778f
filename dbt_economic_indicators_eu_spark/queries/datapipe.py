"""Large-scale training-data pipeline operators (driver north star):
deduplication, text analysis, similarity search over ``documents`` /
``embeddings``.

Cross-engine determinism strategy: wherever an operator needs hashing
(minhash seeds, fingerprints, simhash bit vectors) we build it from
``md5`` of strings — md5 is bit-identical in Spark and DuckDB, so the
oracle can verify the *exact* hash outputs, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import QueryDef, load, r4

# --------------------------------------------------------------------------
# q_text_stats — EXT-TEXT-QUALITY: token count, char-class ratios — the
# standard quality-scoring features of a pretraining corpus pipeline.
# All JVM-side (regexp builtins), no UDFs.
# --------------------------------------------------------------------------


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tokens = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
    n_tokens = F.size(tokens)
    n_chars = F.length("text")
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", ""))
    n_digits = F.length(F.regexp_replace(F.col("text"), r"[^0-9]", ""))
    n_spaces = F.length(F.regexp_replace(F.col("text"), r"[^ ]", ""))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.when(n_tokens > 0, (n_chars - n_spaces).cast("double") / n_tokens).alias(
            "avg_token_len"
        ),
        F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0).alias("punct_ratio"),
        F.when(n_chars > 0, n_digits.cast("double") / n_chars).otherwise(0.0).alias("digit_ratio"),
        ((n_tokens >= 5) & (n_chars >= 20)).alias("passes_min_length"),
    )


ORACLE_TEXT_STATS = r"""
SELECT
  doc_id,
  lang,
  source,
  length(text) AS n_chars,
  len(regexp_extract_all(text, '\S+')) AS n_tokens,
  CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
        THEN CAST(length(text) - length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
             / len(regexp_extract_all(text, '\S+')) END AS avg_token_len,
  CASE WHEN length(text) > 0
        THEN CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text)
        ELSE 0.0 END AS punct_ratio,
  CASE WHEN length(text) > 0
        THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text)
        ELSE 0.0 END AS digit_ratio,
  (len(regexp_extract_all(text, '\S+')) >= 5 AND length(text) >= 20) AS passes_min_length
FROM documents
"""


# --------------------------------------------------------------------------
# q_dedup_exact — EXT-DEDUP-EXACT: exact duplicate grouping by content
# hash; canonical id = min(doc_id). At 100 TB this is one shuffle on a
# 128-bit hash (uniformly distributed → no skew).
# --------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.col("doc_id"), F.md5(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


ORACLE_DEDUP_EXACT = """
SELECT
  md5(text) AS content_hash,
  min(doc_id) AS canonical_doc_id,
  count(*) AS n_copies
FROM documents
GROUP BY 1
HAVING count(*) > 1
"""


# --------------------------------------------------------------------------
# q_fingerprint — EXT-TEXT-FINGERPRINT: document fingerprint = min md5 over
# word 3-shingles (a 1-permutation minhash; also the building block of
# q_dedup_minhash).
# --------------------------------------------------------------------------


def _shingle_expr(k: int = 3):
    """Word k-shingles as an array<string> column, JVM-side only."""
    words = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - k, F.lit(0)))
    return F.when(
        F.size(words) >= k,
        F.array_distinct(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(k)]
                ),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


_ORACLE_SHINGLES = """
  SELECT
    doc_id,
    CASE WHEN len(words) >= 3 THEN
      list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                     for i in range(1, len(words) - 1)])
    ELSE [array_to_string(words, ' ')] END AS shingles
  FROM (
    SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS words
    FROM documents
  )
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    shingles = docs.select("doc_id", _shingle_expr().alias("shingles"))
    return shingles.select(
        "doc_id",
        F.array_min(F.transform(F.col("shingles"), lambda s: F.md5(s))).alias("fingerprint"),
        F.size("shingles").alias("n_shingles"),
    )


ORACLE_FINGERPRINT = f"""
WITH shingled AS ({_ORACLE_SHINGLES})
SELECT
  doc_id,
  list_min([md5(s) for s in shingles]) AS fingerprint,
  len(shingles) AS n_shingles
FROM shingled
"""


QUERIES = [
    QueryDef("text_stats", q_text_stats, ORACLE_TEXT_STATS, ("EXT-TEXT-QUALITY",)),
    QueryDef("dedup_exact", q_dedup_exact, ORACLE_DEDUP_EXACT, ("EXT-DEDUP-EXACT",)),
    QueryDef("fingerprint", q_fingerprint, ORACLE_FINGERPRINT, ("EXT-TEXT-FINGERPRINT",)),
]
