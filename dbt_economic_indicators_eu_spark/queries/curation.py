"""Corpus-curation operators — the end-to-end cleaning stages an LLM
training-data pipeline runs between raw crawl and tokenizer:
benchmark decontamination, PII detection/redaction, length bucketing,
deterministic global shuffle, and the composed curation filter.

Everything here is JVM-side Column expressions (no Python in the hot
path); the cross-engine hashing discipline follows datapipe.py (md5 of
strings — bit-identical in Spark and DuckDB, so oracles verify values,
not just shapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import MICRO, QueryDef, load, md5_bucket, md5_bucket_sql, widen_narrow_scan
from .datapipe import (
    _NON_WS_RE,
    _ORACLE_SHINGLES,
    ORACLE_WORDS_EXPR,
    _with_shingles,
    normalized_words,
)

# --------------------------------------------------------------------------
# q_decontaminate — EXT-DECONTAM: n-gram benchmark decontamination.
# A training corpus must not contain eval-benchmark text; membership is
# tested at the word-shingle level (exact-match dedup misses partial
# inclusions). Benchmark here = the deterministic doc_id % 37 == 0
# slice of `documents` (a stand-in for MMLU/GSM8K/... sets).
#
# Scale shape: benchmark shingle sets are bounded (eval suites are
# MBs, corpora are TBs) → the distinct benchmark-shingle table is
# broadcast; the corpus streams once through the shingle projection
# and a broadcast semi-ish join. No corpus shuffle at any scale.
# --------------------------------------------------------------------------


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Widened like its sibling q_bloom_decontaminate (guide §2.5:
    # repartition after an unsplittable read): shingling is the
    # regex-dense stage of BOTH branches, and without the widen it ran
    # inside the one-task scan stage — bench-set shingling single-core
    # inside the broadcast build job, corpus shingling single-core in
    # the main pass. BOTH branches come out widened: Catalyst pushes
    # the doc_id % 37 filters below the round-robin exchange, so the
    # committed after-plan shows two independent filtered-scan +
    # round-robin subtrees, one per branch (not one physically shared
    # scan). At cluster scale (files >= cores) widen_narrow_scan
    # inserts nothing. Measured at sf0.1 (noop, min-of-5, round-12
    # isolated harness under the bench conf — the round-opening FULL
    # bench that day drew 0.626 for this query; the isolated pair is
    # the like-for-like A/B): 0.713 -> 0.415 (corp-only widen 0.484);
    # plan diff in plans/r12/decontaminate_{before,after}.txt.
    docs = widen_narrow_scan(load(spark, sf_dir, "documents"))
    # Drop the '' shingle from the benchmark set: blank/null benchmark
    # docs shingle to [''] (the _with_shingles null convention), and an
    # empty-string "match" would flag every blank corpus doc as
    # contaminated — content-free overlap is not contamination.
    bench_sh = (
        _with_shingles(docs.filter(F.col("doc_id") % 37 == 0))
        .select(F.explode("shingles").alias("sg"))
        .filter(F.col("sg") != "")
        .distinct()
    )
    corp_sh = _with_shingles(docs.filter(F.col("doc_id") % 37 != 0)).select(
        "doc_id", F.explode("shingles").alias("sg")
    )
    return (
        corp_sh.join(F.broadcast(bench_sh), "sg")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


ORACLE_DECONTAMINATE = f"""
WITH shingled AS ({_ORACLE_SHINGLES}),
bench AS (
  SELECT DISTINCT sg FROM (
    SELECT unnest(shingles) AS sg FROM shingled WHERE doc_id % 37 = 0
  ) WHERE sg <> ''
),
corp AS (
  SELECT doc_id, unnest(shingles) AS sg FROM shingled WHERE doc_id % 37 <> 0
)
SELECT c.doc_id, count(*) AS n_shared_shingles
FROM corp c JOIN bench b ON b.sg = c.sg
GROUP BY c.doc_id
"""


# --------------------------------------------------------------------------
# q_pii_redact — EXT-PII-REDACT: PII detection + redaction counts.
# Patterns are the RE2/Java-regex common subset (no lookaround, no
# backrefs) so both engines compile them identically; Spark's
# regexp_replace is global by default, DuckDB needs the 'g' flag.
# Redaction order is pinned (URL, then EMAIL, then long digit runs) —
# emails inside URLs must be swallowed by the URL placeholder first.
# Pure projection: runs inside the scan stage at any scale.
# --------------------------------------------------------------------------

_PAT_URL = r"https?://[^ \t\n\x0b\f\r]+"
_PAT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# NO \b word boundary: it is OUTSIDE the RE2/Java common subset this
# module pins — Java's \b is Unicode-aware (é counts as a word char,
# so 'é1234é' has no boundary) while DuckDB/RE2's \b is ASCII-\w only
# (it sees one), silently diverging on exactly the multilingual text
# this pipeline targets (found round 9 by an adversarial-corpus gate
# run). RE2 has no lookaround to express an ASCII boundary either, so
# the pattern matches EVERY >=4-digit run, embedded or not — the more
# conservative redaction posture anyway (an account number doesn't
# stop being PII because a letter touches it).
_PAT_LONGNUM = r"\d{4,}"


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen_narrow_scan(load(spark, sf_dir, "documents"))
    text = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, _PAT_URL, "<URL>"), _PAT_EMAIL, "<EMAIL>"
        ),
        _PAT_LONGNUM,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(text, F.lit(_PAT_URL)).alias("n_urls"),
        F.regexp_count(text, F.lit(_PAT_EMAIL)).alias("n_emails"),
        F.regexp_count(text, F.lit(_PAT_LONGNUM)).alias("n_long_numbers"),
        F.length(redacted).alias("redacted_len"),
    )


ORACLE_PII_REDACT = rf"""
SELECT
  doc_id,
  CAST(len(regexp_extract_all(text, '{_PAT_URL}')) AS INTEGER) AS n_urls,
  CAST(len(regexp_extract_all(text, '{_PAT_EMAIL}')) AS INTEGER) AS n_emails,
  CAST(len(regexp_extract_all(text, '{_PAT_LONGNUM}')) AS INTEGER) AS n_long_numbers,
  CAST(length(
    regexp_replace(
      regexp_replace(
        regexp_replace(text, '{_PAT_URL}', '<URL>', 'g'),
        '{_PAT_EMAIL}', '<EMAIL>', 'g'),
      '{_PAT_LONGNUM}', '<NUM>', 'g')
  ) AS INTEGER) AS redacted_len
FROM documents
"""


# --------------------------------------------------------------------------
# q_length_buckets — EXT-LEN-BUCKET: power-of-two token-length
# bucketing, the batching/packing precursor (sequences are grouped into
# similar-length buckets so padding waste is bounded). Bucket id =
# bit-length of the token count — integer arithmetic via bin(), exact
# in both engines (floor(log2(n)) through floats can cross a boundary).
# One map-side-combinable groupBy on a small key space.
# --------------------------------------------------------------------------


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(_NON_WS_RE), 0))
    bucket = F.length(F.bin(n_tokens.cast("bigint")))
    return (
        docs.select(n_tokens.alias("n_tokens"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


ORACLE_LENGTH_BUCKETS = rf"""
WITH t AS (
  SELECT CAST(len(regexp_extract_all(text, '{_NON_WS_RE}')) AS INTEGER) AS n_tokens
  FROM documents
)
SELECT
  CAST(length(bin(CAST(n_tokens AS BIGINT))) AS INTEGER) AS bucket,
  count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  min(n_tokens) AS min_tokens,
  max(n_tokens) AS max_tokens
FROM t
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q_training_shuffle — EXT-SHUFFLE-DET: deterministic global shuffle
# into training shards. shard = md5(doc_id) bucket (content-independent,
# reproducible across runs/engines — no RNG state, the same discipline
# as q_hash_split); within-shard order = md5 hex order (unique — no
# tie column needed). At 100 TB this is repartition(shard) +
# sortWithinPartitions(order_key) writing one shard per file set; the
# query emits the per-shard manifest with an order-sensitive checksum
# (sum of rank*doc_id) that pins BOTH membership and sequence.
# --------------------------------------------------------------------------

_N_SHARDS = 8


def q_training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = (md5_bucket(F.col("doc_id")) % _N_SHARDS).alias("shard")
    w = Window.partitionBy("shard").orderBy("h")
    ranked = docs.select("doc_id", h.alias("h"), shard).withColumn(
        "rank", F.row_number().over(w)
    )
    # checksum accumulates in DECIMAL(38,0): sum(rank*doc_id) over a
    # shard is ~2*m^3 for m docs/shard — BIGINT overflows at only
    # ~13M dense doc_ids (Spark ANSI sum aborts, DuckDB HUGEINT→BIGINT
    # cast throws), far below the stated scale posture; decimal(38,0)
    # is exact to ~1e38 (~1e12 docs) in BOTH engines. The product is
    # cast BEFORE multiplying so the multiply itself cannot overflow.
    # ... and is EMITTED AS A STRING: a checksum is an identifier, and
    # the decimal→pandas conversion differs between engines (Decimal
    # objects vs float64 — the float path would round past 2^53,
    # re-losing the exactness decimal bought)
    term = F.col("rank").cast("decimal(38,0)") * F.col("doc_id").cast("decimal(38,0)")
    return ranked.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(term).cast("decimal(38,0)").cast("string").alias("order_checksum"),
    )


ORACLE_TRAINING_SHUFFLE = f"""
WITH ranked AS (
  SELECT
    doc_id,
    {md5_bucket_sql('doc_id')}
      % {_N_SHARDS} AS shard,
    row_number() OVER (
      PARTITION BY {md5_bucket_sql('doc_id')}
        % {_N_SHARDS}
      ORDER BY md5(CAST(doc_id AS VARCHAR))
    ) AS rank
  FROM documents
)
SELECT shard, count(*) AS n_docs,
       -- DECIMAL(38,0) accumulation, STRING emission, like the Spark
       -- side: exact far past BIGINT's ~13M-dense-doc overflow point
       CAST(CAST(sum(CAST(rank AS DECIMAL(38,0)) * CAST(doc_id AS DECIMAL(38,0)))
            AS DECIMAL(38,0)) AS VARCHAR) AS order_checksum
FROM ranked
GROUP BY shard
"""


# --------------------------------------------------------------------------
# q_corpus_curation — EXT-CURATE-E2E: the composed curation funnel
# (quality filter → exact dedup keep-first → per-language report), i.e.
# the end-to-end shape of a pretraining data build. Canonical-row
# selection is a window min over the content hash restricted to
# quality-passing rows — one window + one groupBy, no self-join.
# --------------------------------------------------------------------------


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(_NON_WS_RE), 0))
    n_chars = F.length("text")
    quality = (n_tokens >= 5) & (n_chars >= 20)
    w = Window.partitionBy("content_hash")
    flagged = docs.select(
        "doc_id", "lang", quality.alias("q"), F.md5(F.col("text")).alias("content_hash"),
    ).withColumn("canon_id", F.min(F.when(F.col("q"), F.col("doc_id"))).over(w))
    final = F.col("q") & (F.col("canon_id") == F.col("doc_id"))
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count(F.when(F.col("q"), 1)).alias("n_quality_pass"),
        F.count(F.when(final, 1)).alias("n_kept_final"),
    )


ORACLE_CORPUS_CURATION = rf"""
WITH flagged AS (
  SELECT
    doc_id, lang,
    (len(regexp_extract_all(text, '{_NON_WS_RE}')) >= 5 AND length(text) >= 20) AS q,
    min(CASE WHEN (len(regexp_extract_all(text, '{_NON_WS_RE}')) >= 5 AND length(text) >= 20)
             THEN doc_id END)
      OVER (PARTITION BY md5(text)) AS canon_id
  FROM documents
)
SELECT lang,
       count(*) AS n_raw,
       count(CASE WHEN q THEN 1 END) AS n_quality_pass,
       count(CASE WHEN q AND canon_id = doc_id THEN 1 END) AS n_kept_final
FROM flagged
GROUP BY lang
"""


# --------------------------------------------------------------------------
# q_repetition_stats — EXT-TEXT-REPETITION: duplicate word-2-gram
# fraction per document (the Gopher-style repetition quality filter —
# boilerplate and degenerate generations have high duplicate-n-gram
# mass). Pure JVM array expressions; the fraction is a ratio of exact
# integers so both engines emit the identical double.
# --------------------------------------------------------------------------


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen_narrow_scan(load(spark, sf_dir, "documents"))
    words = normalized_words()
    # The size >= 2 guard is load-bearing: Spark's sequence(1, 0) is a
    # DESCENDING [1, 0], so an unguarded transform would index past a
    # single-word array (ANSI OOB error).
    grams = F.expr(
        "CASE WHEN size(_words) >= 2 THEN"
        " transform(sequence(1, size(_words) - 1),"
        "           i -> concat_ws(' ', _words[i - 1], _words[i]))"
        " ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    staged = docs.select("doc_id", words.alias("_words")).select(
        "doc_id", grams.alias("_grams")
    )
    n = F.size("_grams")
    n_distinct = F.size(F.array_distinct("_grams"))
    return staged.select(
        "doc_id",
        n.alias("n_2grams"),
        n_distinct.alias("n_distinct_2grams"),
        F.when(n > 0, (n - n_distinct).cast("double") / n).otherwise(0.0).alias(
            "dup_2gram_fraction"
        ),
    )


ORACLE_REPETITION_STATS = rf"""
WITH g AS (
  SELECT doc_id,
         [words[i] || ' ' || words[i+1] for i in range(1, len(words))] AS grams
  FROM (
    SELECT doc_id, {ORACLE_WORDS_EXPR} AS words
    FROM documents
  )
)
SELECT
  doc_id,
  CAST(len(grams) AS INTEGER) AS n_2grams,
  CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct_2grams,
  CASE WHEN len(grams) > 0
       THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
       ELSE 0.0 END AS dup_2gram_fraction
FROM g
"""


# --------------------------------------------------------------------------
# q_wordlist_ratio — EXT-TEXT-WORDLIST: fraction of tokens hitting a
# broadcast wordlist (the C4-style wordlist filter shape: stopword
# floors for language quality, blocklist ceilings for unwanted
# content).
# --------------------------------------------------------------------------

_WORDLIST = ("the", "a", "of", "key", "value", "table", "row")


def q_wordlist_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-local form, kept DELIBERATELY after measuring the
    alternative: the relational rewrite (explode + broadcast word-table
    join + groupBy, the shape q_lang_id briefly carried) was built and
    measured at sf0.1 with the scan widening held constant — noop-sink
    min 1.06-1.14 s vs 0.23-0.44 s for this form. One interpreted
    ``filter`` pass over an in-place array beats materializing a row
    per token through a join + hash aggregate when the word list is a
    single constant-folded literal; the relational form only wins when
    per-term array rescans grow with the vocabulary (q_tfidf_topk's
    case — see the measurement note there). This is also the better
    100 TB plan: a pure projection, zero exchanges.
    """
    docs = widen_narrow_scan(load(spark, sf_dir, "documents"))
    words = normalized_words()
    lst = ", ".join(f"'{w}'" for w in _WORDLIST)
    staged = docs.select("doc_id", "lang", words.alias("_words"))
    n = F.size("_words")
    hits = F.size(F.expr(f"filter(_words, w -> array_contains(array({lst}), w))"))
    return staged.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        hits.alias("n_wordlist_hits"),
        F.when(n > 0, hits.cast("double") / n).otherwise(0.0).alias("wordlist_ratio"),
    )


ORACLE_WORDLIST_RATIO = rf"""
WITH w AS (
  SELECT doc_id, lang, {ORACLE_WORDS_EXPR} AS words
  FROM documents
)
SELECT
  doc_id,
  lang,
  CAST(len(words) AS INTEGER) AS n_tokens,
  CAST(len(list_filter(words, w -> list_contains([{", ".join(f"'{w}'" for w in _WORDLIST)}], w)))
       AS INTEGER) AS n_wordlist_hits,
  CASE WHEN len(words) > 0
       THEN CAST(len(list_filter(words, w -> list_contains([{", ".join(f"'{w}'" for w in _WORDLIST)}], w)))
            AS DOUBLE) / len(words)
       ELSE 0.0 END AS wordlist_ratio
FROM w
"""


# --------------------------------------------------------------------------
# q_source_mix_weights — EXT-MIX-WEIGHTS: static domain-mixing weights
# (the data-mixture step of a pretraining build: given a target share
# per source, emit the per-source sampling weight that achieves it).
# One tiny groupBy; the weight table is the broadcast side of the
# downstream weighted sampler at any scale.
# --------------------------------------------------------------------------


def q_source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("__t"))
    n_sources = counts.agg(F.count(F.lit(1)).alias("__k"))
    return (
        counts.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(n_sources))
        .select(
            "source",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("__t")).alias("actual_share"),
            (
                (F.lit(1.0) / F.col("__k"))
                / (F.col("n_docs").cast("double") / F.col("__t"))
            ).alias("sampling_weight"),
        )
    )


ORACLE_SOURCE_MIX_WEIGHTS = """
WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total, count(*) AS k FROM c)
SELECT
  c.source,
  c.n_docs,
  CAST(c.n_docs AS DOUBLE) / t.total AS actual_share,
  (1.0 / t.k) / (CAST(c.n_docs AS DOUBLE) / t.total) AS sampling_weight
FROM c, t
"""


# --------------------------------------------------------------------------
# q_unigram_logprob — EXT-QUALITY-LM: language-model quality scoring
# (the CCNet-style perplexity filter, with the corpus itself as the
# LM): train a unigram model on the corpus (token → count, one
# shuffle), score each document by its total/average negative log
# likelihood. Gibberish and boilerplate score far from the corpus
# median; the score feeds the curation funnel as a quality signal.
#
# Scale shape: token stream ⨝ vocabulary is a plain shuffle join on
# the token key (the vocabulary of a TB corpus is GBs — NEVER
# broadcast); per-doc reduction is one more key shuffle. No collect,
# no Python, three total exchanges.
#
# Float discipline (cross-engine): ln() differs between the JVM and
# libm in the last ulp (measured ~4% of inputs), so summing raw
# doubles can never hash-match. Each term is therefore quantized to
# integer MICRO-NATS (round(ln p * 1e6) as BIGINT) — agreement is then
# exact unless a true log sits within ~1e-10 of a rounding boundary —
# and the per-document sum is INTEGER arithmetic: exact, associative,
# order-independent, shuffle-friendly. The final unit conversions are
# IEEE ops on identical values, emitted raw.
# --------------------------------------------------------------------------

_MICRO = MICRO  # shared scale — see queries/common.py


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen_narrow_scan(load(spark, sf_dir, "documents"))
    # Everything derives from the (doc, tok) PARTIAL-AGGREGATED table:
    # token instances collapse map-side to per-doc counts before the
    # one exchange, and that identical subtree feeds the corpus tf
    # aggregate, the corpus total, AND the join — physical planning's
    # ReuseExchange dedupes the three occurrences, so the corpus
    # tokenizes ONCE per execution, engine-native (no localCheckpoint,
    # which would spill the instance stream to local disk at 100 TB
    # and leak warm-cache reads into later actions of a cached plan).
    # Corpus-wide term frequency is groupBy(tok) + join back — NOT a
    # count().over(Window.partitionBy(tok)): under Zipf a stop-word's
    # instances all land in ONE window partition (an O(corpus) task at
    # 100×; same fix as q_tfidf_topk). Per-doc sums weight each
    # (doc, tok) row by its count — identical to the instance-level
    # sum, with far fewer rows in flight. No broadcast hint on the tf
    # side — AQE broadcasts it when it fits, else skew-splits.
    toks = docs.select(
        "doc_id", F.explode(normalized_words()).alias("tok")
    ).filter(F.length("tok") > 0)
    tf_doc = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    tf_tab = tf_doc.groupBy("tok").agg(F.sum("cnt").alias("tf"))
    total = tf_doc.agg(F.sum("cnt").alias("n_total"))
    term_micro = F.round(
        F.log(F.col("tf").cast("double") / F.col("n_total").cast("double")) * _MICRO
    ).cast("long")
    scored = (
        tf_doc.join(tf_tab, "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "cnt", term_micro.alias("ti"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("ti")).alias("s"),
        )
    )
    nll = -F.col("s").cast("double") / _MICRO
    return scored.select(
        "doc_id",
        "n_tokens",
        nll.alias("nll"),
        (nll / F.col("n_tokens")).alias("avg_nll"),
    )


ORACLE_UNIGRAM_LOGPROB = f"""
WITH toks AS (
  SELECT doc_id, unnest({ORACLE_WORDS_EXPR}) AS tok FROM documents
),
t2 AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
tf AS (SELECT tok, count(*) AS tf FROM t2 GROUP BY tok),
tot AS (SELECT sum(tf) AS n_total FROM tf),
terms AS (
  SELECT doc_id,
         CAST(round(ln(CAST(tf.tf AS DOUBLE) / CAST(tot.n_total AS DOUBLE)) * {_MICRO})
              AS BIGINT) AS ti
  FROM t2 JOIN tf USING (tok), tot
)
SELECT doc_id,
       count(*) AS n_tokens,
       -CAST(sum(ti) AS DOUBLE) / {_MICRO} AS nll,
       (-CAST(sum(ti) AS DOUBLE) / {_MICRO}) / count(*) AS avg_nll
FROM terms
GROUP BY doc_id
"""


QUERIES = [
    QueryDef("decontaminate", q_decontaminate, ORACLE_DECONTAMINATE, ("EXT-DECONTAM",)),
    QueryDef(
        "unigram_logprob",
        q_unigram_logprob,
        ORACLE_UNIGRAM_LOGPROB,
        ("EXT-QUALITY-LM",),
    ),
    QueryDef("pii_redact", q_pii_redact, ORACLE_PII_REDACT, ("EXT-PII-REDACT",)),
    QueryDef(
        "length_buckets", q_length_buckets, ORACLE_LENGTH_BUCKETS, ("EXT-LEN-BUCKET",)
    ),
    QueryDef(
        "training_shuffle",
        q_training_shuffle,
        ORACLE_TRAINING_SHUFFLE,
        ("EXT-SHUFFLE-DET",),
    ),
    QueryDef(
        "corpus_curation",
        q_corpus_curation,
        ORACLE_CORPUS_CURATION,
        ("EXT-CURATE-E2E",),
    ),
    QueryDef(
        "repetition_stats",
        q_repetition_stats,
        ORACLE_REPETITION_STATS,
        ("EXT-TEXT-REPETITION",),
    ),
    QueryDef(
        "wordlist_ratio", q_wordlist_ratio, ORACLE_WORDLIST_RATIO, ("EXT-TEXT-WORDLIST",)
    ),
    QueryDef(
        "source_mix_weights",
        q_source_mix_weights,
        ORACLE_SOURCE_MIX_WEIGHTS,
        ("EXT-MIX-WEIGHTS",),
    ),
]
