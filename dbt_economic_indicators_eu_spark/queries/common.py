"""Shared plumbing for the operator demo queries.

Float-parity discipline (SURVEY.md §4), learned the hard way:

1. Aggregates whose float result depends on accumulation order
   (sum/avg/stddev/percentile over doubles) get rounded in BOTH
   engines — at a digit position where the *true* value cannot
   terminate (else the two engines' different rounding modes — Spark
   HALF_UP on the decimal repr vs DuckDB scale-multiply — diverge on
   exact ``.xx5`` values). Sums of 2-decimal data are safe at r2
   (true value terminates at 2 → digit 3 is 0); stddev/slope are
   irrational → any digit is safe; percentile interpolations of
   2-decimal data terminate ≤5 digits → r6 is safe.
2. AVG is never rounded directly: ``round(sum, 2) / count`` is exact
   and order-independent; a rounded avg hits the .5 boundary whenever
   count divides the decimal cleanly.
3. Everything *derived from normalized inputs* (ratios, lags, diffs,
   shares, CASE arithmetic) is emitted RAW — IEEE ops on identical
   doubles are bit-identical across engines, while re-rounding them
   reintroduces the boundary problem.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# (applicationId, session identity, sf_dir, table) → analyzed scan
# DataFrame. A DataFrame
# is an immutable logical plan, so reusing it across queries is safe;
# without the cache every query re-lists the path and re-reads parquet
# footers during analysis (~20-50ms × 67 queries × 1-3 tables — the
# single-node analogue of having no metastore). Keyed by applicationId
# so a new session never sees another session's plans; the id(spark)
# term keeps SparkSession.newSession() siblings apart too (same appId,
# separate session-scoped confs like nanosAsLong).
#
# Liveness invariant (applies to _PLAN_CACHE and datapipe._PAIRS_CACHE
# too): entries are never evicted, and each cached DataFrame holds a
# strong reference to its SparkSession — which is exactly what makes
# the id(spark) key collision-safe (a live entry keeps the session
# alive, so its id cannot be reused by a new session). Any future
# eviction scheme must drop the FRAME together with the KEY (e.g. a
# WeakKeyDictionary keyed on the session object with an inner
# (sf_dir, name) dict); dropping frames while keeping keys would
# reopen id-reuse collisions. Unbounded growth is bounded in practice
# by sessions × tables/queries — a process that churns many sessions
# should recycle one session per dataset instead.
_SCAN_CACHE: dict[tuple[str, int, str, str], DataFrame] = {}


# NTZ epoch anchor: timestamp_diff/add against it give tz-free epoch
# micros regardless of the session time zone (unlike unix_micros, which
# rejects TIMESTAMP_NTZ, and NTZ<->LTZ casts, which shift by session tz).
# Built per call — Column construction needs an active SparkContext.
def EPOCH_NTZ() -> Column:
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def epoch_micros(c: Column) -> Column:
    """Microseconds since epoch for TIMESTAMP_NTZ (wall-clock) columns;
    LTZ inputs coerce. Use this instead of ``unix_micros`` anywhere
    ``events.ts`` flows — the canonical ``ts`` type is NTZ (see load)."""
    return F.timestamp_diff("MICROSECOND", EPOCH_NTZ(), c)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic parquet table (column pruning + predicate
    pushdown happen automatically downstream of this lazy scan).

    ``events.ts`` is normalized to TIMESTAMP_NTZ — the tz-free wall
    clock that DuckDB's naive TIMESTAMP also uses, so the oracle's
    ``CAST(ts AS TIMESTAMP)`` sees identical values. Two physical
    encodings are handled: parquet TIMESTAMP(MICROS, no-tz) reads as
    NTZ directly (current testdata), and legacy TIMESTAMP(NANOS) reads
    as a long (``nanosAsLong``) which we floor to µs.
    """
    key = (spark.sparkContext.applicationId, id(spark), sf_dir, name)
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    # Self-contained: the driver supplies its own SparkSession, so these
    # runtime SQL confs must be set here, not only in session.get_spark —
    # otherwise TIMESTAMP(NANOS) parquet raises PARQUET_TYPE_ILLEGAL.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    # Pin UTC too: ts itself is NTZ (tz-free), but the few places that
    # MUST cast to LTZ (streaming watermarks, timestamp literals in
    # engine queries) are only wall-clock identities under UTC — a
    # driver session inheriting a non-UTC machine zone would silently
    # shift them. The oracle (DuckDB naive timestamps) assumes UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        kind = field.dataType.simpleString()
        if kind == "bigint":
            # legacy nanos-as-long: integer div (ns longs ~1.7e18
            # overflow double precision), then anchor onto the NTZ epoch
            df = df.withColumn(
                "ts", F.timestamp_add("MICROSECOND", F.expr("ts div 1000"), EPOCH_NTZ())
            )
        elif kind == "timestamp":
            # only reachable if a driver session disabled NTZ inference;
            # sessions pin UTC so this cast is the identity reinterpret
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    _SCAN_CACHE[key] = df
    return df


# DuckDB-side normalization of events.ts (TIMESTAMP_NS → µs, floor) to
# mirror what ``load`` does on the Spark side.
EVENTS_NORM_SQL = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props "
    "FROM events)"
)


from contextlib import contextmanager


@contextmanager
def shuffle_partitions(spark: SparkSession, n: int):
    """Scope ``spark.sql.shuffle.partitions`` around eagerly-executed
    plans (iterative loops sizing their shuffle width to measured
    state). Only affects plans BUILT and RUN inside the scope; lazy
    frames returned to the caller plan at action time, after restore."""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def r2(c: Column) -> Column:
    return F.round(c, 2)


def r4(c: Column) -> Column:
    return F.round(c, 4)


def r6(c: Column) -> Column:
    return F.round(c, 6)


@dataclass(frozen=True)
class QueryDef:
    """A named operator demo: Spark builder + DuckDB oracle SQL.

    ``oracle`` is None for genuinely non-SQL-expressible operators
    (sequential recursions, streaming) — the driver then records a
    weaker rows-only check.

    ``effectful`` marks builders whose WORK happens at build time
    (streaming drains, materializations that write storage, ingest
    pipelines, iterative algorithms, driver-side assertions). Those are
    re-run on every call. Pure declarative builders return a logical
    plan, and the plan is cached per (session, sf_dir): re-building an
    identical Column tree through py4j costs 50-400 ms per query (~20%
    of warm query wall at sf0.1), which a resident pipeline service —
    and the reference's compiled-manifest dbt runner — never re-pays.
    Every ACTION on the cached frame still re-executes the full
    scan/shuffle/compute; only plan construction is reused.
    """

    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    ops: tuple[str, ...] = ()  # SURVEY.md §2 operator IDs exercised
    effectful: bool = False


# (applicationId, session identity, sf_dir, query name) → built
# DataFrame (logical plan). The session identity term matters because
# SparkSession.newSession() shares the applicationId but has its own
# temp-view/conf state; a cached frame must never cross sessions.
# Caveat (inherent to plan caching): confs read at BUILD time (e.g. a
# repartition width derived from shuffle.partitions) are frozen into
# the cached plan — a conf sweep needs a fresh session.
_PLAN_CACHE: dict[tuple[str, int, str, str], DataFrame] = {}


def _cached_builder(q: "QueryDef") -> Callable[[SparkSession, str], DataFrame]:
    if q.effectful:
        return q.builder

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (spark.sparkContext.applicationId, id(spark), sf_dir, q.name)
        df = _PLAN_CACHE.get(key)
        if df is None:
            df = q.builder(spark, sf_dir)
            _PLAN_CACHE[key] = df
        return df

    return build


# Verification-priority ordering. The correctness harness records
# verdicts for a prefix of dict order (50 rows in r2/r3), so queries
# are rotated each round to keep every verdict fresh. Round-4 rotation:
# the 26 queries whose last oracle verdict dates from r2, ordered so
# the paths round 3 modified (minhash hot-bucket cap, media-chain
# fusion, shared tokenization, scan/plan caches) verify first; the
# r3-verified queries follow and re-verify within the same 50-prefix.
_VERIFY_FIRST = (
    # r3-modified code paths carrying stale r2 verdicts
    "dedup_minhash",
    "media_pipeline",
    "media_features",
    "frame_sample",
    "dedup_cluster",
    "fingerprint",
    "simhash",
    "text_stats",
    "token_count",
    # remaining r2-only verdicts (engine / ingest / sampling set)
    "avail_agg",
    "contract_check",
    "dedup_exact",
    "freshness_check",
    "hash_split",
    "incremental_upsert",
    "jsonstat_decode",
    "knn_brute",
    "lang_id",
    "notnull_violations",
    "registry_pipeline",
    "rest_ingest",
    "sample_stratified",
    "scd2_snapshot",
    "seed_eu_status",
    "unit_test_mock",
    "vocab_topk",
    # new in r4 — verify on first appearance
    "schema_test_suite",
    "unigram_logprob",
    "chunk_documents",
    "knn_quantized",
    "stream_join",
    "tfidf_topk",
    "paragraph_dedup",
    "bloom_decontaminate",
    "temperature_resample",
    "kmeans_refine",
    "funnel_steps",
    "event_transitions",
    "zorder_layout",
    "embedding_normalize",
    "text_clean",
    "targeted_delete",
    "compact_files",
    "schema_evolve_read",
    "salted_join",
    "table_profile",
    "stream_enrich",
    # r4-touched paths from the r3-verified set (broadcast-hint fix
    # lands on dedup_embedding this round; flagship stays exercised)
    "dedup_embedding",
    "annual_summary",
)


def all_queries() -> dict[str, QueryDef]:
    from . import (
        corpus,
        curation,
        datapipe,
        engine,
        ml,
        relational,
        simsearch,
        storage,
        streamq,
        timeseries,
    )

    by_name: dict[str, QueryDef] = {}
    for mod in (
        relational, ml, datapipe, engine, simsearch, streamq, storage, timeseries, curation, corpus,
    ):
        for q in mod.QUERIES:
            by_name[q.name] = q
    out: dict[str, QueryDef] = {}
    for name in _VERIFY_FIRST:
        out[name] = by_name.pop(name)
    out.update(by_name)
    # Expose plan-cached builders for pure queries (see QueryDef).
    from dataclasses import replace

    return {
        name: replace(q, builder=_cached_builder(q)) for name, q in out.items()
    }
