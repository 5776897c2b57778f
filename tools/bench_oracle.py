#!/usr/bin/env python
"""Time the DuckDB oracle side of every query at a given scale factor.

The driver's bench gate is "within 2x of the DuckDB oracle at the same
scale factor" (BASELINE.md). ``bench.py`` times the Spark side; this
tool times the oracle side so the ratio is measurable locally:

    python tools/bench_oracle.py [sf_dir] [threads]

Prints one JSON line mirroring bench.py's shape. Each query is fully
materialized to an Arrow table (comparable to bench.py's noop sink:
results leave the engine but are never written).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import oracle_sql  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threads = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")

    con = duckdb.connect()
    con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    per_query: dict[str, float] = {}
    for name, sql in oracle_sql().items():
        t0 = time.perf_counter()
        try:
            con.execute(sql).arrow()
            per_query[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            print(f"oracle bench: {name} FAILED: {exc}", file=sys.stderr)
            per_query[name] = -1.0

    total = round(sum(t for t in per_query.values() if t >= 0), 3)
    sf = None
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    print(json.dumps({
        "metric": "oracle_total_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
