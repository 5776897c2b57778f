"""THE canonical testdata table list, in a dependency-free module.

``queries.common`` (the engine side — registers one plan-cached scan
per table) and ``tools/mutate_corpus.py`` / ``tools/check_oracle.py``
(the verification side — build regime corpora and register DuckDB
views for exactly these tables) must agree on this list, or a new
table silently falls out of every regime corpus. The engine package
re-exports it from ``queries.common``; the pyarrow-only tools import
it from here so corpus mutation never pays (or breaks on) a pyspark
import it doesn't use.
"""

from __future__ import annotations

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
