"""Operator-level demo queries over the driver's synthetic tables.

Each module exposes ``QUERIES: dict[name, QueryDef]`` where a QueryDef
couples the Spark builder with its DuckDB oracle SQL (or None for
non-SQL-expressible operators). ``__spark_entry__.py`` aggregates them.
"""

from .common import QueryDef, all_queries

__all__ = ["QueryDef", "all_queries"]
