"""PySpark-native analytics engine with the query & data-processing
capabilities of SimonVegelahn/dbt-economic-indicators-eu.

The reference is a dbt+DuckDB ELT DAG (9 SQL models, 3 pandas models,
macros, snapshots, tests). This package re-expresses the same semantics
Spark-first:

- models are Python functions returning *lazy* DataFrames (one Catalyst
  plan per materialized output) — see ``plans.registry``;
- dbt macros become Column-returning helpers — see ``functions``;
- materializations (view/table/incremental/SCD2 snapshot) — see
  ``materialize``;
- the dbt test surface (unique / not_null / relationships / range /
  freshness / contracts / unit tests) — see ``testing``;
- large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) — see ``operators``;
- Structured Streaming variant of the incremental pipeline — see
  ``streaming``.
"""

__version__ = "0.1.0"
