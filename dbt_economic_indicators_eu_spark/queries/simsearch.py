"""Similarity search over the ``embeddings`` table (driver north star):
brute-force cosine top-k as the exactness baseline, and a random-
hyperplane LSH variant as the 100 TB scale path.

Determinism strategy: hyperplanes are derived from md5 in *Python* and
embedded as double literals in BOTH engines' plans, so bucket
assignment is bit-reproducible. Dot products are computed on
``double``-cast vectors with sequential left-to-right summation in both
engines (Spark ``aggregate(zip_with(...))``, DuckDB
``list_dot_product``) — empirically bit-identical, rounded to 6 dp in
the outputs regardless.

Scale posture:
- brute force: queries are broadcast (small side), candidates stream —
  one pass, no shuffle on the big side; per-query top-k via window over
  q_id (bounded partitions = number of queries).
- LSH: one narrow projection computes the bucket id per vector; the
  candidate join shuffles on bucket_id only (64 buckets here; at scale
  use more planes + multi-probe). NEVER an all-pairs product.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import QueryDef, load, r6

_DIM = 64
_N_PLANES = 6
_QUERY_MOD = 50  # vec_id % 50 == 0 → the query subset
_TOP_K = 10
_TOP_K_LSH = 5


def _hyperplane(j: int, dim: int = _DIM) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-1, 1)^dim from md5 —
    reproducible in any engine/language (no RNG state)."""
    return [
        int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:8], 16) / 2147483648.0 - 1.0
        for i in range(dim)
    ]


_PLANES = [_hyperplane(j) for j in range(_N_PLANES)]


def _vec_double() -> Column:
    return F.transform("embedding", lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _lit_array(xs: list[float]) -> Column:
    return F.array(*[F.lit(x) for x in xs])


def _sql_array(xs: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in xs) + "]"


# --------------------------------------------------------------------------
# q_knn_brute — EXT-ANN-BRUTE: exact cosine top-k for a query subset.
# --------------------------------------------------------------------------


def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select("vec_id", _vec_double().alias("v"))
    emb = emb.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = emb.select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    ).filter(F.col("q_id") % _QUERY_MOD == 0)
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    scored = (
        emb.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("q_id", "neighbor_id", r6(F.col("cos")).alias("cosine"), "rnk")
    )


ORACLE_KNN_BRUTE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id % {_QUERY_MOD} = 0),
scored AS (
  SELECT q.q_id, n.vec_id AS neighbor_id,
         list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm) AS cos
  FROM q, n WHERE n.vec_id != q.q_id
)
SELECT q_id, neighbor_id, round(cos, 6) AS cosine, rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rnk
  FROM scored
)
WHERE rnk <= {_TOP_K}
"""


# --------------------------------------------------------------------------
# q_lsh_buckets — EXT-ANN-LSH (bucketing stage): sign of dot with each
# hyperplane → bit; 6 planes → 64 buckets. Output = bucket histogram
# (verifies every vector's bucket assignment through the counts).
# --------------------------------------------------------------------------


def _bucket_expr(v: Column) -> Column:
    out = None
    for j, plane in enumerate(_PLANES):
        bit = F.when(_dot(v, _lit_array(plane)) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select("vec_id", _vec_double().alias("v"))
    return (
        emb.select(_bucket_expr(F.col("v")).alias("bucket_id"))
        .groupBy("bucket_id")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


def _oracle_bucket_sql(vcol: str) -> str:
    terms = [
        f"CASE WHEN list_dot_product({vcol}, {_sql_array(p)}) > 0 THEN {1 << j} ELSE 0 END"
        for j, p in enumerate(_PLANES)
    ]
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


ORACLE_LSH_BUCKETS = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT {_oracle_bucket_sql("v")} AS bucket_id, count(*) AS n_vecs
FROM e
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q_knn_lsh — EXT-ANN-LSH (search stage): top-k restricted to the query's
# bucket — the join shuffles on bucket_id, never all-pairs.
# --------------------------------------------------------------------------


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select("vec_id", _vec_double().alias("v"))
    emb = emb.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v")))).withColumn(
        "bucket_id", _bucket_expr(F.col("v"))
    )
    q = emb.select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        "bucket_id",
    ).filter(F.col("q_id") % _QUERY_MOD == 0)
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    scored = (
        emb.join(q, "bucket_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "bucket_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K_LSH)
        .select("q_id", "bucket_id", "neighbor_id", r6(F.col("cos")).alias("cosine"), "rnk")
    )


ORACLE_KNN_LSH = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         {_oracle_bucket_sql("v")} AS bucket_id
  FROM e
),
q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, bucket_id
  FROM n WHERE vec_id % {_QUERY_MOD} = 0
),
scored AS (
  SELECT q.q_id, q.bucket_id, n.vec_id AS neighbor_id,
         list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm) AS cos
  FROM q JOIN n USING (bucket_id) WHERE n.vec_id != q.q_id
)
SELECT q_id, bucket_id, neighbor_id, round(cos, 6) AS cosine, rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rnk
  FROM scored
)
WHERE rnk <= {_TOP_K_LSH}
"""


QUERIES = [
    QueryDef("knn_brute", q_knn_brute, ORACLE_KNN_BRUTE, ("EXT-ANN-BRUTE",)),
    QueryDef("lsh_buckets", q_lsh_buckets, ORACLE_LSH_BUCKETS, ("EXT-ANN-LSH",)),
    QueryDef("knn_lsh", q_knn_lsh, ORACLE_KNN_LSH, ("EXT-ANN-LSH",)),
]
