"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query
  set against all vectors; the dot product is a JVM higher-order
  ``aggregate(zip_with(...))`` in double precision (no Python in the loop).
- ``bucketed_topk``: the scale path — sign-LSH buckets on fixed dimensions
  prune candidates to the query's bucket before scoring (an IVF-style
  coarse quantizer; at 100 TB the bucket id is a partition key so a query
  touches one partition instead of the full corpus).

Scores are rounded to 4 decimals and ranked (rounded score desc, vec_id asc)
so results are deterministic and engine-portable for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)


def _cosine_expr(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 4)"


def brute_force_topk(embeddings: DataFrame, query_ids: list[int],
                     k: int = 10) -> DataFrame:
    """(query_id, vec_id, score, rank) — exact cosine top-k per query."""
    q = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    )
    scored = (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                F.expr(_cosine_expr("q_emb", "embedding")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def bucket_expr(col: str = "embedding") -> F.Column:
    """Sign-LSH bucket from dims 1..3 (1-indexed): 3 bits -> 0..7."""
    return (
        (F.element_at(col, 1) > 0).cast("int") * 4
        + (F.element_at(col, 2) > 0).cast("int") * 2
        + (F.element_at(col, 3) > 0).cast("int")
    ).alias("bucket")


def bucketed_topk(embeddings: DataFrame, query_ids: list[int],
                  k: int = 5) -> DataFrame:
    """(query_id, vec_id, score, rank) — ANN: score only the query's bucket."""
    with_b = embeddings.select("vec_id", "embedding", bucket_expr())
    q = (
        with_b.filter(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_emb"), "bucket")
    )
    scored = (
        with_b.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                F.expr(_cosine_expr("q_emb", "embedding")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
