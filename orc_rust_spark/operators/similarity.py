"""Similarity search over an embedding column (array<float>).

- cosine_topk         brute-force exact top-k neighbors (the baseline):
                      broadcast-joined cross product, JVM-side dot product
                      via zip_with + aggregate, window top-k
- lsh_topk            scale path: random-hyperplane LSH buckets the
                      vectors so the join is bucket-local; approximate
- embedding_neardup_pairs  cosine >= tau near-duplicate pairs

Everything is built-in pyspark.sql.functions (whole-stage codegen); the
dot product never leaves the JVM.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def with_cosine(pairs: DataFrame, left: str, right: str) -> DataFrame:
    return pairs.withColumn(
        "cosine", _dot(F.col(left), F.col(right)) / (_norm(F.col(left)) * _norm(F.col(right)))
    )


def cosine_topk(
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
    broadcast_right: bool = True,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    At cluster scale the corpus side stays partitioned and the (smaller)
    query side is broadcast; locally either way works. Ties broken by
    neighbor id for determinism.
    """
    # norms are computed ONCE per row before the join (bitwise-identical to
    # recomputing per pair, ~3x less work inside the cross product)
    q = (queries or vectors).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = vectors.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"),
        _norm(F.col(vec_col)).alias("nn"),
    )
    if broadcast_right:
        c = F.broadcast(c)
    pairs = q.join(c, F.col("qid") != F.col("nid"))
    cos = _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    scored = pairs.withColumn("cosine", F.round(cos, round_to) if round_to else cos)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("qid").alias(id_col), "rank", F.col("nid").alias("neighbor_id"), "cosine")
    )


def hyperplane_buckets(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign-bit sketch)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("bigint")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(_dot(F.col(vec_col), plane) > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        bucket = bucket + F.shiftleft(bit, i)
    return vectors.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def lsh_topk(
    vectors: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the same LSH bucket.

    The join is shuffle-on-bucket (co-located), so at 10^12 scale each
    task only sees one bucket's vectors instead of the full corpus.
    """
    b = hyperplane_buckets(vectors, dim, n_planes, id_col=id_col, vec_col=vec_col)
    q = b.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"), "bucket")
    c = b.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"), "bucket")
    pairs = q.join(c, ["bucket"]).where(F.col("qid") != F.col("nid"))
    scored = pairs.withColumn(
        "cosine",
        F.round(_dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv"))), 6),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("qid").alias(id_col), "rank", F.col("nid").alias("neighbor_id"), "cosine")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs (a < b) with cosine >= tau (embedding near-duplicate dedup)."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                       _norm(F.col(vec_col)).alias("na"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                       _norm(F.col(vec_col)).alias("nb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cosine",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .where(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
    )
