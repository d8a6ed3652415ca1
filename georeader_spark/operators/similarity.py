"""Similarity search over embedding columns (task brief: brute-force
cosine top-k baseline + LSH-bucketed scale path; embedding-cosine
near-dup).

Scale notes:
- :func:`cosine_topk_bruteforce` broadcasts the (small) query set and
  computes dot products JVM-side with ``aggregate(zip_with(...))`` —
  whole-stage codegen, no Python, one pass over the corpus, rank
  shuffle only on (q_id, dist). The right baseline at any corpus size
  when |Q| is modest.
- :func:`rp_lsh_buckets` / :func:`ann_topk_lsh` — random-hyperplane
  (sign) LSH: hyperplanes are *deterministically derived* (no RNG
  state) so any engine recomputes the same buckets. Candidates =
  same-bucket rows; top-k refined exactly within candidates.
- :func:`embedding_near_dup_pairs` — near-duplicate pairs by cosine >=
  threshold within LSH buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )


def cosine_similarity_col(a, b):
    """cos(a, b) as a pure column expression over array<float> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
    q_vec: str = "q_embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries, JVM-side math, rank.

    Ties broken by neighbor id. Self-matches (same id) excluded.
    Returns (q_id, vec_id, rank, cos_sim)."""
    pairs = vectors.crossJoin(F.broadcast(queries)).where(
        F.col(vec_id) != F.col(q_id)
    )
    cos = cosine_similarity_col(F.col(vec_col), F.col(q_vec))
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(vec_id).asc())
    return (
        pairs.withColumn("cos_sim", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id, vec_id, "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def deterministic_hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Pseudo-random unit hyperplanes from a fixed arithmetic recurrence
    (sin-based, seedless): identical on every engine/run.

    h[p][d] = sin(1.0 + (p * dim + d) * 12.9898) * 43758.5453 mod 1,
    shifted to [-0.5, 0.5) — the classic shader-noise construction.
    """
    planes = []
    for p in range(n_planes):
        v = []
        for d in range(dim):
            t = math.sin(1.0 + (p * dim + d) * 12.9898) * 43758.5453
            v.append((t - math.floor(t)) - 0.5)
        planes.append(v)
    return planes


def rp_lsh_buckets(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Append a random-projection LSH bucket id (int: sign bits of the
    n_planes dot products). JVM-side expressions only."""
    planes = deterministic_hyperplanes(dim, n_planes)
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(F.col(vec_col), plane_arr)
        bucket = bucket + F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return vectors.withColumn(bucket_col, bucket)


def ann_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
    q_vec: str = "q_embedding",
) -> DataFrame:
    """Approximate top-k: exact rank within the query's LSH bucket.

    Recall improves with fewer planes (bigger buckets); callers measure
    recall against :func:`cosine_topk_bruteforce` (tests do)."""
    v = rp_lsh_buckets(vectors, dim, n_planes, vec_col)
    q = rp_lsh_buckets(queries, dim, n_planes, q_vec)
    pairs = v.join(F.broadcast(q), "bucket").where(F.col(vec_id) != F.col(q_id))
    cos = cosine_similarity_col(F.col(vec_col), F.col(q_vec))
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(vec_id).asc())
    return (
        pairs.withColumn("cos_sim", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id, vec_id, "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate (id_a < id_b, cos >= threshold) pairs within LSH
    buckets — the embedding-cosine near-dup of the task brief."""
    v = rp_lsh_buckets(vectors, dim, n_planes, vec_col)
    a = v.select(
        "bucket", F.col(vec_id).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = v.select(
        "bucket", F.col(vec_id).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    cos = cosine_similarity_col(F.col("vec_a"), F.col("vec_b"))
    return (
        pairs.withColumn("cos_sim", cos)
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
        .distinct()
    )
