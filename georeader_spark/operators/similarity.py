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
    n_tables: int = 1,
    table_col: str = "lsh_table",
) -> DataFrame:
    """Append random-projection LSH bucket ids (sign bits of the
    n_planes dot products), exploded over ``n_tables`` independent
    hash tables — multi-probe recall without touching the corpus twice
    (one pass computes all tables' buckets). JVM-side expressions only.
    """
    out_rows = []
    for t in range(n_tables):
        planes = deterministic_hyperplanes(dim, n_planes * (t + 1))[n_planes * t :]
        bucket = F.lit(0).cast("long")
        for p, plane in enumerate(planes):
            plane_arr = F.array(*[F.lit(float(x)) for x in plane])
            d = _dot(F.col(vec_col), plane_arr)
            bucket = bucket + F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        out_rows.append(F.struct(F.lit(t).alias(table_col), bucket.alias(bucket_col)))
    if n_tables == 1:
        return vectors.withColumn(bucket_col, out_rows[0][bucket_col])
    return vectors.withColumn("_tb", F.explode(F.array(*out_rows))).select(
        "*", f"_tb.{table_col}", f"_tb.{bucket_col}"
    ).drop("_tb")


def ann_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 16,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
    q_vec: str = "q_embedding",
) -> DataFrame:
    """Approximate top-k: exact rank within the union of the query's
    LSH buckets across ``n_tables`` tables (multi-table sign-LSH —
    recall compounds as 1 - (1 - p)^L). Candidates dedup before the
    exact cosine refine; recall is measured against
    :func:`cosine_topk_bruteforce` in tests."""
    v = rp_lsh_buckets(vectors, dim, n_planes, vec_col, n_tables=n_tables)
    q = rp_lsh_buckets(queries, dim, n_planes, q_vec, n_tables=n_tables)
    join_keys = ["bucket"] if n_tables == 1 else ["lsh_table", "bucket"]
    cand = (
        v.join(F.broadcast(q.select(*join_keys, q_id)), join_keys)
        .where(F.col(vec_id) != F.col(q_id))
        .select(q_id, vec_id, vec_col)
        .distinct()
    )
    pairs = cand.join(
        F.broadcast(queries.select(q_id, q_vec)), q_id
    )
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
    n_tables: int = 4,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate (id_a < id_b, cos >= threshold) pairs within LSH
    buckets — the embedding-cosine near-dup of the task brief. High
    thresholds collide reliably per table; ``n_tables`` compounds
    recall for the tail."""
    v = rp_lsh_buckets(vectors, dim, n_planes, vec_col, n_tables=n_tables)
    keys = ["bucket"] if n_tables == 1 else ["lsh_table", "bucket"]
    a = v.select(
        *keys, F.col(vec_id).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = v.select(
        *keys, F.col(vec_id).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    pairs = a.join(b, keys).where(F.col("id_a") < F.col("id_b"))
    cos = cosine_similarity_col(F.col("vec_a"), F.col("vec_b"))
    return (
        pairs.withColumn("cos_sim", cos)
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
        .distinct()
    )
