"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exactness baseline (native
``zip_with``/``aggregate`` — stays in codegen, no UDF), and an
LSH-bucketed variant (random hyperplanes) as the scale path: at 10^12
vectors the brute force is a full scan per query; the LSH path prunes to
matching sign-buckets, trading recall for a ~2^n_planes fan-in reduction.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    # fold in array order → deterministic float sum; all arithmetic in
    # float64 (elements cast before multiply), same order as the DuckDB
    # oracle's ordered sum over positions
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (vec_id, cosine), ties by id.
    One narrow scan + TakeOrderedAndProject — the right plan for exact
    ANN baselines at any scale (no shuffle at all)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        cosine_col(F.col(vec_col), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def deterministic_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Seeded hyperplanes (LCG → uniform[-1,1]); same literals are inlined
    into the oracle SQL so both engines bucket identically."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    vals = []
    s = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 64)
    for _ in range(n_planes * dim):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        vals.append(((s >> 16) % (1 << 32)) / float(1 << 31) - 1.0)
    out[:] = np.array(vals).reshape(n_planes, dim)
    return out


def lsh_bucket_col(vec: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id: bit i = (vec · plane_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = (_dot(vec, p) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: score only vectors in the query's
    hyperplane sign-bucket. At cluster scale the bucket column is
    precomputed and the table is partitioned by it, so this becomes a
    single-partition read."""
    dim = len(query_vec)
    planes = deterministic_hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = int(sum((int((qv * p).sum() > 0)) << i for i, p in enumerate(planes)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    bucketed = embeddings.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
    return (
        bucketed.filter(F.col("_bucket") == qbucket)
        .select(
            F.col(id_col).alias("vec_id"),
            cosine_col(F.col(vec_col), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold. Pairwise at
    test scale; the scale path first blocks by LSH bucket."""
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
