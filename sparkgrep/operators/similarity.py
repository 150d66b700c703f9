"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exactness baseline (native
``zip_with``/``aggregate`` — stays in codegen, no UDF), and an
LSH-bucketed variant (random hyperplanes) as the scale path: at 10^12
vectors the brute force is a full scan per query; the LSH path prunes to
matching sign-buckets, trading recall for a ~2^n_planes fan-in reduction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    hyperplane sign-bucket, computed ad hoc (small-dim exploratory use).
    The MATERIALIZED form of this idea — precomputed bucket columns,
    table partitioned by (tbl, bucket), multiprobe queries with partition
    pruning, persisted meta — is :mod:`sparkgrep.operators.ann_index`;
    use that for any real workload."""
    dim = len(query_vec)
    planes = deterministic_hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    # sequential (cumsum) summation: numpy's pairwise .sum() can
    # sign-flip a near-zero dot vs the JVM's sequential fold in
    # lsh_bucket_col, putting the query in a different bucket than a
    # byte-identical stored vector (same 1-ulp class as lsh_buckets_udf,
    # which uses cumsum for exactly this reason)
    qbucket = int(
        sum(int(np.cumsum(qv * p)[-1] > 0) << i for i, p in enumerate(planes))
    )
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


def lsh_buckets_udf(planes_list: list[np.ndarray]):
    """Arrow pandas UDF: embedding → one sign-bucket id per hyperplane
    table (array<long>, length = len(planes_list)). This is the scale
    path for bucket computation — a numpy matmul per Arrow batch instead
    of ``lsh_bucket_col``'s inlined ``n_planes × dim`` literal expression
    tree (pathological at real dims like 768). Dot products are summed
    sequentially (cumsum) in float64, matching an ordered-sum SQL oracle
    bit-for-bit."""
    planes_all = [np.asarray(p, dtype=np.float64) for p in planes_list]

    @F.pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        per_table = []
        for planes in planes_all:
            dots = np.cumsum(M[:, None, :] * planes[None, :, :], axis=-1)[..., -1]
            bits = (dots > 0).astype(np.int64)
            per_table.append(bits @ (1 << np.arange(planes.shape[0], dtype=np.int64)))
        out = np.stack(per_table, axis=1)
        return pd.Series([row.tolist() for row in out])

    return _buckets


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, LSH-blocked —
    NO crossJoin. Vectors are bucketed by random-hyperplane sign pattern
    in ``n_tables`` independent tables; only same-(table, bucket) pairs
    are compared (equi-join), then exact cosine verifies. Multiple
    tables push recall → 1 for genuinely near-duplicate pairs (at
    threshold 0.95 the angle is ~18°, so a plane separates the pair with
    prob ~0.1 per plane; P[miss all tables] ≈ (1-0.9^8)^4 < 4%, and ≪1%
    at the ~0.99 cosines real dup pairs have)."""
    if dim is None:
        first = embeddings.select(F.size(vec_col).alias("d")).first()
        if first is None:
            # preserve the input's actual id type (string ids would
            # otherwise get a mismatched hardcoded long schema)
            ids = embeddings.limit(0).select(F.col(id_col).alias("id_a"))
            return ids.select(
                "id_a",
                F.col("id_a").alias("id_b"),
                F.lit(0.0).cast("double").alias("cosine"),
            )
        dim = int(first["d"])
    planes = [
        deterministic_hyperplanes(dim, n_planes, seed + 1000 * t)
        for t in range(n_tables)
    ]
    vecs = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    # candidate generation shuffles ONLY (id, tbl, bucket) — exploding
    # the full embedding through n_tables copies and both join sides
    # multiplied the shuffle bytes by ~2·n_tables·dim; vectors join back
    # once per side onto the deduped pair ids instead
    slim = (
        vecs.withColumn("bks", lsh_buckets_udf(planes)(F.col("vec")))
        .select("id", F.posexplode("bks").alias("tbl", "bucket"))
    )
    a, b = slim.alias("a"), slim.alias("b")
    pair_ids = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()  # a pair can collide in several tables
    )
    cand = pair_ids.join(
        vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("va")), "id_a"
    ).join(
        vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vb")), "id_b"
    )
    return (
        cand.withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
