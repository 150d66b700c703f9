"""IVF (inverted-file) approximate-nearest-neighbor index.

The second ANN family next to :mod:`sparkgrep.operators.ann_index`'s
hyperplane-LSH tables, mirroring FAISS's ``IndexIVFFlat`` lifecycle
(reference analogue: ``faiss_manager.py:52-95`` build/persist,
``:135-178`` load/search — the reference uses a flat index; IVF is its
documented scale path). Spark-native rebuild:

- **train**: a spherical k-means coarse quantizer is trained driver-side
  in numpy on a bounded deterministic sample (``orderBy(xxhash64(id))
  LIMIT train_size`` — TakeOrderedAndProject, driver memory bounded by
  ``train_size × dim`` regardless of corpus size). Exactly FAISS's
  training model: the quantizer sees a sample, never the corpus.
  Deterministic end to end — hash-ordered sample, first-``nlist`` init,
  fixed Lloyd iteration count, argmax ties to the lowest list id,
  empty clusters keep their previous centroid.
- **build**: every vector is assigned to its nearest centroid by an
  Arrow pandas UDF (one ``V @ C.T`` matmul per batch; centroids are
  unit-norm so the raw-dot argmax IS the cosine argmax) and the table is
  written partitioned by ``list=`` — one parquet partition per inverted
  list. Centroids persist next to it as parquet + a ``meta.json`` recipe.
- **query**: the ``nprobe`` nearest centroids are found driver-side
  (same numpy kernel), the scan prunes to those ``list=`` directories
  via partition pruning, and exact cosine re-ranks the candidates with
  the same JVM expression as :func:`similarity.cosine_topk` — so on the
  probed candidate set the scores are bitwise-identical to brute force.

Scan fraction ≈ nprobe/nlist of the corpus (vs 1.0 for the brute-force
baseline and ~probed-buckets/2^n_planes per table for the LSH index);
``nprobe = nlist`` degenerates to exact brute force, which the tests pin.
At 10^12 vectors a single-level quantizer needs nlist ~ 10^6 — the
centroid table (~GBs at 768-d) then itself wants the two-level IVF
(quantize the centroids) noted on :class:`IvfMeta`; the lifecycle and
layout here are unchanged by that extension.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sparkgrep.operators.similarity import cosine_col
from sparkgrep.sources import fsio


@dataclass(frozen=True)
class IvfMeta:
    """Recipe sidecar. ``nlist`` is expected ~sqrt(n_vectors) (FAISS
    guidance); the driver-side centroid residency this implies is
    ``nlist × dim`` floats — a deployment past ~10^5 lists shards the
    quantizer with a second IVF level over the centroids."""

    dim: int
    nlist: int
    n_iters: int
    train_size: int
    seed: int
    n_vectors: int
    id_col: str
    version: int = 1


def train_centroids(
    sample: np.ndarray, nlist: int, n_iters: int = 10
) -> np.ndarray:
    """Deterministic spherical k-means over a (n × dim) float64 sample.
    Returns unit-norm (nlist × dim) centroids. Init = the first nlist
    sample rows (the caller feeds a hash-ordered, i.e. pseudo-random,
    sample); ties in the assignment argmax go to the lowest list id;
    a list that loses all members keeps its previous centroid."""
    n, _dim = sample.shape
    if n < nlist:
        raise ValueError(f"training sample ({n}) smaller than nlist ({nlist})")
    norms = np.linalg.norm(sample, axis=1)
    norms[norms == 0.0] = 1.0
    pts = sample / norms[:, None]
    centroids = pts[:nlist].copy()
    for _ in range(n_iters):
        assign = np.argmax(pts @ centroids.T, axis=1)
        nxt = centroids.copy()
        for c in range(nlist):
            members = pts[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0.0:
                    nxt[c] = m / nrm
        centroids = nxt
    return centroids


def _assign_udf(centroids: np.ndarray):
    """pandas UDF: nearest-centroid list id per vector (batch matmul).
    Centroids are unit-norm, so argmax over raw dots equals the cosine
    argmax (the per-row 1/||v|| factor cannot change an argmax)."""
    ct = centroids.T.copy()  # (dim × nlist), closure-captured, broadcast once

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(mat @ ct, axis=1).astype(np.int32))

    return _assign


def build_ivf_index(
    embeddings: DataFrame,
    out_dir: str,
    nlist: int = 16,
    n_iters: int = 10,
    train_size: int = 16384,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfMeta:
    """Train → assign → persist. The vectors table is partitioned by
    ``list=`` so a query scan prunes to its probed inverted lists."""
    spark = embeddings.sparkSession
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("cannot build an IVF index over an empty table")
    dim = int(first["d"])
    named = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    # bounded deterministic pseudo-random sample: TakeOrderedAndProject,
    # never a full collect (xxhash64 seeded so `seed` changes the draw)
    sample_rows = (
        named.orderBy(F.xxhash64(F.col("vec_id"), F.lit(seed)), F.col("vec_id"))
        .limit(train_size)
        .select("embedding")
        .collect()
    )
    sample = np.array([r["embedding"] for r in sample_rows], dtype=np.float64)
    centroids = train_centroids(sample, nlist=nlist, n_iters=n_iters)

    meta = IvfMeta(
        dim=dim,
        nlist=nlist,
        n_iters=n_iters,
        train_size=train_size,
        seed=seed,
        n_vectors=named.count(),
        id_col=id_col,
    )
    assigned = named.withColumn("list", _assign_udf(centroids)(F.col("embedding")))
    (
        assigned.repartition("list")
        .write.partitionBy("list")
        .mode("overwrite")
        .parquet(f"{out_dir}/vectors")
    )
    cent_df = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "list int, centroid array<double>",
    )
    cent_df.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/centroids")
    fsio.write_text(f"{out_dir}/meta.json", json.dumps(asdict(meta), indent=2))
    return meta


def load_ivf_meta(index_dir: str) -> IvfMeta:
    return IvfMeta(**json.loads(fsio.read_text(f"{index_dir}/meta.json")))


class IvfIndex:
    """Handle over a persisted IVF index directory (load-and-query path,
    mirroring :class:`sparkgrep.operators.ann_index.AnnIndex`)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.meta = load_ivf_meta(index_dir)
        self.vectors = spark.read.parquet(f"{index_dir}/vectors")
        rows = spark.read.parquet(f"{index_dir}/centroids").collect()
        cents = np.zeros((self.meta.nlist, self.meta.dim), dtype=np.float64)
        for r in rows:
            cents[r["list"]] = r["centroid"]
        self.centroids = cents

    def probe_lists(self, query_vec: list[float], nprobe: int) -> list[int]:
        """The nprobe nearest inverted lists, driver-side (same metric as
        the build-time assignment; ties to the lowest list id)."""
        q = np.asarray(query_vec, dtype=np.float64)
        dots = self.centroids @ q
        order = np.lexsort((np.arange(len(dots)), -dots))
        return sorted(int(i) for i in order[: max(1, min(nprobe, self.meta.nlist))])

    def search(
        self, query_vec: list[float], k: int = 10, nprobe: int = 4
    ) -> DataFrame:
        """(vec_id, cosine) top-k over the probed lists only. The
        ``list IN (...)`` filter compiles to partition pruning on the
        ``list=`` directories; exact cosine re-ranks the candidates with
        the same expression as the brute-force baseline, so scores are
        bitwise-identical on the candidate set. ``nprobe = nlist`` is
        exact brute force."""
        probes = self.probe_lists(query_vec, nprobe)
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            self.vectors.filter(F.col("list").isin(probes))
            .select("vec_id", cosine_col(F.col("embedding"), q).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k)
        )
