"""Index-backed BM25 top-k serving (reference ``search_by_keywords``,
``message_manager.py:225-264``, rebuilt over the engine's postings table).

Query lifecycle (SURVEY §3.3): tokenize the query with the index's own
analyzer → prune the postings scan to the query terms' hash buckets
(partition pruning on the ``bucket=`` directory column, then row-group
min/max on ``term``) → decode varint postings and score in one numpy
pass (`mapInPandas`) → deterministic ordered-fold aggregation per doc →
distributed top-k. No join against a doc-length table: dl is stored in
the posting payload, so a query touches ONLY its terms' shards.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkgrep.functions.tokenizer import tokenize_py
from sparkgrep.functions.varint import gap_decode, varint_decode
from sparkgrep.operators.index_build import IndexMeta, load_meta
from sparkgrep.operators.score import idf as idf_fn


def _decode_score_gen(meta: IndexMeta):
    k1, b, avgdl, n_docs = meta.k1, meta.b, meta.avgdl, meta.n_docs
    variant = meta.idf_variant

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for r in pdf.itertuples():
                ids = gap_decode(r.doc_ids)
                tfs = varint_decode(r.tfs).astype(np.int64)
                dls = varint_decode(r.dls).astype(np.int64)
                idf = idf_fn(n_docs, r.df, variant)
                contrib = idf * (tfs * (k1 + 1.0)) / (
                    tfs + (k1 * ((1.0 - b) + ((b * dls) / avgdl)))
                )
                outs.append(
                    pd.DataFrame(
                        {"term": r.term, "doc_id": ids.astype(np.int64), "contrib": contrib}
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return gen


class InvertedIndex:
    """Handle over a built index directory."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.meta = load_meta(index_dir)
        self.postings = spark.read.parquet(f"{index_dir}/postings")
        self._warm = False

    def warm(self) -> "InvertedIndex":
        """Serving mode: pin the postings table in executor memory
        (columnar cache) so repeated queries skip the parquet scan.
        On a cluster this is the resident shard of a serving tier; cache
        misses fall through to parquet transparently."""
        if not self._warm:
            self.postings = self.postings.persist()
            self.postings.count()  # materialize
            self._warm = True
        return self

    # -- internals ----------------------------------------------------------

    def _buckets_for(self, terms: list[str]) -> list[int]:
        # driver-side XXH64 (bit-compatible with the build side's
        # F.xxhash64, pinned by tests/test_xxhash.py) — no Spark job
        from sparkgrep.functions.xxhash import term_bucket

        return sorted({term_bucket(t, self.meta.n_buckets) for t in terms})

    def _matched(self, terms: list[str]) -> DataFrame:
        buckets = self._buckets_for(terms)
        return self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def _contribs(self, terms: list[str]) -> DataFrame:
        return self._matched(terms).mapInPandas(
            _decode_score_gen(self.meta), "term string, doc_id long, contrib double"
        )

    @staticmethod
    def _fold_scores(
        contribs: DataFrame, terms_sorted: list[str], extra_keys: list[str] | None = None
    ) -> DataFrame:
        from sparkgrep.operators.score import fold_contribs

        keys = (extra_keys or []) + ["doc_id"]
        return fold_contribs(contribs, terms_sorted, keys=keys)

    # -- public API ---------------------------------------------------------

    def search(self, query_text: str, k: int = 10) -> DataFrame:
        """One query → (rank, doc_id, score); match-or-drop, ties by doc_id."""
        terms = sorted(set(tokenize_py(query_text, self.meta.analyzer)))
        if not terms:
            return self.spark.createDataFrame([], "rank int, doc_id long, score double")
        scored = self._fold_scores(self._contribs(terms), terms)
        top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
            "rank", "doc_id", "score"
        )

    def search_batch(self, queries: list[tuple[str, str, int]]) -> DataFrame:
        """[(query_id, query_text, k)] → (query_id, rank, doc_id, score).

        One postings scan serves all queries: decode each matched term
        once, then fan contributions out to the queries that contain the
        term via a broadcast join.
        """
        qterm_rows = []
        kmap = {}
        for qid, text, k in queries:
            kmap[qid] = k
            for t in sorted(set(tokenize_py(text, self.meta.analyzer))):
                qterm_rows.append((qid, t))
        if not qterm_rows:
            return self.spark.createDataFrame(
                [], "query_id string, rank int, doc_id long, score double"
            )
        by_query: dict[str, list[str]] = {}
        for qid, t in qterm_rows:
            by_query.setdefault(qid, []).append(t)

        # decode each matched term once, share across queries
        all_terms = sorted({t for _, t in qterm_rows})
        contribs = self._contribs(all_terms).persist()

        try:
            # one fold + top-k per query (small agg width each); union
            # children are independent subtrees, so Spark runs them
            # concurrently in the single collect action — results
            # bitwise-match search() per query
            parts = []
            for qid, terms in sorted(by_query.items()):
                scored = self._fold_scores(
                    contribs.filter(F.col("term").isin(terms)), terms
                )
                top = (
                    scored.orderBy(F.desc("score"), F.asc("doc_id"))
                    .limit(kmap[qid])
                    .withColumn("query_id", F.lit(qid))
                )
                parts.append(top)
            union = parts[0]
            for p in parts[1:]:
                union = union.unionByName(p)
            w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
            ranked = union.withColumn(
                "rank", F.row_number().over(w).cast("int")
            ).select("query_id", "rank", "doc_id", "score")
            # materialize eagerly (≤ Σk rows) so the shared cache can be
            # released NOW — otherwise repeated batch calls in a long-lived
            # serving session accumulate cached blocks in executor memory
            rows = ranked.collect()
            return self.spark.createDataFrame(
                rows, "query_id string, rank int, doc_id long, score double"
            )
        finally:
            contribs.unpersist()
