"""Exact Okapi BM25 scoring + top-k over the term-frequency DataFrame.

Reference behavior being reproduced: ``search_by_keywords``
(``message_manager.py:225-264``): tokenize query with the same analyzer
as the index, drop docs with no matching term (``message_manager.py:240``
— match-or-drop, inner-join semantics), score with BM25 (SQLite default
k1=1.2, b=0.75), top-k by rank. Sign convention: FTS5 emits
negative-is-better and sorts ASC (``message_manager.py:246``); the engine
emits positive-is-better and sorts DESC — score_engine = -score_fts5.

Determinism contract (SURVEY §7.4): per-term contributions are summed in
sorted term order via ``aggregate(array_sort(collect_list(...)))`` so the
floating-point result is independent of partitioning/parallelism; ties
broken (score desc, doc_id asc).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkgrep import BM25_B, BM25_K1
from sparkgrep.functions.tokenizer import tokenize_py
from sparkgrep.operators.stats import CorpusStats


def idf(n_docs: int, df: int, variant: str = "okapi") -> float:
    """okapi: ln((N-df+0.5)/(df+0.5)) — raw Okapi (can go negative for
    df>N/2). fts5: same but clamped to 1e-6 when ≤0, which is what
    SQLite's bm25() actually computes (verified empirically in
    tests/test_fts5_parity.py — reference message_manager.py:246 relies
    on it). lucene: ln(1+x) — non-negative, preferred at scale."""
    x = (n_docs - df + 0.5) / (df + 0.5)
    if variant == "okapi":
        return math.log(x)
    if variant == "fts5":
        # df can exceed n_docs for prefix-MARKER sidecar rows on a
        # tombstoned index (markers carry no tombstone correction by
        # design; the marker QUERY path derives df from the masked
        # decode and never reads this) — reach the clamp before the log
        # leaves its domain instead of raising. Impossible for real
        # terms (their sidecar dfs are tombstone-corrected), so scoring
        # is unchanged.
        if x <= 0.0:
            return 1e-6
        v = math.log(x)
        return v if v > 0.0 else 1e-6
    if variant == "lucene":
        return math.log1p(x)
    raise ValueError(f"unknown idf variant {variant!r}")


def bm25_contrib_col(tf, dl, idf_col, avgdl: float, k1: float = BM25_K1, b: float = BM25_B):
    """Per-(doc, term) BM25 contribution as a native Column expression."""
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
    return idf_col * (tf * F.lit(k1 + 1.0)) / denom


def fold_contribs(
    contribs: DataFrame, terms_sorted: list[str], keys: list[str] | None = None
) -> DataFrame:
    """Sum per-term contributions into a score, deterministically.

    One conditional-sum aggregate per query term (exactly one contrib row
    exists per (doc, term), so ``sum(when(term=t, contrib))`` is that
    value or NULL), then a left-associated add in sorted term order with
    ``coalesce(_, 0.0)``. Bitwise-equal to folding the present terms in
    sorted order (x + 0.0 == x for finite nonzero x), but stays in
    whole-stage-codegen HashAggregate — no collect_list/ObjectHashAggregate
    on the serving path.
    """
    keys = keys or ["doc_id"]
    aggs = [
        F.sum(F.when(F.col("term") == t, F.col("contrib"))).alias(f"_c{i}")
        for i, t in enumerate(terms_sorted)
    ]
    g = contribs.groupBy(*keys).agg(*aggs)
    expr = None
    for i in range(len(terms_sorted)):
        c = F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
        expr = c if expr is None else expr + c
    return g.select(*keys, expr.alias("score"))


def score_query(
    tf: DataFrame,
    stats: CorpusStats,
    query_text: str,
    analyzer: str = "simple",
    k1: float = BM25_K1,
    b: float = BM25_B,
    idf_variant: str = "okapi",
) -> DataFrame:
    """Score ONE query against term_freqs(doc_id, term, tf, dl) →
    (doc_id, score). Docs matching no query term are absent (P5).

    Plan shape: broadcast the tiny (term, idf) side into the big tf
    relation (inner broadcast-hash join — no shuffle of the corpus side),
    then one hash aggregate on doc_id.
    """
    qterms = sorted(set(tokenize_py(query_text, analyzer)))
    if not qterms:
        # FTS5 raises on an empty MATCH (test_message_manager.py:599-610);
        # relationally the engine returns an empty result instead.
        return tf.sparkSession.createDataFrame([], "doc_id long, score double")

    spark = tf.sparkSession
    # df per query term: one small aggregate over the filtered tf relation
    dfs = {
        r["term"]: r["df"]
        for r in tf.filter(F.col("term").isin(qterms))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    }
    idf_rows = [
        (t, float(idf(stats.n_docs, dfs[t], idf_variant))) for t in qterms if t in dfs
    ]
    if not idf_rows:
        return spark.createDataFrame([], "doc_id long, score double")
    idf_df = spark.createDataFrame(idf_rows, "term string, idf double")

    contrib = (
        tf.join(F.broadcast(idf_df), "term")  # inner join = match-or-drop (P5)
        .withColumn(
            "contrib",
            bm25_contrib_col(F.col("tf"), F.col("dl"), F.col("idf"), stats.avgdl, k1, b),
        )
    )
    return fold_contribs(contrib, [t for t, _ in idf_rows])


def topk(scored: DataFrame, k: int) -> DataFrame:
    """(doc_id, score) → (rank, doc_id, score), rank 1-based, ties by
    ascending doc_id. orderBy+limit compiles to TakeOrderedAndProject —
    per-partition top-k then a k-row merge, the distributed top-k."""
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "doc_id", "score"
    )


def search(
    tf: DataFrame,
    stats: CorpusStats,
    query_text: str,
    k: int = 10,
    analyzer: str = "simple",
    **kw,
) -> DataFrame:
    """End-to-end exact path: reference `search_by_keywords` semantics."""
    return topk(score_query(tf, stats, query_text, analyzer, **kw), k)


def join_back(results: DataFrame, corpus: DataFrame) -> DataFrame:
    """R7: hit join-back to full rows (reference JOIN messages,
    message_manager.py:250-252). The top-k side is tiny → broadcast it."""
    return corpus.join(F.broadcast(results), "doc_id").orderBy("rank")
