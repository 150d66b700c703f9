"""The reference's top-level user-facing operation, composed end-to-end:
the 4-phase classification cascade
(``classifier/classification_service.py:47-134``, orchestrated by
``orchestrator.py:57-100``), with the BM25 candidate tier the reference
designed but left dormant (``classification_service.py:151``,
``config/settings.py:17`` CANDIDATE_LIMIT_BM25=50) promoted to the
candidate generator — this engine's whole product.

Phases (reference file:line cited per step):

1. **Candidate generation** — top-k BM25 retrieval per category
   (``_generate_candidates``, classification_service.py:136-162; k from
   CANDIDATE_LIMIT_BM25): one batched index scan serves every category
   (``InvertedIndex.search_batch``).
2. **Rescoring** — the reference's cross-encoder
   (classification_service.py:75-82; model tier X2, out of lexical
   scope): a PLUGGABLE ``rescorer(DataFrame) -> DataFrame`` seam; the
   default is the identity on the BM25 score (exactly the reference's
   own CROSS_ENCODER_ENABLED=False fallback, which "uses the initial
   scores for partitioning").
3. **Threshold partitioning** —
   ``fixed_threshold_partitioner.py:32-90``: sigmoid with clip(±500)
   (F6), per-category 85th/15th EXACT linear-interpolated percentiles
   over candidate probs (A5; np.percentile ≡ Spark ``percentile`` ≡
   DuckDB ``quantile_cont``), then ``prob >= high → high_confidence``,
   ``prob <= low → low_confidence``, else grey (the reference's exact
   comparison operators).
4. **Grey-area validation** — the reference's LLM tier
   (classification_service.py:115-120; X3, out of scope): a pluggable
   ``validator(DataFrame) -> DataFrame`` adding ``is_in`` for grey rows;
   the default is the deterministic ``prob >= 0.5`` rule (documented
   stub — a real deployment plugs a model UDF here).
5. **Defaults** — docs absent from the candidate set classified FALSE
   (classification_service.py:122-131; SURVEY P6 ``left_anti``).

``classification_summary`` mirrors ``orchestrator.py:77-100`` (A3):
single-pass conditional counts per category.

Everything is one declarative DataFrame plan per phase: the candidate
cut is a broadcast-joined rank window, the percentile pass groups k≤50
rows per category, defaults are an anti-join against the (tiny,
broadcast) candidate set — no driver-side loops, no collect besides the
batched search's bounded top-k.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sigmoid(col):
    # reference F6: sigmoid with clip(±500), fixed_threshold_partitioner.py:84-90
    return 1.0 / (1.0 + F.exp(-F.greatest(F.lit(-500.0), F.least(F.lit(500.0), col))))


def classify_cascade(
    index,
    corpus: DataFrame,
    categories: list[tuple[str, str]],
    k_candidates: int = 50,
    high_percentile: float = 0.85,
    low_percentile: float = 0.15,
    rescorer: Callable[[DataFrame], DataFrame] | None = None,
    validator: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Run the 4-phase cascade for every (slug, query_text) category over
    ``corpus`` (must carry doc_id) using ``index``
    (:class:`~sparkgrep.operators.query.InvertedIndex` over the same
    corpus).

    Returns one row per (category, doc) with columns
    ``(category, doc_id, phase, score, prob, is_in)``:
    phase ∈ {high_confidence, grey_area, low_confidence, default};
    ``score`` is the (re)scored candidate score (null for defaults),
    ``prob`` its sigmoid; ``is_in`` the final verdict.
    """
    spark = corpus.sparkSession

    # phase 1: BM25 candidates, one batched scan for all categories
    cands = index.search_batch(
        [(slug, text, k_candidates) for slug, text in categories]
    ).select(F.col("query_id").alias("category"), "doc_id", "score")

    # phase 2: pluggable rescorer (default: identity on the BM25 score —
    # the reference's cross-encoder-disabled fallback)
    if rescorer is not None:
        cands = rescorer(cands)
    # the candidate relation feeds THREE branches of the returned plan
    # (threshold aggregation, partition join, phase-5 anti-join): left
    # lazy, every evaluation re-ran the whole batched index scan per
    # branch. Bounded at k_candidates × len(categories) rows; the
    # broadcast-threshold job populates the cache before the main job
    # reads it. No sound unpersist point for a lazily-returned plan.
    cands = cands.persist()

    # phase 3: sigmoid + per-category exact percentile thresholds
    probs = cands.withColumn("prob", _sigmoid(F.col("score")))
    thr = probs.groupBy("category").agg(
        F.expr(f"percentile(prob, {high_percentile})").alias("hi"),
        F.expr(f"percentile(prob, {low_percentile})").alias("lo"),
    )
    parted = probs.join(F.broadcast(thr), "category").withColumn(
        "phase",
        F.when(F.col("prob") >= F.col("hi"), F.lit("high_confidence"))
        .when(F.col("prob") <= F.col("lo"), F.lit("low_confidence"))
        .otherwise(F.lit("grey_area")),
    )

    # phase 4: verdicts — high TRUE / low FALSE automatically; grey via
    # the pluggable validator (default deterministic prob >= 0.5 stub)
    if validator is None:
        verdicts = parted.withColumn(
            "is_in",
            F.when(F.col("phase") == "high_confidence", F.lit(True))
            .when(F.col("phase") == "low_confidence", F.lit(False))
            .otherwise(F.col("prob") >= F.lit(0.5)),
        )
    else:
        auto = parted.filter(F.col("phase") != "grey_area").withColumn(
            "is_in", F.col("phase") == "high_confidence"
        )
        grey = validator(parted.filter(F.col("phase") == "grey_area"))
        verdicts = auto.unionByName(grey)

    # phase 5: not-in-candidates defaults (P6) — FALSE for every
    # (category, doc) pair without a candidate row
    cat_df = spark.createDataFrame(
        [(slug,) for slug, _ in categories], "category string"
    )
    all_pairs = corpus.select("doc_id").crossJoin(F.broadcast(cat_df))
    defaults = (
        all_pairs.join(
            F.broadcast(verdicts.select("category", "doc_id")),
            ["category", "doc_id"],
            "left_anti",
        )
        .withColumn("phase", F.lit("default"))
        .withColumn("score", F.lit(None).cast("double"))
        .withColumn("prob", F.lit(None).cast("double"))
        .withColumn("is_in", F.lit(False))
    )
    cols = ["category", "doc_id", "phase", "score", "prob", "is_in"]
    return verdicts.select(*cols).unionByName(defaults.select(*cols))


def classification_summary(results: DataFrame) -> DataFrame:
    """Per-category conditional counts in one aggregation pass
    (reference ``orchestrator.py:77-100``, SURVEY A3): total docs,
    in/not-in verdicts, candidate count, and per-phase counts."""
    return results.groupBy("category").agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("is_in"), 1).otherwise(0)).cast("long").alias("in_category"),
        F.sum(F.when(~F.col("is_in"), 1).otherwise(0)).cast("long").alias("not_in_category"),
        F.sum(F.when(F.col("phase") != "default", 1).otherwise(0))
        .cast("long")
        .alias("candidates"),
        F.sum(F.when(F.col("phase") == "high_confidence", 1).otherwise(0))
        .cast("long")
        .alias("high_confidence"),
        F.sum(F.when(F.col("phase") == "grey_area", 1).otherwise(0))
        .cast("long")
        .alias("grey_area"),
        F.sum(F.when(F.col("phase") == "low_confidence", 1).otherwise(0))
        .cast("long")
        .alias("low_confidence"),
    )
