"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All native
Spark SQL expressions (zero Python in the hot path), each mirrored by a
DuckDB oracle in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkgrep.functions.tokenizer import simple_tokens_col
from sparkgrep.operators.dedup import shingles

# Tiny deterministic stopword profiles (heuristic language ID by token
# overlap; argmax with ties broken by language code).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "for", "it"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
    "es": ["el", "la", "de", "y", "un", "una", "es", "que", "por", "en"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "dass", "für", "in"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "人", "这"],
}

EN_STOPWORDS = LANG_PROFILES["en"] + ["on", "as", "at", "by", "an", "be", "this", "with"]

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws, n_bpe): whitespace tokens + BPE-ish regex tokens."""
    return docs.select(
        "doc_id",
        F.size(F.array_remove(F.split(F.col(text_col), "\\s+"), "")).alias("n_ws"),
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_RE), 0)).alias(
            "n_bpe"
        ),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, stop_ratio, mean_tok_len, score):
    cheap lexical quality heuristics (C4/Gopher-style rules re-expressed
    relationally). score ∈ [0,1], higher = better."""
    toks = docs.select(
        "doc_id",
        F.length(F.col(text_col)).alias("n_chars"),
        simple_tokens_col(F.col(text_col)).alias("toks"),
    )
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    feat = toks.select(
        "doc_id",
        "n_chars",
        F.size("toks").alias("n_tokens"),
        (F.size(F.filter("toks", lambda t: F.array_contains(stop_arr, t)))
         / F.greatest(F.size("toks"), F.lit(1))).alias("stop_ratio"),
        (F.aggregate("toks", F.lit(0.0), lambda acc, t: acc + F.length(t))
         / F.greatest(F.size("toks"), F.lit(1))).alias("mean_tok_len"),
    )
    # score: reward in-range length, stopword presence, sane token length
    return feat.withColumn(
        "score",
        F.round(
            F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0)) * F.lit(0.4)
            + F.least(F.col("stop_ratio") * F.lit(5.0), F.lit(1.0)) * F.lit(0.3)
            + F.when(
                (F.col("mean_tok_len") >= 3) & (F.col("mean_tok_len") <= 10), F.lit(0.3)
            ).otherwise(F.lit(0.0)),
            6,
        ),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang): argmax of stopword-profile overlap counts
    (duplicates counted), ties broken by language code asc."""
    toks = docs.select("doc_id", simple_tokens_col(F.col(text_col)).alias("toks"))

    def _contains(words):
        arr = F.array(*[F.lit(w) for w in words])
        return lambda t: F.array_contains(arr, t)

    scores = [
        F.struct(
            F.size(F.filter("toks", _contains(ws))).alias("n"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(LANG_PROFILES.items())
    ]
    # array_max on struct(n, lang): max n, then max lang — to get tie-break
    # by lang ASC we compare on (n, negated-rank) instead: sort desc by n
    # then asc by lang via sort_array of (−n ordering emulated with struct)
    ranked = F.reverse(F.array_sort(F.array(*scores)))  # desc by (n, lang)
    # ties on n: reverse(sort) yields the LARGEST lang first; to break ties
    # by lang asc, filter to max n then take array_min of langs
    maxn = ranked[0]["n"]
    return toks.select(
        "doc_id",
        F.array_min(
            F.transform(
                F.filter(F.array(*scores), lambda s: s["n"] == maxn),
                lambda s: s["lang"],
            )
        ).alias("pred_lang"),
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 3, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp): winnowing fingerprints (Schleimer et al., SIGMOD'03):
    md5 each k-token shingle, take the min hash in every sliding window
    of w consecutive shingles, emit distinct mins. Pure window functions
    — identical construction in the DuckDB oracle."""
    sh = shingles(docs, k, text_col).withColumn("h", F.md5("shingle"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    cnt = Window.partitionBy("doc_id")
    out = (
        sh.withColumn("n_sh", F.count("*").over(cnt))
        .withColumn("fp", F.min("h").over(win))
        # only full windows: pos ≤ n_sh - w + 1
        .filter(F.col("pos") <= F.col("n_sh") - w + 1)
        .select("doc_id", "fp")
        .distinct()
    )
    return out
