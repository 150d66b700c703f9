"""Corpus statistics — single DataFrame aggregation pass (north star;
reference analogue: FTS5's internal per-column token counts + row count
that feed ``bm25()``, invisible behind ``message_manager.py:247-256``).

Produces the three artifacts BM25 needs:

- ``term_freqs(doc_id, term, tf, dl)`` — per-(doc, term) counts with the
  doc length carried along (so scoring never joins a separate doc_len
  table),
- ``doc_lengths(doc_id, dl)``,
- global ``N`` and ``avgdl``.

All aggregation is native Spark (partial/map-side combine comes free
from hash aggregate); tokenization is the only Python (analyzer UDF),
and zero Python at all under the `simple` analyzer.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkgrep.functions.tokenizer import tokens_col


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float
    total_tokens: int


def tokenized(corpus: DataFrame, analyzer: str = "simple", use_lang: bool = False) -> DataFrame:
    """corpus → (doc_id, tokens array, dl). One analyzer invocation per row."""
    lang = F.col("lang") if (use_lang and "lang" in corpus.columns) else None
    return corpus.select(
        "doc_id",
        tokens_col(F.col("content"), analyzer, lang=lang).alias("tokens"),
    ).withColumn("dl", F.size("tokens").cast("int"))


def term_freqs(corpus: DataFrame, analyzer: str = "simple", use_lang: bool = False) -> DataFrame:
    """(doc_id, term, tf, dl). The explode + groupBy(doc_id, term) is the
    engine's first wide stage; partial aggregation keeps the shuffle at
    ~unique-(doc,term) pairs, not raw token count."""
    tok = tokenized(corpus, analyzer, use_lang)
    return (
        tok.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"), F.first("dl").alias("dl"))
    )


def doc_lengths(corpus: DataFrame, analyzer: str = "simple", use_lang: bool = False) -> DataFrame:
    return tokenized(corpus, analyzer, use_lang).select("doc_id", "dl")


def corpus_stats(doc_lens: DataFrame) -> CorpusStats:
    row = doc_lens.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_tokens"),
    ).collect()[0]
    return CorpusStats(
        n_docs=int(row["n_docs"]),
        avgdl=float(row["avgdl"] or 0.0),
        total_tokens=int(row["total_tokens"] or 0),
    )


def doc_freqs(tf: DataFrame) -> DataFrame:
    """(term, df, cf) from term_freqs."""
    return tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").cast("long").alias("cf")
    )
