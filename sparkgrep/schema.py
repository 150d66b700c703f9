"""All engine schemas, declared explicitly (no inference in the engine).

The reference declares its schema as SQL DDL + dataclasses
(``message_manager.py:87-110``, ``types.py:4-12``); the engine's analogue
is these StructTypes. Arrays are native ArrayType (the reference
JSON-string-encodes arrays into SQLite TEXT, ``message_manager.py:171``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Engine input per BASELINE.json input_hint: Iceberg-shaped source-code
# table. The driver's documents.parquet maps onto it in sources/corpus.py.
CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("content", StringType(), True),
    ]
)

# Corpus + ingest-derived columns (deterministic doc_id, sha256 invariant).
INGESTED_SCHEMA = StructType(
    CORPUS_SCHEMA.fields
    + [
        StructField("doc_id", LongType(), False),
        StructField("content_sha256", StringType(), False),
    ]
)

# SPIMI segment output: one row per (doc, term) with the doc length
# carried along (computed locally in the same pass — saves the doc_len
# join at merge time; see operators/index_build.py).
TERM_FREQ_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tf", IntegerType(), False),
        StructField("dl", IntegerType(), False),
    ]
)

# SPIMI output with token positions (0-based, increasing) — feeds
# positions-enabled indexes for phrase queries. len(positions) == tf.
TERM_FREQ_POS_SCHEMA = StructType(
    TERM_FREQ_SCHEMA.fields
    + [StructField("positions", ArrayType(IntegerType()), False)]
)

# Multi-field SPIMI output (FTS5 multi-column analogue — the reference's
# FTS5 table indexes three columns, message_manager.py:101-110): one row
# per (doc, term, field). ``col`` is the field index; ``tf`` the term's
# frequency WITHIN that field; ``dl`` the doc's TOTAL token count across
# all indexed fields (FTS5's bm25 uses the unweighted row total — pinned
# against SQLite); positions are field-relative (they reset at each
# field start, so '^' anchors to a field's first token and phrases/NEAR
# never span fields — both pinned).
_COL_FIELD = [StructField("col", IntegerType(), False)]
TERM_FREQ_MC_SCHEMA = StructType(
    TERM_FREQ_SCHEMA.fields[:2] + _COL_FIELD + TERM_FREQ_SCHEMA.fields[2:]
)
TERM_FREQ_MC_POS_SCHEMA = StructType(
    TERM_FREQ_MC_SCHEMA.fields
    + [StructField("positions", ArrayType(IntegerType()), False)]
)

# Global term-partitioned postings index, bucketed by hash(term) for
# partition pruning at query time. doc_ids are delta(gap)+varint encoded;
# tfs and dls are varint encoded, all aligned by position. block_max holds
# per-block (BLOCK_SIZE postings) upper bounds of the BM25 term score at
# build-time (k1=1.2, b=0.75) for block-max WAND pruning.
POSTINGS_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("term", StringType(), False),
        StructField("df", LongType(), False),  # document frequency
        StructField("cf", LongType(), False),  # collection frequency (sum tf)
        StructField("doc_ids", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField("dls", BinaryType(), False),
        StructField("block_max", ArrayType(FloatType()), False),
    ]
)

# Per-doc stats table (doc length) written next to the index.
DOC_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("dl", IntegerType(), False),
    ]
)

# Query-set table (FIXTURES.md §2; reference analogue: Category rows fed
# into search_by_keywords, message_manager.py:225-231).
QUERY_SCHEMA = StructType(
    [
        StructField("query_id", StringType(), False),
        StructField("query_text", StringType(), False),
        StructField("k", IntegerType(), False),
    ]
)

# Search results (reference analogue: List[(Message, score)] from
# message_manager.py:258-263, re-expressed relationally).
RESULT_SCHEMA = StructType(
    [
        StructField("query_id", StringType(), False),
        StructField("rank", IntegerType(), False),
        StructField("doc_id", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)

# Per-segment build metrics / lineage manifest row (north-rule
# checkpoint + lineage requirement; SURVEY §7.6).
SEGMENT_MANIFEST_SCHEMA = StructType(
    [
        StructField("segment_id", StringType(), False),  # int for hash segments, "<batch>-<i>" for appends
        StructField("n_docs", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("n_postings", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("wall_time_sec", DoubleType(), False),
    ]
)
