"""Corpus ingest: doc_id derivation, sha256 invariant gate, documents→
corpus mapping, and the distributed synthetic generator's determinism."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sparkgrep.sources.corpus import (
    assert_content_hashes,
    documents_as_corpus,
    load_documents,
    synth_code_corpus,
    with_ingest_columns,
)

SF = "/root/testdata/sf0.001"


def test_documents_mapping(spark):
    corpus = documents_as_corpus(load_documents(spark, SF))
    assert set(corpus.columns) == {"repo", "path", "commit", "lang", "content", "doc_id"}
    r = corpus.filter("doc_id = 7").collect()[0]
    assert r["path"] == "src/file_7.py" and len(r["commit"]) == 40


def test_sha256_matches_hashlib(spark):
    ing = with_ingest_columns(documents_as_corpus(load_documents(spark, SF)))
    rows = ing.select("content", "content_sha256").limit(5).collect()
    for r in rows:
        assert r["content_sha256"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_doc_id_derivation_when_absent(spark):
    df = spark.createDataFrame(
        [("r", "b.py", "c1", "py", "x"), ("r", "a.py", "c1", "py", "y")],
        "repo string, path string, commit string, lang string, content string",
    )
    out = with_ingest_columns(df).orderBy("doc_id").collect()
    # total order over (repo, path, commit): a.py before b.py
    assert [r["path"] for r in out] == ["a.py", "b.py"]
    assert [r["doc_id"] for r in out] == [0, 1]


def test_assert_content_hashes_gate(spark):
    ing = with_ingest_columns(documents_as_corpus(load_documents(spark, SF)))
    expected = ing.select("doc_id", "content_sha256")
    assert_content_hashes(ing, expected)  # passes silently
    tampered = expected.withColumn(
        "content_sha256",
        F.when(F.col("doc_id") == 3, F.lit("0" * 64)).otherwise(F.col("content_sha256")),
    )
    with pytest.raises(AssertionError, match="sha256 mismatch"):
        assert_content_hashes(ing, tampered)


def test_synth_code_corpus_partitioning_invariant(spark):
    a = (
        synth_code_corpus(spark, 60, seed=9)
        .select("doc_id", "content_sha256")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        synth_code_corpus(spark, 60, seed=9)
        .repartition(11)
        .select("doc_id", "content_sha256")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # different seed → different corpus
    c = synth_code_corpus(spark, 60, seed=10).select("content_sha256").toPandas()
    assert set(c["content_sha256"]) != set(a["content_sha256"])
