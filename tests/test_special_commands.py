"""FTS5 special commands 'delete-all', 'rebuild' and 'optimize'
(sqlite.org/fts5.html#special_insert_commands), probed on the installed
SQLite: 'delete-all' is legal exactly on external-content tables —
this engine's shape (postings in the index dir, content in the corpus
table) — and empties the index leaving the content; 'rebuild'
re-tokenizes the content under the table's own configuration;
'optimize' merges all structure into minimal form (the engine's
``compact_index``, aliased in the CLI). Configuration — including the
persisted rank function — survives all three.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkgrep.operators.index_build import build_index, load_meta
from sparkgrep.operators.query import InvertedIndex
from sparkgrep.plans.manifest import (
    append_batch_delta,
    delete_all,
    delete_batch_delta,
    rebuild,
    set_rank,
)
from sparkgrep.sources.corpus import synth_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_corpus(spark, 200, seed=13).cache()
    docs.count()
    return docs


def _results(spark, out, q="hash join table"):
    return [tuple(r) for r in InvertedIndex(spark, out).search(q, k=20).collect()]


def test_delete_all_empties_keeps_config(spark, corpus, tmp_path):
    out = str(tmp_path / "idx")
    build_index(
        corpus, out, analyzer="fts5", n_buckets=4,
        store_positions=True, prefix=[2],
    )
    assert _results(spark, out)
    meta = delete_all(spark, out)
    assert meta.n_docs == 0 and meta.total_tokens == 0
    # config survives
    assert meta.analyzer == "fts5" and meta.has_positions
    assert tuple(meta.prefix) == (2,)
    idx = InvertedIndex(spark, out)
    assert idx.search("hash join table", k=20).count() == 0
    assert idx.search_expr('"hash join" OR wind*', k=20).count() == 0
    # appends after delete-all work normally (fresh delta layer)
    append_batch_delta(corpus.filter("doc_id < 50"), out, "b1")
    out2 = str(tmp_path / "want")
    build_index(
        corpus.filter("doc_id < 50"), out2, analyzer="fts5",
        n_buckets=4, store_positions=True, prefix=[2],
    )
    got = _results(spark, out)
    want = _results(spark, out2)
    assert got == want and got


def test_delete_all_on_layered_index(spark, corpus, tmp_path):
    """delete-all folds away deltas AND tombstones; manifest lineage is
    reset so batch ids can be reused against the fresh generation."""
    out = str(tmp_path / "idx")
    build_index(corpus.filter("doc_id < 100"), out, analyzer="simple", n_buckets=4)
    append_batch_delta(corpus.filter("doc_id >= 100"), out, "b1")
    delete_batch_delta(corpus.filter("doc_id < 20"), out, "d1")
    meta = delete_all(spark, out)
    assert meta.n_docs == 0
    assert not meta.layers and not meta.tombstones
    # the SAME batch id indexes again (old lineage is gone)
    append_batch_delta(corpus.filter("doc_id >= 100"), out, "b1")
    assert InvertedIndex(spark, out).meta.n_docs == 100


def test_rebuild_reindexes_under_own_config(spark, corpus, tmp_path):
    out = str(tmp_path / "idx")
    mc = corpus.withColumn("meta", F.concat_ws(" ", "lang", "path"))
    build_index(
        mc.filter("doc_id < 120"), out, analyzer="simple",
        fields=["meta", "content"], n_buckets=4, detail="column",
    )
    set_rank(out, "bm25(3.0, 1.0)")
    append_batch_delta(mc.filter("doc_id >= 120"), out, "b1")
    # rebuild over a DIFFERENT corpus slice: config kept, content swapped
    meta = rebuild(mc.filter("doc_id < 150"), out)
    assert meta.n_docs == 150
    assert tuple(meta.fields) == ("meta", "content")
    assert meta.detail == "column"
    assert tuple(meta.rank_weights) == (3.0, 1.0)
    out2 = str(tmp_path / "want")
    build_index(
        mc.filter("doc_id < 150"), out2, analyzer="simple",
        fields=["meta", "content"], n_buckets=4, detail="column",
    )
    got = InvertedIndex(spark, out).search_expr("en OR scan", k=20).toPandas()
    want = InvertedIndex(spark, out2).search_expr(
        "en OR scan", k=20, weights=[3.0, 1.0]
    ).toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert (got["score"].to_numpy() == want["score"].to_numpy()).all()


def test_cli_delete_all_rebuild_optimize(spark, corpus, tmp_path):
    from sparkgrep.cli import main

    out = str(tmp_path / "idx")
    build_index(corpus, out, analyzer="simple", n_buckets=4)
    main(["delete-all", "--index", out], spark=spark)
    assert load_meta(out).n_docs == 0
    main(["rebuild", "--index", out, "--input", "/root/testdata/sf0.001"],
         spark=spark)
    assert load_meta(out).n_docs > 0
    append_batch_delta(
        synth_corpus(spark, 10, seed=99).withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        ),
        out, "b1",
    )
    main(["optimize", "--index", out], spark=spark)  # compact alias
    m = load_meta(out)
    assert not m.layers and not m.tombstones
