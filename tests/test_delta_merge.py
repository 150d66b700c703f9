"""Incremental delta-layer merging — FTS5's 'merge'/'automerge'
analogue (sqlite.org/fts5.html#the_merge_command) at the LSM-layer
level: ``merge_delta_layers`` folds runs of delta layers together at
O(sum of merged deltas) cost, never touching the base layer — contrast
``compact_index``'s O(total index) rewrite. Runs are delimited by
tombstone cuts so every tombstone masks all-or-none of a merged layer
and the negated-df sidecar accounting stays exact.

The invariants pinned here: base postings files byte-untouched, every
query family bit-identical before/after (and to a from-scratch build),
tombstone cut remapping preserves delete/update semantics, appends
after a merge keep working, and a final compaction still equals a
from-scratch build.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sparkgrep.operators.index_build import build_index
from sparkgrep.operators.query import InvertedIndex
from sparkgrep.plans.manifest import (
    _delta_merge_groups,
    append_batch_delta,
    compact_index,
    delete_batch_delta,
    merge_delta_layers,
)
from sparkgrep.sources.corpus import synth_corpus

EXPR_QS = [
    '"hash join" OR window',
    "hash NOT window",
    "wind* scan",
    "NEAR(hash window, 4)",
    "^the scan",
    "the",
]


def _file_state(d):
    out = {}
    for root, _dirs, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            out[p] = (os.path.getsize(p), os.path.getmtime(p))
    return out


def _snap(idx, k=30):
    out = {}
    for q in EXPR_QS:
        pdf = idx.search_expr(q, k=k).toPandas()
        out[q] = (pdf["doc_id"].tolist(), pdf["score"].tolist())
    return out


def _assert_same(idx, want_idx, k=30):
    a, b = _snap(idx, k), _snap(want_idx, k)
    for q in EXPR_QS:
        assert a[q] == b[q], q


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_corpus(spark, 500, seed=47).cache()
    docs.count()
    return docs


@pytest.fixture(scope="module")
def layered3(spark, corpus, tmp_path_factory):
    """Base over docs<200, then three delta appends (no tombstones)."""
    out = str(tmp_path_factory.mktemp("dm") / "idx")
    build_index(
        corpus.filter("doc_id < 200"), out,
        analyzer="simple", n_buckets=4, store_positions=True,
    )
    for lo, hi, bid in ((200, 300, "b1"), (300, 400, "b2"), (400, 500, "b3")):
        append_batch_delta(
            corpus.filter(f"doc_id >= {lo} and doc_id < {hi}"), out, bid
        )
    return out


@pytest.fixture(scope="module")
def fullidx(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dmfull") / "idx")
    build_index(corpus, out, analyzer="simple", n_buckets=4, store_positions=True)
    return InvertedIndex(spark, out)


def test_merge_folds_deltas_base_untouched(spark, layered3, fullidx):
    out = layered3
    base_before = _file_state(f"{out}/postings")
    pre = _snap(InvertedIndex(spark, out))
    meta = merge_delta_layers(spark, out)
    # three deltas collapse into ONE merged layer; base files untouched
    assert len(meta.layers) == 1 and meta.layers[0].startswith("delta/m")
    assert _file_state(f"{out}/postings") == base_before
    idx = InvertedIndex(spark, out)
    assert len(idx.layer_dirs) == 2
    post = _snap(idx)
    assert post == pre
    _assert_same(idx, fullidx)
    # global root stats are untouched by the physical reorganization
    assert meta.n_docs == fullidx.meta.n_docs
    assert meta.avgdl == fullidx.meta.avgdl
    # merged sidecar df per term == sum of the member layers' dfs ==
    # the union batch's true df (disjoint doc_ids): spot-check vs a
    # from-scratch sidecar restricted to the delta corpus
    got = dict(
        spark.read.parquet(f"{out}/{meta.layers[0]}/term_ubs")
        .filter(~F.col("term").startswith("\x02"))
        .select("term", "df").collect()
    )
    assert got and all(df > 0 for df in got.values())
    # layer_stats snapshot covers base + merged layer with exact counts
    assert len(meta.layer_stats) == 2
    assert meta.layer_stats[1][0] == 300


def test_merge_is_idempotent_and_noop_on_single_delta(spark, corpus, tmp_path):
    out = str(tmp_path / "idx")
    build_index(
        corpus.filter("doc_id < 400"), out, analyzer="simple", n_buckets=4
    )
    append_batch_delta(corpus.filter("doc_id >= 400"), out, "b1")
    m1 = merge_delta_layers(spark, out)  # one delta: nothing mergeable
    assert tuple(m1.layers) == ("delta/00000",)
    m2 = merge_delta_layers(spark, out)
    assert tuple(m2.layers) == tuple(m1.layers)


def test_merge_respects_tombstone_cuts(spark, corpus, tmp_path):
    """Deltas separated by a tombstone cut must NOT merge across it:
    base, d1, DELETE(docs in base+d1), d2, d3 → groups [d1], [d2+d3].
    The remapped cut keeps the deleted docs dead and the re-appended
    (updated) doc serving its new version."""
    out = str(tmp_path / "idx")
    build_index(
        corpus.filter("doc_id < 200"), out,
        analyzer="simple", n_buckets=4, store_positions=True,
    )
    append_batch_delta(corpus.filter("doc_id >= 200 and doc_id < 300"), out, "b1")
    # delete 40 base docs and 20 delta-1 docs (content batch = originals)
    doomed = corpus.filter(
        "(doc_id >= 100 and doc_id < 140) or (doc_id >= 220 and doc_id < 240)"
    )
    delete_batch_delta(doomed, out, "d1")
    # UPDATE: re-append doc 100 with NEW content in d2
    updated = (
        corpus.filter("doc_id = 100")
        .withColumn("content", F.lit("freshly rewritten hash window content"))
    )
    append_batch_delta(
        corpus.filter("doc_id >= 300 and doc_id < 400").unionByName(updated),
        out, "b2",
    )
    append_batch_delta(corpus.filter("doc_id >= 400"), out, "b3")

    meta0 = InvertedIndex(spark, out).meta
    assert _delta_merge_groups(meta0) == [[1], [2, 3]]
    pre = _snap(InvertedIndex(spark, out))
    meta = merge_delta_layers(spark, out)
    # d1 survives alone; d2+d3 merged; cut remapped to mask base+d1 only
    assert len(meta.layers) == 2
    assert meta.layers[0] == meta0.layers[0]
    assert meta.layers[1].startswith("delta/m")
    assert meta.tombstone_cuts == (2,)
    idx = InvertedIndex(spark, out)
    assert _snap(idx) == pre

    # equals a from-scratch build over the post-CDC corpus
    expect = (
        corpus.filter(
            "not ((doc_id >= 100 and doc_id < 140) or "
            "(doc_id >= 220 and doc_id < 240))"
        )
        .unionByName(updated)
    )
    out2 = str(tmp_path / "want")
    build_index(expect, out2, analyzer="simple", n_buckets=4, store_positions=True)
    _assert_same(idx, InvertedIndex(spark, out2))
    # the updated doc serves its NEW content
    got = idx.search_expr('"freshly rewritten"', k=5).toPandas()
    assert got["doc_id"].tolist() == [100]


def test_append_after_merge_and_compaction_matches_scratch(
    spark, corpus, fullidx, tmp_path
):
    out = str(tmp_path / "idx")
    build_index(
        corpus.filter("doc_id < 200"), out,
        analyzer="simple", n_buckets=4, store_positions=True,
    )
    append_batch_delta(corpus.filter("doc_id >= 200 and doc_id < 300"), out, "b1")
    append_batch_delta(corpus.filter("doc_id >= 300 and doc_id < 400"), out, "b2")
    merge_delta_layers(spark, out)
    # append lands in a fresh slot (numeric naming skips live dirs)
    meta = append_batch_delta(corpus.filter("doc_id >= 400"), out, "b3")
    assert len(meta.layers) == 2
    idx = InvertedIndex(spark, out)
    _assert_same(idx, fullidx)
    # a second merge folds merged+new together; compaction then equals
    # the from-scratch single-layer build bit-for-bit
    meta2 = merge_delta_layers(spark, out)
    assert len(meta2.layers) == 1
    _assert_same(InvertedIndex(spark, out), fullidx)
    compact_index(spark, out)
    idx3 = InvertedIndex(spark, out)
    assert not idx3.is_layered
    _assert_same(idx3, fullidx)


def test_stream_merge_every_bounds_layers(spark, corpus, tmp_path):
    """index_stream(merge_every=2): the automerge analogue keeps the
    unmerged layer count bounded while results stay exact."""
    from sparkgrep.streaming.ingest import index_stream

    src_dir = str(tmp_path / "src")
    corpus.select("doc_id", "content", "lang").coalesce(4).write.json(src_dir)
    stream = (
        spark.readStream.schema("doc_id long, content string, lang string")
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    out = str(tmp_path / "idx")
    q = index_stream(
        stream, out, analyzer="simple", n_buckets=4,
        checkpoint_dir=str(tmp_path / "ckpt"), merge_every=2,
    )
    q.awaitTermination(180)
    meta = InvertedIndex(spark, out).meta
    assert len(meta.layers) <= 2  # merged down every 2 layers
    out2 = str(tmp_path / "want")
    build_index(corpus, out2, analyzer="simple", n_buckets=4)
    for mode in ("or", "and"):
        got = InvertedIndex(spark, out).search(
            "hash join table", k=30, mode=mode
        ).toPandas()
        want = InvertedIndex(spark, out2).search(
            "hash join table", k=30, mode=mode
        ).toPandas()
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert (got["score"].to_numpy() == want["score"].to_numpy()).all()
