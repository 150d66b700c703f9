"""MaxScore pruning over LAYERED (delta + tombstone) indexes.

A layer's term_ubs sidecar stores idf_L·max(tfcomp_L) computed with
LAYER-local stats; the reader rescales it into a GLOBAL-sound bound
(query.py ``_fold_sidecar_rows``: divide out idf_L, inflate by
max(1, avgdl_g/avgdl_L), multiply the global idf back in), so pruned
serving stays available between compactions — a streaming-maintained
index no longer loses MaxScore until compaction — and remains
bitwise-identical to the exact path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkgrep.operators.query import InvertedIndex
from sparkgrep.operators.score import idf as idf_fn
from sparkgrep.operators.wand import plan_pruned, search_pruned
from sparkgrep.plans.manifest import append_batch_delta, delete_batch_delta

QUERIES = [
    "parse json config",
    "hash join build side",
    "varint codec shard",
    "scan filter sort spill batch",
    "zqzq nothing",
]


@pytest.fixture(scope="module")
def layered(spark, code_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wand_layered") / "idx")
    b0 = code_corpus.filter("doc_id < 180")
    # tripled content: a delta layer whose LOCAL avgdl is far above the
    # global one — exercises the avgdl inflation branch of the rescale
    b1 = code_corpus.filter("doc_id >= 180 and doc_id < 240").withColumn(
        "content", F.concat_ws(" ", "content", "content", "content")
    )
    gone = code_corpus.filter("doc_id >= 40 and doc_id < 70")
    b2 = code_corpus.filter("doc_id >= 240")
    append_batch_delta(
        b0, out, batch_id="b0", analyzer="code", n_buckets=8,
        idf_variant="lucene", postings_per_shard=100,
    )
    append_batch_delta(b1, out, batch_id="b1")
    delete_batch_delta(gone, out, batch_id="b2")
    append_batch_delta(b2, out, batch_id="b3")
    return InvertedIndex(spark, out)


def test_layered_pruning_enabled(layered):
    assert layered.is_layered
    assert layered.pruning_sound  # layer_stats snapshots present
    assert len(layered.layer_dirs) == 3 and len(layered.tomb_dirs) == 1
    from sparkgrep.functions.tokenizer import tokenize_py

    engaged = [
        q for q in QUERIES
        if plan_pruned(layered, sorted(set(tokenize_py(q, "code"))), 10)
        is not None
    ]
    assert engaged, "no query engaged the MaxScore planner on the layered index"


def test_layered_ubs_bound_every_live_contribution(layered):
    """Direct soundness pin: for every term, the rescaled sidecar ub must
    dominate the true maximum BM25 contribution over the LIVE postings
    (deleted docs masked), computed with the global stats the exact
    scorer uses. The stored per-layer ub is rounded UP to float32, which
    dwarfs the float64 rescale ulps — a 1e-9 relative slack is safe."""
    meta = layered.meta
    raw = layered.decode_raw().toPandas()
    terms = sorted(raw["term"].unique())
    ubmap = layered.term_ubs(terms)
    assert set(terms) <= set(ubmap)
    for t, grp in raw.groupby("term"):
        df, ub = ubmap[t]
        assert df == grp["doc_id"].nunique(), t  # exact live df
        idf = idf_fn(meta.n_docs, df, meta.idf_variant)
        tfs = grp["tf"].to_numpy(dtype=float)
        dls = grp["dl"].to_numpy(dtype=float)
        contrib = idf * tfs * (meta.k1 + 1.0) / (
            tfs + meta.k1 * ((1.0 - meta.b) + meta.b * dls / meta.avgdl)
        )
        assert contrib.max() <= ub * (1.0 + 1e-9), t


@pytest.mark.parametrize("query", QUERIES)
def test_layered_pruned_matches_exact(layered, query):
    exact = layered.search(query, k=10).toPandas()
    pruned = search_pruned(layered, query, k=10).toPandas()
    assert pruned["doc_id"].tolist() == exact["doc_id"].tolist(), query
    assert (pruned["score"].to_numpy() == exact["score"].to_numpy()).all()


def test_layered_batch_pruned_matches_exact_batch(layered):
    batch = [(f"q{i}", q, 10) for i, q in enumerate(QUERIES)]
    exact = layered.search_batch(batch).toPandas()
    pruned = layered.search_batch(batch, pruned=True).toPandas()
    key = ["query_id", "rank"]
    exact = exact.sort_values(key).reset_index(drop=True)
    pruned = pruned.sort_values(key).reset_index(drop=True)
    assert pruned["doc_id"].tolist() == exact["doc_id"].tolist()
    assert (pruned["score"].to_numpy() == exact["score"].to_numpy()).all()


def test_pre_upgrade_layered_index_routes_exact(layered, spark):
    """An already-layered index WITHOUT layer_stats snapshots (written by
    an older build) must keep the round-3 behavior: pruning unsound →
    planner returns None, search_pruned falls back to exact."""
    assert layered.meta.layer_stats, "fixture index should carry snapshots"
    idx = InvertedIndex(spark, layered.index_dir)
    idx._layer_prune_stats = None  # what loading a stat-less meta yields
    assert not idx.pruning_sound
    assert plan_pruned(idx, ["varint", "codec", "shard"], 10) is None
    exact = layered.search("varint codec shard", k=10).toPandas()
    got = search_pruned(idx, "varint codec shard", k=10).toPandas()
    assert got["doc_id"].tolist() == exact["doc_id"].tolist()
    assert (got["score"].to_numpy() == exact["score"].to_numpy()).all()
