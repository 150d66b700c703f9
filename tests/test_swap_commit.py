"""Crash safety of the in-place root swaps (plans/manifest.py
finish_pending_swap / _commit_swap).

compact_index and delete_all replace root subdirs wholesale. Before the
marker protocol, a crash after swapping ``postings`` but before the
meta write left the OLD meta (delta layers still listed) over the NEW
folded postings — readers double-counted every delta posting and a
re-run compact folded the deltas in twice, silently and permanently.
The protocol under test: the swap plan + final meta are durably
recorded (marker) only after the staging dir is fully materialized;
finish_pending_swap rolls the plan forward idempotently from any crash
point; readers refuse to open while the marker exists; every
maintenance entry point heals first.
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkgrep.operators.index_build import build_index, load_meta
from sparkgrep.operators.query import InvertedIndex
from sparkgrep.plans.manifest import (
    SWAP_MARKER,
    append_batch_delta,
    compact_index,
    delete_all,
    delete_batch_delta,
    finish_pending_swap,
)
from sparkgrep.sources import fsio
from sparkgrep.sources.corpus import synth_corpus

QS = ["hash join table", '"hash join" OR window', "hash NOT window"]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_corpus(spark, 300, seed=11).cache()
    docs.count()
    return docs


def _mk_layered(spark, corpus, tmp_path_factory, tag):
    out = str(tmp_path_factory.mktemp(tag) / "idx")
    build_index(corpus, out, analyzer="simple", n_buckets=4,
                store_positions=True)
    delta = synth_corpus(spark, 40, seed=23).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000)
    )
    append_batch_delta(delta, out, "b1")
    delete_batch_delta(corpus.filter("doc_id < 30"), out, "d1")
    return out


def _results(spark, out, k=25):
    idx = InvertedIndex(spark, out)
    return {q: idx.search_expr(q, k=k).toPandas() for q in QS}


def _assert_equal_results(spark, a_dir, b_dir):
    ra, rb = _results(spark, a_dir), _results(spark, b_dir)
    for q in QS:
        assert ra[q]["doc_id"].tolist() == rb[q]["doc_id"].tolist(), q
        assert (
            ra[q]["score"].to_numpy() == rb[q]["score"].to_numpy()
        ).all(), q


@pytest.mark.parametrize("crash_on", ["postings", "doc_lens"])
def test_compact_crash_rolls_forward(
    spark, corpus, tmp_path_factory, monkeypatch, crash_on
):
    """Crash injected mid-plan: after the marker committed, while the
    subdir renames are executing ('postings' = crash BEFORE the first
    swap completes, i.e. after delete(live postings); 'doc_lens' = the
    historically-dangerous point AFTER postings swapped but before the
    rest). Readers must refuse; finish_pending_swap must complete the
    plan; the healed index must equal an uncrashed twin's compaction —
    which also proves no delta was folded twice."""
    victim = _mk_layered(spark, corpus, tmp_path_factory, f"v_{crash_on}")
    twin = _mk_layered(spark, corpus, tmp_path_factory, f"t_{crash_on}")
    compact_index(spark, twin)
    twin_meta = load_meta(twin)
    assert not twin_meta.layers and not twin_meta.tombstones

    real_rename = fsio.rename

    def exploding(src, dst):
        if "_compact_tmp" in src and dst.endswith(f"/{crash_on}"):
            raise RuntimeError(f"injected crash at {crash_on} swap")
        real_rename(src, dst)

    monkeypatch.setattr(fsio, "rename", exploding)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_index(spark, victim)
    monkeypatch.setattr(fsio, "rename", real_rename)

    # the marker is down, the state is mid-plan: reader refuses loudly
    # (the old behavior here was silent delta double-counting)
    assert fsio.exists(f"{victim}/{SWAP_MARKER}")
    with pytest.raises(ValueError, match="swap pending"):
        InvertedIndex(spark, victim)

    assert finish_pending_swap(victim) is True
    assert not fsio.exists(f"{victim}/{SWAP_MARKER}")
    assert finish_pending_swap(victim) is False  # idempotent no-op

    vm = load_meta(victim)
    assert not vm.layers and not vm.tombstones  # final meta committed
    assert not fsio.exists(f"{victim}/delta")
    assert not fsio.exists(f"{victim}/_compact_tmp")
    _assert_equal_results(spark, victim, twin)
    # deleted docs are physically gone in the healed compaction too
    hits = (
        InvertedIndex(spark, victim)
        .search_expr("hash OR join OR window OR table OR scan", k=1000)
        .filter(F.col("doc_id") < 30)
        .count()
    )
    assert hits == 0


def test_crash_heals_on_next_maintenance_op(
    spark, corpus, tmp_path_factory, monkeypatch
):
    """Any maintenance entry point (here: a delta append, then a re-run
    compact) completes a crashed swap before doing its own work."""
    victim = _mk_layered(spark, corpus, tmp_path_factory, "heal_op")
    twin = _mk_layered(spark, corpus, tmp_path_factory, "heal_op_t")

    real_rename = fsio.rename

    def exploding(src, dst):
        if "_compact_tmp" in src and dst.endswith("/doc_lens"):
            raise RuntimeError("injected crash")
        real_rename(src, dst)

    monkeypatch.setattr(fsio, "rename", exploding)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_index(spark, victim)
    monkeypatch.setattr(fsio, "rename", real_rename)

    extra = synth_corpus(spark, 20, seed=41).withColumn(
        "doc_id", F.col("doc_id") + F.lit(5000)
    )
    append_batch_delta(extra, victim, "b2")  # heals, then appends
    assert not fsio.exists(f"{victim}/{SWAP_MARKER}")

    compact_index(spark, twin)
    append_batch_delta(extra, twin, "b2")
    _assert_equal_results(spark, victim, twin)


def test_delete_all_crash_rolls_forward(
    spark, corpus, tmp_path_factory, monkeypatch
):
    victim = _mk_layered(spark, corpus, tmp_path_factory, "da")
    pre_meta = load_meta(victim)

    real_rename = fsio.rename

    def exploding(src, dst):
        if "_deleteall_tmp" in src and dst.endswith("/doc_lens"):
            raise RuntimeError("injected crash")
        real_rename(src, dst)

    monkeypatch.setattr(fsio, "rename", exploding)
    with pytest.raises(RuntimeError, match="injected crash"):
        delete_all(spark, victim)
    monkeypatch.setattr(fsio, "rename", real_rename)

    with pytest.raises(ValueError, match="swap pending"):
        InvertedIndex(spark, victim)
    assert finish_pending_swap(victim) is True

    idx = InvertedIndex(spark, victim)
    assert idx.meta.n_docs == 0 and not idx.meta.layers
    assert idx.meta.analyzer == pre_meta.analyzer
    for q in QS:
        assert idx.search_expr(q, k=10).count() == 0
    # the emptied index accepts appends normally ("hash" appears in all
    # 50 appended docs; the 3-term AND of QS[0] matches none of them)
    append_batch_delta(corpus.filter("doc_id < 50"), victim, "b1")
    assert InvertedIndex(spark, victim).search_expr("hash", k=5).count() > 0


def test_rebuild_crash_rolls_forward(
    spark, corpus, tmp_path_factory, monkeypatch
):
    """Review r5: rebuild used to rm delta/tomb/segments and build
    in-place — a mid-rebuild crash left the old meta over missing layer
    dirs (or new doc_lens under old postings: silent score skew). It now
    stages into _rebuild_tmp and marker-commits the swap like
    compact/delete_all; a crash mid-plan refuses readers and heals to
    exactly an uncrashed twin's rebuild."""
    from sparkgrep.plans.manifest import rebuild

    victim = _mk_layered(spark, corpus, tmp_path_factory, "rb_v")
    twin = _mk_layered(spark, corpus, tmp_path_factory, "rb_t")
    new_corpus = synth_corpus(spark, 200, seed=77)
    rebuild(new_corpus, twin)

    real_rename = fsio.rename

    def exploding(src, dst):
        if "_rebuild_tmp" in src and dst.endswith("/doc_lens"):
            raise RuntimeError("injected crash at rebuild swap")
        real_rename(src, dst)

    monkeypatch.setattr(fsio, "rename", exploding)
    with pytest.raises(RuntimeError, match="injected crash"):
        rebuild(new_corpus, victim)
    monkeypatch.setattr(fsio, "rename", real_rename)

    assert fsio.exists(f"{victim}/{SWAP_MARKER}")
    with pytest.raises(ValueError, match="swap pending"):
        InvertedIndex(spark, victim)
    assert finish_pending_swap(victim) is True

    vm = load_meta(victim)
    assert not vm.layers and not vm.tombstones
    for sub in ("delta", "tomb", "segments", "manifest", "_rebuild_tmp"):
        assert not fsio.exists(f"{victim}/{sub}"), sub
    _assert_equal_results(spark, victim, twin)
