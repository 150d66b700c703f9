"""O(batch) deletes and updates via tombstone delta layers.

The reference keeps its FTS index fresh with AFTER INSERT/DELETE/UPDATE
triggers (`message_manager.py:113-137`): the DELETE trigger replays the
row's OLD content into the FTS5 'delete' command, and UPDATE is
delete-old + insert-new on the same rowid. The log-structured analogue
here: ``delete_batch_delta`` SPIMI-tokenizes the deleted docs' content
(O(batch) — exactly the information the reference trigger has in
``old.*``) into a TOMBSTONE layer ``tomb/<seq>/`` holding the deleted
doc_ids plus a ``term_ubs`` sidecar with NEGATED dfs; no base layer is
read, decoded, or rewritten. The reader masks deleted docs at decode
time (only in layers older than the tombstone, so a later re-insert of
the same doc_id — an UPDATE — serves the new version) and the summed
sidecar dfs / integer-exact root stats make every query family
bit-identical to a from-scratch build over the surviving corpus.
``compact_index`` folds tombstones away physically.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sparkgrep.operators.index_build import build_index
from sparkgrep.operators.query import InvertedIndex
from sparkgrep.plans.manifest import (
    append_batch_delta,
    compact_index,
    delete_batch_delta,
    read_manifest,
)
from sparkgrep.sources.corpus import synth_corpus

EXPR_QS = [
    "hash join table",
    '"hash join" OR window',
    "hash NOT window",
    "wind* scan",
    "NEAR(hash window, 4)",
    "^the scan",
    "(hash OR window) NOT scan",
]


def _file_state(d):
    out = {}
    for root, _dirs, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            out[p] = (os.path.getsize(p), os.path.getmtime(p))
    return out


def _postings_rows(spark, d):
    return (
        InvertedIndex(spark, d)
        .postings.select("term", "shard", "df", "cf", "n", "doc_ids", "tfs", "dls")
        .toPandas()
        .sort_values(["term", "shard"])
        .reset_index(drop=True)
    )


def _assert_same_results(idx, want_idx, queries=EXPR_QS, k=30):
    for q in queries:
        got = idx.search_expr(q, k=k).toPandas()
        want = want_idx.search_expr(q, k=k).toPandas()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), q
        assert (got["score"].to_numpy() == want["score"].to_numpy()).all(), q
    for mode in ("or", "and"):
        got = idx.search("hash join table", k=k, mode=mode).toPandas()
        want = want_idx.search("hash join table", k=k, mode=mode).toPandas()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), mode
        assert (got["score"].to_numpy() == want["score"].to_numpy()).all(), mode


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_corpus(spark, 400, seed=31).cache()
    docs.count()
    return docs


@pytest.fixture(scope="module")
def tombstoned(spark, corpus, tmp_path_factory):
    """Full 400-doc base, then docs 100..149 deleted by content batch."""
    out = str(tmp_path_factory.mktemp("tomb") / "idx")
    build_index(corpus, out, analyzer="simple", n_buckets=4, store_positions=True)
    base_before = _file_state(f"{out}/postings")
    doomed = corpus.filter("doc_id >= 100 and doc_id < 150")
    meta = delete_batch_delta(doomed, out, "d1")
    return out, base_before, meta


@pytest.fixture(scope="module")
def survivors_idx(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("surv") / "idx")
    build_index(
        corpus.filter("doc_id < 100 or doc_id >= 150"),
        out, analyzer="simple", n_buckets=4, store_positions=True,
    )
    return InvertedIndex(spark, out)


def test_delete_is_o_batch(spark, tombstoned):
    """Structural evidence: base postings files untouched; the tombstone
    layer holds only ids + negated-df sidecar; stats updated exactly."""
    out, base_before, meta = tombstoned
    assert _file_state(f"{out}/postings") == base_before
    assert meta.n_docs == 350
    assert len(meta.tombstones) == 1
    idx = InvertedIndex(spark, out)
    assert idx.is_layered  # idf comes from summed sidecars
    assert idx.pruning_sound  # layer_stats snapshot keeps MaxScore on
    tomb = f"{out}/{meta.tombstones[0]}"
    ids = spark.read.parquet(f"{tomb}/doc_ids")
    assert ids.count() == 50
    lo, hi = ids.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    assert lo >= 100 and hi < 150
    # the sidecar's dfs are negative (they SUBTRACT under the reader's
    # cross-layer summation)
    neg = spark.read.parquet(f"{tomb}/term_ubs")
    assert neg.filter("df >= 0").count() == 0
    assert any(m["segment_id"] == "d1-del" for m in read_manifest(out))


def test_deleted_queries_equal_rebuild(spark, tombstoned, survivors_idx):
    out, _bb, meta = tombstoned
    idx = InvertedIndex(spark, out)
    assert idx.meta.n_docs == survivors_idx.meta.n_docs
    assert idx.meta.avgdl == survivors_idx.meta.avgdl
    _assert_same_results(idx, survivors_idx)
    gb = idx.search_batch([("q0", "hash join table", 10)]).toPandas()
    wb = survivors_idx.search_batch([("q0", "hash join table", 10)]).toPandas()
    assert gb["doc_id"].tolist() == wb["doc_id"].tolist()
    assert (gb["score"].to_numpy() == wb["score"].to_numpy()).all()


def test_wand_falls_back_exact_on_tombstoned(spark, tombstoned, survivors_idx):
    from sparkgrep.operators.wand import search_pruned

    out, _bb, _meta = tombstoned
    idx = InvertedIndex(spark, out)
    got = search_pruned(idx, "hash join table", k=10).toPandas()
    want = survivors_idx.search("hash join table", k=10).toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert (got["score"].to_numpy() == want["score"].to_numpy()).all()


def test_serve_parity_on_tombstoned(spark, tombstoned):
    """The in-process serving tier applies the same decode-time mask and
    summed dfs — bitwise-identical to the distributed path."""
    from sparkgrep.operators.serve import LocalServer

    out, _bb, _meta = tombstoned
    idx = InvertedIndex(spark, out)
    srv = LocalServer(idx).warm(EXPR_QS)
    for q in EXPR_QS:
        got = srv.search_expr(q, k=30)
        want = idx.search_expr(q, k=30).toPandas()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), q
        assert (got["score"].to_numpy() == want["score"].to_numpy()).all(), q


def test_replay_idempotent(spark, corpus, tombstoned):
    out, _bb, meta = tombstoned
    before = read_manifest(out)
    doomed = corpus.filter("doc_id >= 100 and doc_id < 150")
    m2 = delete_batch_delta(doomed, out, "d1")  # same batch id → no-op
    assert read_manifest(out) == before
    assert m2.n_docs == meta.n_docs
    assert len(m2.tombstones) == 1


def test_update_reinserts_same_doc_ids(spark, corpus, tmp_path):
    """UPDATE = delete(old content) + append(new content) on the SAME
    doc_ids (the reference's UPDATE trigger semantics): the tombstone
    masks only layers older than itself, so the re-inserted docs serve
    their new content, bit-identical to a rebuild over the final state."""
    out = str(tmp_path / "upd")
    build_index(corpus, out, analyzer="simple", n_buckets=4, store_positions=True)
    old = corpus.filter("doc_id >= 200 and doc_id < 220").cache()
    new = old.withColumn("content", F.concat(F.col("content"), F.lit(" zebra zebra")))
    delete_batch_delta(old, out, "u1")
    append_batch_delta(new, out, "u1-new")
    final = corpus.filter("doc_id < 200 or doc_id >= 220").unionByName(new)
    full_out = str(tmp_path / "updfull")
    build_index(final, full_out, analyzer="simple", n_buckets=4, store_positions=True)
    idx, full = InvertedIndex(spark, out), InvertedIndex(spark, full_out)
    assert idx.meta.n_docs == full.meta.n_docs == 400
    assert idx.meta.avgdl == full.meta.avgdl
    _assert_same_results(idx, full, queries=EXPR_QS + ["zebra"])
    # the updated docs are found under their new vocabulary
    got = idx.search_expr("zebra", k=30).toPandas()
    assert set(got["doc_id"]) == set(r["doc_id"] for r in new.select("doc_id").collect())


def test_delete_whole_term(spark, corpus, tmp_path):
    """Deleting every doc containing a term empties that term's results
    (its summed df reaches 0)."""
    out = str(tmp_path / "whole")
    build_index(corpus, out, analyzer="simple", n_buckets=4, store_positions=True)
    idx0 = InvertedIndex(spark, out)
    hits = idx0.search("window", k=1000, mode="or").toPandas()
    doomed = corpus.join(
        spark.createDataFrame(
            [(int(d),) for d in hits["doc_id"]], "doc_id long"
        ),
        "doc_id", "semi",
    )
    delete_batch_delta(doomed, out, "dw")
    idx = InvertedIndex(spark, out)
    assert idx.search("window", k=10, mode="or").count() == 0
    assert idx.search_expr("window OR hash", k=10).count() > 0  # others live


def test_compaction_folds_tombstones(spark, corpus, tombstoned, survivors_idx, tmp_path):
    out = str(tmp_path / "cidx")
    build_index(corpus, out, analyzer="simple", n_buckets=4, store_positions=True)
    doomed = corpus.filter("doc_id >= 100 and doc_id < 150")
    delete_batch_delta(doomed, out, "d1")
    idx = InvertedIndex(spark, out)
    pre = {q: idx.search_expr(q, k=50).toPandas() for q in EXPR_QS}
    meta = compact_index(spark, out)
    assert meta.tombstones == () and meta.layers == ()
    idx2 = InvertedIndex(spark, out)
    assert not idx2.is_layered
    for q, want in pre.items():
        got = idx2.search_expr(q, k=50).toPandas()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), q
        assert (got["score"].to_numpy() == want["score"].to_numpy()).all(), q
    # compacted postings content equals a from-scratch build over survivors
    assert _postings_rows(spark, out).equals(
        _postings_rows(spark, survivors_idx.index_dir)
    )


@pytest.mark.parametrize("variant", ["fts5", "okapi", "lucene"])
def test_stale_marker_df_idf_domain(spark, variant, tmp_path):
    """A prefix-MARKER sidecar row's df is never tombstone-corrected (by
    design — the marker query path derives df from the masked decode),
    so after a large delete its summed df can EXCEED the corrected
    n_docs. The eager sidecar-ub fold must not let the idf's log leave
    its domain (fts5's clamp is reached before the log; okapi returns
    the never-read 0.0 bound; lucene's log1p domain is safe for any
    df ≥ 0); queries must equal a from-scratch build over survivors."""
    rows = [(i, f"zzterm{i} shared tok{i % 3}") for i in range(10)]
    corpus = spark.createDataFrame(rows, "doc_id long, content string")
    out = str(tmp_path / "idx")
    build_index(
        corpus, out, analyzer="simple", idf_variant=variant,
        n_buckets=4, prefix=(2,),
    )
    # delete 8 of 10 docs: marker '\x02zz' keeps df=10 in the base
    # sidecar while corrected n_docs drops to 2 → (N - df + 0.5) < 0
    delete_batch_delta(corpus.filter("doc_id < 8"), out, "d0")
    idx = InvertedIndex(spark, out)
    got = idx.search("shared", k=10).toPandas()  # fold runs here (pre-fix: ValueError)
    pgot = idx.search_expr("zz*", k=10).toPandas()

    ref_dir = str(tmp_path / "ref")
    build_index(
        corpus.filter("doc_id >= 8"), ref_dir, analyzer="simple",
        idf_variant=variant, n_buckets=4, prefix=(2,),
    )
    ref = InvertedIndex(spark, ref_dir)
    want = ref.search("shared", k=10).toPandas()
    pwant = ref.search_expr("zz*", k=10).toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert (got["score"].to_numpy() == want["score"].to_numpy()).all()
    assert pgot["doc_id"].tolist() == pwant["doc_id"].tolist()
    assert (pgot["score"].to_numpy() == pwant["score"].to_numpy()).all()
