"""FTS5 ``prefix=`` indexes (https://sqlite.org/fts5.html#prefix_indexes).

Probed on real SQLite 3.40 before implementation (see
operators/index_build.py PREFIX_MARKER): a prefix index is pure
acceleration — bm25 results are IDENTICAL with and without it on every
grammar construct, prefix lengths are validated to 1..999, duplicates
are legal, and non-integers are 'malformed'. The engine stores one
aggregated marker entry ('\\x02' + prefix) per distinct n-char term
prefix in the ordinary postings table; a matching ``stem*`` resolves to
that single term (InvertedIndex.prefix_terms), so the whole pinned
query surface — which is itself ≤1e-9 against SQLite on the non-prefix
path — must stay BITWISE identical. That transitivity is the parity
argument; these tests pin the bitwise half on every layer the marker
rows flow through: distributed + serving tiers, multi-field colsets,
detail=none, the fused/raw build paths, delta/tombstone layers and
compaction, vocab views, and lineage metrics.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from sparkgrep.operators.index_build import (
    PREFIX_MARKER,
    build_index,
    load_meta,
    normalize_prefix,
)
from sparkgrep.operators.query import InvertedIndex
from sparkgrep.operators.serve import LocalServer

EXPR_QUERIES = [
    "qu*",
    "ta*",
    "que* OR table",
    'qu* NOT "hash join"',
    '"hash jo"*',
    "NEAR(qu* table, 4)",
    "^qu*",
    "qu* AND ta*",
    "quer*",  # length NOT in the prefix set: dictionary path, unchanged
]


def _pair(spark, corpus, **kw):
    d1 = tempfile.mkdtemp(prefix="sgp_plain_") + "/idx"
    d2 = tempfile.mkdtemp(prefix="sgp_pfx_") + "/idx"
    build_index(corpus, d1, n_buckets=8, **kw)
    build_index(corpus, d2, n_buckets=8, prefix=[2, 3], **kw)
    return InvertedIndex(spark, d1), InvertedIndex(spark, d2)


@pytest.fixture(scope="module")
def pos_pair(spark, corpus):
    """(plain, prefix-indexed) positional single-field indexes over the
    same corpus."""
    return _pair(spark, corpus, analyzer="simple", store_positions=True)


def test_meta_and_resolution(pos_pair):
    plain, pfx = pos_pair
    assert tuple(pfx.meta.prefix) == (2, 3)
    assert not tuple(plain.meta.prefix or ())
    # marker fast path: one term, no dictionary scan
    assert pfx.prefix_terms("qu") == [PREFIX_MARKER + "qu"]
    # stem length outside the set: ordinary dictionary resolution
    terms = pfx.prefix_terms("quer")
    assert terms and all(t.startswith("quer") for t in terms)
    # no matching tokens: marker with no postings — empty result
    assert pfx.search_expr("zz*", k=5).count() == 0


@pytest.mark.parametrize("q", EXPR_QUERIES)
def test_bitwise_distributed(pos_pair, q):
    plain, pfx = pos_pair
    a = [tuple(r) for r in plain.search_expr(q, k=10).collect()]
    b = [tuple(r) for r in pfx.search_expr(q, k=10).collect()]
    assert a == b, q


def test_bitwise_serving(pos_pair):
    plain, pfx = pos_pair
    s1, s2 = LocalServer(plain), LocalServer(pfx)
    for q in EXPR_QUERIES:
        a, b = s1.search_expr(q, k=10), s2.search_expr(q, k=10)
        assert a.equals(b), q


def test_marker_scan_is_single_term_pruned(pos_pair):
    """The marker path must compile to the normal bucket-pruned +
    term-pushdown scan of ONE term — no StartsWith anywhere in the
    plan (that was the pre-dictionary sweep; the dictionary path still
    pays a multi-term In(term, ...) decode)."""
    _, pfx = pos_pair
    plan = (
        pfx._prefix_matched("qu")
        ._jdf.queryExecution().executedPlan().toString()
    )
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in pf, plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "term" in pushed, plan
    assert "StartsWith" not in plan, plan


def test_fused_and_raw_builds_byte_identical(spark, corpus, monkeypatch):
    import os

    d1 = tempfile.mkdtemp(prefix="sgp_fused_") + "/idx"
    d2 = tempfile.mkdtemp(prefix="sgp_raw_") + "/idx"
    build_index(corpus, d1, analyzer="simple", n_buckets=8, prefix=[2])
    monkeypatch.setenv("SPARKGREP_RUN_SHUFFLE", "off")
    build_index(corpus, d2, analyzer="simple", n_buckets=8, prefix=[2])
    monkeypatch.delenv("SPARKGREP_RUN_SHUFFLE")
    cols = ["term", "shard", "df", "cf", "n", "doc_ids", "tfs", "dls"]
    a = spark.read.parquet(f"{d1}/postings").select(cols).orderBy("term", "shard").collect()
    b = spark.read.parquet(f"{d2}/postings").select(cols).orderBy("term", "shard").collect()
    assert a == b and len(a) > 0


def test_multifield_colset_prefix_bitwise(spark, corpus):
    mc = corpus.withColumn("meta", F.concat_ws(" ", "lang", "path")).cache()
    try:
        d1 = tempfile.mkdtemp(prefix="sgp_mc1_") + "/idx"
        d2 = tempfile.mkdtemp(prefix="sgp_mc2_") + "/idx"
        kw = dict(analyzer="simple", fields=["meta", "content"], n_buckets=8)
        build_index(mc, d1, detail="full", **kw)
        build_index(mc, d2, detail="full", prefix=[2], **kw)
        i1, i2 = InvertedIndex(spark, d1), InvertedIndex(spark, d2)
        cases = [
            ("meta:py*", None),
            ("{meta content}:qu*", None),
            ("-meta:qu* ta*", None),
            ("qu* OR content:ta*", [2.0, 0.5]),
        ]
        for q, w in cases:
            a = [tuple(r) for r in i1.search_expr(q, k=10, weights=w).collect()]
            b = [tuple(r) for r in i2.search_expr(q, k=10, weights=w).collect()]
            assert a == b, q
        # serving tier mirrors the same relations
        s1, s2 = LocalServer(i1), LocalServer(i2)
        for q, w in cases:
            assert s1.search_expr(q, k=10, weights=w).equals(
                s2.search_expr(q, k=10, weights=w)
            ), q
    finally:
        mc.unpersist()


@pytest.mark.parametrize("detail", ["none", "column"])
def test_detail_levels_prefix_bitwise(spark, corpus, detail):
    mc = corpus.withColumn("meta", F.concat_ws(" ", "lang", "path"))
    d1 = tempfile.mkdtemp(prefix=f"sgp_{detail}1_") + "/idx"
    d2 = tempfile.mkdtemp(prefix=f"sgp_{detail}2_") + "/idx"
    kw = dict(analyzer="simple", fields=["meta", "content"], n_buckets=8)
    build_index(mc, d1, detail=detail, **kw)
    build_index(mc, d2, detail=detail, prefix=[2], **kw)
    i1, i2 = InvertedIndex(spark, d1), InvertedIndex(spark, d2)
    queries = ["qu*", "qu* OR ta*"]
    if detail == "column":  # colset prefix lives at this level
        queries += ["meta:py*", "{meta content}:qu* ta*"]
    for q in queries:
        a = [tuple(r) for r in i1.search_expr(q, k=10).collect()]
        b = [tuple(r) for r in i2.search_expr(q, k=10).collect()]
        assert a == b, q


def test_vocab_excludes_markers(spark, pos_pair):
    from sparkgrep.operators.vocab import vocab

    plain, pfx = pos_pair
    a = {(r["term"], r["doc"], r["cnt"]) for r in vocab(plain, "row").collect()}
    b = {(r["term"], r["doc"], r["cnt"]) for r in vocab(pfx, "row").collect()}
    assert a == b
    assert not any(t.startswith(PREFIX_MARKER) for t, _, _ in b)
    ia = vocab(plain, "instance").count()
    ib = vocab(pfx, "instance").count()
    assert ia == ib


def test_lsm_layers_and_compaction_bitwise(spark, corpus):
    """Delta appends and tombstone deletes on a prefix index: every
    layer derives markers (inherited from the root meta — not from the
    caller), queries stay bitwise-identical to a plain index over the
    same survivors, lineage n_tokens is NOT inflated by marker rows,
    and compaction preserves the prefix config + the fast path."""
    from sparkgrep.plans.manifest import (
        append_batch_delta,
        compact_index,
        delete_batch_delta,
        read_manifest,
    )

    rows = corpus.orderBy("doc_id").limit(300).cache()
    base = rows.filter(F.col("doc_id") % 3 != 2)
    batch = rows.filter(F.col("doc_id") % 3 == 2)
    dead = base.filter(F.col("doc_id") % 5 == 0)

    d_pfx = tempfile.mkdtemp(prefix="sgp_lsm_") + "/idx"
    d_ref = tempfile.mkdtemp(prefix="sgp_ref_") + "/idx"
    kw = dict(analyzer="simple", n_buckets=8)
    append_batch_delta(base, d_pfx, "b0", prefix=[2], **kw)
    append_batch_delta(batch, d_pfx, "b1", **kw)  # inherits prefix
    delete_batch_delta(dead, d_pfx, "d0")

    # lineage: the prefix index's token counts equal a plain build's
    d_plain = tempfile.mkdtemp(prefix="sgp_plain0_") + "/idx"
    append_batch_delta(base, d_plain, "b0", **kw)
    m_pfx = {m["segment_id"]: m for m in read_manifest(d_pfx)}
    m_pln = {m["segment_id"]: m for m in read_manifest(d_plain)}
    assert m_pfx["b0-0"]["n_tokens"] == m_pln["b0-0"]["n_tokens"]
    assert m_pfx["b0-0"]["n_postings"] == m_pln["b0-0"]["n_postings"]

    survivors = rows.join(dead.select("doc_id"), "doc_id", "left_anti")
    build_index(
        survivors, d_ref, store_positions=False, prefix=[2], **kw
    )
    i_ref = InvertedIndex(spark, d_ref)

    def check(tag):
        idx = InvertedIndex(spark, d_pfx)
        assert 2 in tuple(idx.meta.prefix)
        assert idx.prefix_terms("qu") == [PREFIX_MARKER + "qu"]
        for q in ["qu*", "qu* OR table", "ta* NOT query"]:
            a = [tuple(r) for r in idx.search_expr(q, k=10).collect()]
            b = [tuple(r) for r in i_ref.search_expr(q, k=10).collect()]
            assert a == b, (tag, q)

    check("layered")
    compact_index(spark, d_pfx)
    meta = load_meta(d_pfx)
    assert not meta.layers and not meta.tombstones
    check("compacted")
    rows.unpersist()


def test_checkpointed_build_with_prefix(spark, corpus):
    from sparkgrep.plans.manifest import build_index_checkpointed

    d1 = tempfile.mkdtemp(prefix="sgp_ckpt_") + "/idx"
    d2 = tempfile.mkdtemp(prefix="sgp_oneshot_") + "/idx"
    build_index_checkpointed(
        corpus, d1, analyzer="simple", n_segments=3, prefix="2",
        n_buckets=8,
    )
    build_index(corpus, d2, analyzer="simple", prefix=[2], n_buckets=8)
    i1, i2 = InvertedIndex(spark, d1), InvertedIndex(spark, d2)
    a = [tuple(r) for r in i1.search_expr("qu* OR ta*", k=10).collect()]
    b = [tuple(r) for r in i2.search_expr("qu* OR ta*", k=10).collect()]
    assert a == b
    assert i1.prefix_terms("ta") == [PREFIX_MARKER + "ta"]


def test_option_validation(corpus):
    # mirrors SQLite's probed messages
    assert normalize_prefix(None) == ()
    assert normalize_prefix(2) == (2,)
    assert normalize_prefix("2 3") == (2, 3)
    assert normalize_prefix("3,2,2") == (2, 3)
    with pytest.raises(ValueError, match="out of range"):
        normalize_prefix(0)
    with pytest.raises(ValueError, match="out of range"):
        normalize_prefix("1000")
    with pytest.raises(ValueError, match="malformed"):
        normalize_prefix("a")
    with pytest.raises(ValueError, match="trigram"):
        build_index(corpus, "/tmp/never", analyzer="trigram", prefix=[2])
