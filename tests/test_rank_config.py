"""FTS5 'rank' configuration option parity
(sqlite.org/fts5.html#the_rank_configuration_option): ``set_rank``
persists a default rank function — per-field bm25 weights applied
whenever a query passes none — with FTS5's probed semantics: the
``rank`` column uses the configured function, a per-query ``rank
MATCH`` (our explicit ``weights=``) overrides it, missing trailing
weights default to 1.0 and extras are ignored. Config survives delta
appends, incremental merges and compaction (build state is recomputed,
config is not).
"""

from __future__ import annotations

import sqlite3

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkgrep.operators.index_build import build_index, load_meta
from sparkgrep.operators.query import InvertedIndex
from sparkgrep.plans.manifest import (
    append_batch_delta,
    compact_index,
    merge_delta_layers,
    set_rank,
)
from sparkgrep.sources.corpus import with_ingest_columns

TITLES = [
    "hash join", "window scan", "hash table window", "join join join",
    "scan", "table", "hash", "window join hash",
]
BODIES = [
    "the build side of a hash join", "scan the window frames",
    "hash hash table", "join elimination pass", "sequential scan cost",
    "table statistics", "hash partitioning", "windowed aggregation join",
]


def _mk_corpus(spark):
    pdf = pd.DataFrame({
        "repo": "r", "path": [f"p/{i}" for i in range(len(TITLES))],
        "commit": "c0", "lang": None,
        "title": TITLES, "content": BODIES, "doc_id": range(len(TITLES)),
    })
    return with_ingest_columns(spark.createDataFrame(pdf))


@pytest.fixture(scope="module")
def ref():
    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE m USING fts5(title, body, tokenize='porter')")
    db.executemany(
        "INSERT INTO m(rowid, title, body) VALUES (?,?,?)",
        list(zip(range(len(TITLES)), TITLES, BODIES)),
    )
    db.execute("INSERT INTO m(m, rank) VALUES('rank', 'bm25(10.0, 2.0)')")
    return db


@pytest.fixture(scope="module")
def cfg_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rank") / "idx")
    build_index(
        _mk_corpus(spark), out, analyzer="fts5", idf_variant="fts5",
        fields=["title", "content"], n_buckets=4,
    )
    meta = set_rank(out, "bm25(10.0, 2.0)")
    assert tuple(meta.rank_weights) == (10.0, 2.0)
    return InvertedIndex(spark, out)


QUERIES = ["hash", "join OR scan", "hash join", "window"]


@pytest.mark.parametrize("query", QUERIES)
def test_default_rank_matches_sqlite(ref, cfg_index, query):
    """No explicit weights → the persisted rank function scores, equal
    to SQLite's `rank` column under the same configuration."""
    want = ref.execute(
        "SELECT rowid, rank FROM m WHERE m MATCH ? "
        "ORDER BY rank ASC, rowid ASC LIMIT 20",
        (query,),
    ).fetchall()
    got = cfg_index.search_expr(query, k=20).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in want], query
    for (_rid, fts), eng in zip(want, got["score"]):
        assert abs(-fts - eng) <= 1e-9, (query, fts, eng)


def test_per_query_override_wins(ref, cfg_index):
    """Explicit weights override the configured default — FTS5's
    `rank MATCH 'bm25(...)'` per-query form."""
    want = ref.execute(
        "SELECT rowid, rank FROM m WHERE m MATCH 'hash join' "
        "AND rank MATCH 'bm25(1.0, 5.0)' ORDER BY rank ASC, rowid ASC",
    ).fetchall()
    got = cfg_index.search_expr("hash join", k=20, weights=[1.0, 5.0]).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in want]
    for (_rid, fts), eng in zip(want, got["score"]):
        assert abs(-fts - eng) <= 1e-9


def test_serve_tier_uses_config(spark, cfg_index):
    from sparkgrep.operators.serve import LocalServer

    srv = LocalServer(cfg_index)
    for q in QUERIES:
        want = [
            (r["doc_id"], r["score"])
            for r in cfg_index.search_expr(q, k=20).collect()
        ]
        got = srv.search_expr(q, 20)[["doc_id", "score"]].itertuples(
            index=False, name=None
        )
        assert list(got) == want, q


def test_batch_and_pruned_and_serve_consistent(spark, cfg_index):
    """Every serving path respects the configured rank function:
    search_batch shares the weighted decode, pruned search applies the
    per-field ub plan, and plain LocalServer.search scores the RESIDENT
    per-field tiers (the distributed OR mode's DNF mirrored through the
    mc fold) — all bitwise-equal to search()."""
    from sparkgrep.operators.serve import LocalServer
    from sparkgrep.operators.wand import search_pruned

    idx = cfg_index
    want = {
        q: [tuple(r) for r in idx.search(q, k=15).collect()]
        for q in ("hash join", "window scan")
    }
    batch = idx.search_batch(
        [("q0", "hash join", 15), ("q1", "window scan", 15)]
    ).collect()
    for qid, q in (("q0", "hash join"), ("q1", "window scan")):
        got = [
            (r["rank"], r["doc_id"], r["score"])
            for r in batch
            if r["query_id"] == qid
        ]
        assert got == want[q], q
    got = [tuple(r) for r in search_pruned(idx, "hash join", k=15).collect()]
    assert got == want["hash join"]
    srv = LocalServer(idx)
    got = [
        tuple(r)
        for r in srv.search("hash join", 15)[
            ["rank", "doc_id", "score"]
        ].itertuples(index=False, name=None)
    ]
    assert got == want["hash join"]


def test_serve_plain_weighted_is_resident(spark, cfg_index):
    """Plain search on a rank-configured index serves from the resident
    per-field tiers: zero Spark jobs once warmed (previously it
    delegated — one distributed job per query), bitwise-equal to the
    distributed OR mode on every query in the workload."""
    from sparkgrep.operators.serve import LocalServer

    sc = spark.sparkContext
    # includes an operator-shaped query: plain search() is bag-of-words
    # (scores 'or' as a term), and warm() unions the tokenized term set
    # precisely so that path stays job-free too
    plain_qs = ["hash", "hash join", "window scan", "join OR scan"]
    srv = LocalServer(cfg_index).warm(plain_qs)
    want = {
        q: [tuple(r) for r in cfg_index.search(q, k=20).collect()]
        for q in plain_qs
    }
    sc.setJobGroup("rank_serve_plain", "rank_serve_plain", interruptOnCancel=False)
    try:
        for q in plain_qs:
            got = [
                tuple(r)
                for r in srv.search(q, 20)[
                    ["rank", "doc_id", "score"]
                ].itertuples(index=False, name=None)
            ]
            assert got == want[q], q
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("rank_serve_plain")
    assert not jobs, f"warmed weighted serve ran Spark jobs: {jobs}"


def test_padding_and_extras(spark, tmp_path, ref):
    """bm25(2.0) on a 2-field index pads the missing weight with 1.0;
    extras beyond the field count are ignored — both probed."""
    out = str(tmp_path / "idx")
    build_index(
        _mk_corpus(spark), out, analyzer="fts5", idf_variant="fts5",
        fields=["title", "content"], n_buckets=4,
    )
    assert tuple(set_rank(out, "bm25(2.0)").rank_weights) == (2.0, 1.0)
    assert tuple(set_rank(out, "bm25(2., 3., 9.9)").rank_weights) == (2.0, 3.0)
    idx = InvertedIndex(spark, out)
    want = ref.execute(
        "SELECT rowid, bm25(m, 2.0, 3.0) AS s FROM m WHERE m MATCH 'hash' "
        "ORDER BY s ASC, rowid ASC",
    ).fetchall()
    got = idx.search_expr("hash", k=20).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in want]
    for (_rid, fts), eng in zip(want, got["score"]):
        assert abs(-fts - eng) <= 1e-9


def test_validation_errors(spark, tmp_path):
    out = str(tmp_path / "idx")
    build_index(
        _mk_corpus(spark), out, analyzer="simple",
        fields=["title", "content"], n_buckets=4,
    )
    with pytest.raises(ValueError, match="malformed rank"):
        set_rank(out, "bm25(")
    with pytest.raises(ValueError, match="no such function: fancyrank"):
        set_rank(out, "fancyrank(1.0)")
    with pytest.raises(ValueError, match="non-numeric"):
        set_rank(out, "bm25(2.0, 'x')")
    sf = str(tmp_path / "sf")
    build_index(_mk_corpus(spark), sf, analyzer="simple", n_buckets=4)
    with pytest.raises(ValueError, match="multi-field"):
        set_rank(sf, "bm25(2.0)")


def test_config_survives_lsm_lifecycle(spark, tmp_path):
    """rank config is index CONFIG: delta appends, incremental merges
    and compaction recompute build state but keep it."""
    corpus = _mk_corpus(spark)
    out = str(tmp_path / "idx")
    build_index(
        corpus.filter("doc_id < 5"), out, analyzer="simple",
        fields=["title", "content"], n_buckets=4,
    )
    set_rank(out, "bm25(10.0, 2.0)")
    append_batch_delta(corpus.filter("doc_id >= 5 and doc_id < 7"), out, "b1")
    append_batch_delta(corpus.filter("doc_id >= 7"), out, "b2")
    assert tuple(load_meta(out).rank_weights) == (10.0, 2.0)
    merge_delta_layers(spark, out)
    assert tuple(load_meta(out).rank_weights) == (10.0, 2.0)
    pre = InvertedIndex(spark, out).search_expr("hash join", k=20).toPandas()
    compact_index(spark, out)
    assert tuple(load_meta(out).rank_weights) == (10.0, 2.0)
    idx = InvertedIndex(spark, out)
    post = idx.search_expr("hash join", k=20).toPandas()
    assert post["doc_id"].tolist() == pre["doc_id"].tolist()
    assert (post["score"].to_numpy() == pre["score"].to_numpy()).all()
    # and it is really the configured function, not the all-1.0 default
    explicit = idx.search_expr("hash join", k=20, weights=[10.0, 2.0]).toPandas()
    assert (post["score"].to_numpy() == explicit["score"].to_numpy()).all()
