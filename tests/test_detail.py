"""FTS5 ``detail=`` storage levels — full / column / none — pinned
against real SQLite on both remaining levels (detail=full is the whole
rest of the suite).

Probed semantics (2026-08 session, reproduced in fixtures here):

- bm25 is IDENTICAL across all three detail levels for the queries a
  level supports (SQLite recomputes aux data by re-tokenizing stored
  row content; we keep the tiny total-tf stream instead — same scores,
  no rescan, no stored content).
- detail=column: colsets + per-column weights live; phrase/NEAR/'^'
  raise "phrase queries are not supported (detail!=full)".
- detail=none: additionally "column queries are not supported
  (detail=none)"; the index is STORED single-field-shaped (no per-field
  streams), so the run-shuffle merge and every single-field reader path
  serve it unchanged.
"""

from __future__ import annotations

import sqlite3

import pandas as pd
import pytest

from sparkgrep.operators.index_build import build_index, load_meta
from sparkgrep.operators.query import InvertedIndex
from sparkgrep.sources.corpus import with_ingest_columns

TITLES = [
    "foo bar baz", "other title here", "baz alone", "foo foo again",
    "mix bar", "unrelated words", "foo mix title", "bar baz mix",
]
BODIES = [
    "body foo here", "bar bar foo", "nothing else", "body text",
    "foo body bar", "plain body", "bar inside body foo", "tail words",
]

QUERIES = [
    "foo", "fo*", "foo bar", "foo OR baz", "foo OR bar NOT baz",
    "mix AND bar", "ba*", "foo foo",
]


def _mk_corpus(spark):
    pdf = pd.DataFrame({
        "repo": "r", "path": [f"p/{i}" for i in range(len(TITLES))],
        "commit": "c0", "lang": None,
        "title": TITLES, "content": BODIES, "doc_id": range(len(TITLES)),
    })
    return with_ingest_columns(spark.createDataFrame(pdf))


def _mk_ref(detail: str) -> sqlite3.Connection:
    db = sqlite3.connect(":memory:")
    db.execute(
        "CREATE VIRTUAL TABLE m USING fts5(title, body, "
        f"tokenize='porter', detail={detail})"
    )
    db.executemany(
        "INSERT INTO m(rowid, title, body) VALUES (?,?,?)",
        list(zip(range(len(TITLES)), TITLES, BODIES)),
    )
    return db


def _ref_rank(db, query, k=20):
    return db.execute(
        "SELECT rowid, bm25(m) FROM m WHERE m MATCH ? "
        "ORDER BY bm25(m) ASC, rowid ASC LIMIT ?", (query, k),
    ).fetchall()


@pytest.fixture(scope="module")
def idx_none(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dnone") / "idx")
    build_index(
        _mk_corpus(spark), out, analyzer="fts5", idf_variant="fts5",
        n_buckets=4, fields=["title", "content"], detail="none",
    )
    return InvertedIndex(spark, out)


@pytest.fixture(scope="module")
def idx_col(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dcol") / "idx")
    build_index(
        _mk_corpus(spark), out, analyzer="fts5", idf_variant="fts5",
        n_buckets=4, fields=["title", "content"], detail="column",
    )
    return InvertedIndex(spark, out)


# ---------------------------------------------------------------- none

def test_none_stores_single_field_layout(idx_none):
    assert idx_none.meta.effective_detail() == "none"
    assert tuple(idx_none.meta.fields) == ("title", "content")
    assert "tfs_cols" not in idx_none.postings.columns
    assert "poss" not in idx_none.postings.columns


@pytest.mark.parametrize("query", QUERIES)
def test_none_rank_identical_to_sqlite(idx_none, query):
    ref = _ref_rank(_mk_ref("none"), query)
    got = idx_none.search_expr(query, k=20).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in ref], query
    for (_, fts), eng in zip(ref, got["score"]):
        assert abs(-fts - eng) <= 1e-9, (query, fts, eng)


def test_none_error_parity(idx_none):
    db = _mk_ref("none")
    # colset: FTS5's exact complaint, raised for valid column names
    with pytest.raises(ValueError, match=r"column queries are not supported"):
        idx_none.search_expr("title:foo", k=5)
    with pytest.raises(sqlite3.OperationalError, match="column queries"):
        db.execute("SELECT rowid FROM m WHERE m MATCH 'title:foo'").fetchall()
    # unknown column still reports the name problem, not the detail one
    with pytest.raises(ValueError, match="no such column"):
        idx_none.search_expr("nope:foo", k=5)
    # phrase family needs positions on both engines
    for q in ['"foo bar"', "NEAR(foo bar, 2)", "^foo", "foo + bar"]:
        with pytest.raises(ValueError):
            idx_none.search_expr(q, k=5)
        with pytest.raises(
            sqlite3.OperationalError, match="queries are not supported"
        ):
            db.execute("SELECT rowid FROM m WHERE m MATCH ?", (q,)).fetchall()
    # weights: FTS5 serves them by re-tokenizing stored content; this
    # index stores none — refuse loudly
    with pytest.raises(ValueError, match="per-column weights"):
        idx_none.search_expr("foo", k=5, weights=[2.0, 0.5])


def test_none_serve_bitwise(idx_none):
    from sparkgrep.operators.serve import LocalServer

    srv = LocalServer(idx_none)
    for q in QUERIES[:4]:
        dist = [
            (r["doc_id"], r["score"])
            for r in idx_none.search_expr(q, 10).collect()
        ]
        served = list(
            srv.search_expr(q, 10)[["doc_id", "score"]]
            .itertuples(index=False, name=None)
        )
        assert served == dist, q
    with pytest.raises(ValueError, match="column queries"):
        srv.search_expr("title:foo", 5)


def test_none_vocab_col_degrades(idx_none):
    from sparkgrep.operators.vocab import vocab

    rows = vocab(idx_none, "col").filter("term = 'foo'").collect()
    assert len(rows) == 1 and rows[0]["col"] is None
    assert rows[0]["doc"] == 5  # docs 0,1,3,4,6 contain foo somewhere
    with pytest.raises(ValueError, match="positional"):
        vocab(idx_none, "instance").collect()


# -------------------------------------------------------------- column

@pytest.mark.parametrize(
    "query",
    QUERIES + ["title:foo", "{title body}:bar OR foo", "-title:ba*"],
)
def test_column_rank_identical_to_sqlite(idx_col, query):
    # engine speaks its own field names; the SQLite table's second
    # column is 'body'
    ref = _ref_rank(_mk_ref("column"), query.replace("body", "body"))
    got = idx_col.search_expr(
        query.replace("body", "content"), k=20
    ).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in ref], query
    for (_, fts), eng in zip(ref, got["score"]):
        assert abs(-fts - eng) <= 1e-9, (query, fts, eng)


def test_column_weights_exact(idx_col):
    db = _mk_ref("column")
    ref = db.execute(
        "SELECT rowid, bm25(m, 2.0, 0.5) FROM m WHERE m MATCH 'foo' "
        "ORDER BY bm25(m, 2.0, 0.5), rowid"
    ).fetchall()
    got = idx_col.search_expr("foo", k=20, weights=[2.0, 0.5]).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in ref]
    for (_, fts), eng in zip(ref, got["score"]):
        assert abs(-fts - eng) <= 1e-9


def test_column_phrase_raises_positions(idx_col):
    assert idx_col.meta.effective_detail() == "column"
    assert "tfs_cols" in idx_col.postings.columns
    assert "poss_cols" not in idx_col.postings.columns
    for q in ['"foo bar"', "NEAR(foo bar, 2)", "^foo"]:
        with pytest.raises(ValueError, match="positions"):
            idx_col.search_expr(q, k=5)


# ---------------------------------------------------------------- knob

def test_detail_knob_validation(spark, tmp_path):
    corpus = _mk_corpus(spark)
    with pytest.raises(ValueError, match="full|column|none"):
        build_index(corpus, str(tmp_path / "x"), detail="bogus")
    with pytest.raises(ValueError, match="stores no positions"):
        build_index(
            corpus, str(tmp_path / "y"), detail="none", store_positions=True,
        )


def test_detail_full_single_field(spark, tmp_path):
    """detail='full' == store_positions=True, recorded in meta."""
    out = str(tmp_path / "f")
    meta = build_index(_mk_corpus(spark), out, n_buckets=4, detail="full")
    assert meta.has_positions and meta.effective_detail() == "full"
    idx = InvertedIndex(spark, out)
    assert idx.search_expr('"foo bar"', k=5).count() >= 0  # phrases live


# ----------------------------------------------------------------- LSM

def test_none_lsm_roundtrip(spark, tmp_path):
    """append + delete + compact on a detail=none index: every stage
    serves bit-identical results to a from-scratch detail=none build
    over the survivors."""
    from sparkgrep.plans.manifest import (
        append_batch_delta, compact_index, delete_batch_delta,
    )

    corpus = _mk_corpus(spark)
    base = corpus.filter("doc_id < 5")
    extra = corpus.filter("doc_id >= 5")
    gone = corpus.filter("doc_id = 1")

    out = str(tmp_path / "lsm")
    build_index(
        base, out, analyzer="fts5", idf_variant="fts5", n_buckets=4,
        fields=["title", "content"], detail="none",
    )
    append_batch_delta(extra, out, "b1")
    delete_batch_delta(gone, out, "d1")
    idx = InvertedIndex(spark, out)

    ref_dir = str(tmp_path / "ref")
    build_index(
        corpus.filter("doc_id != 1"), ref_dir, analyzer="fts5",
        idf_variant="fts5", n_buckets=4,
        fields=["title", "content"], detail="none",
    )
    ref = InvertedIndex(spark, ref_dir)

    def rank(i, q):
        return [
            (r["doc_id"], r["score"]) for r in i.search_expr(q, 20).collect()
        ]

    for q in QUERIES[:5]:
        assert rank(idx, q) == rank(ref, q), ("layered", q)
    with pytest.raises(ValueError, match="column queries"):
        idx.search_expr("title:foo", k=5)

    compact_index(spark, out)
    idx2 = InvertedIndex(spark, out)
    assert load_meta(out).detail == "none"
    assert "tfs_cols" not in idx2.postings.columns
    for q in QUERIES[:5]:
        assert rank(idx2, q) == rank(ref, q), ("compacted", q)
