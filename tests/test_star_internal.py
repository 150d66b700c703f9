"""Phrase-INTERNAL prefix slots — FTS5 ``a* + b`` — exact against real
SQLite, closing the last query-grammar construct.

Pinned semantics (probed, 2026-08 session):

- ``foo* + bar`` is ONE phrase atom whose slot 0 matches ANY stored term
  starting with ``foo`` (instances: 'football bar', 'foo bar'); tf = the
  instance count, df = docs with ≥1 instance.
- any slot mix works: ``foo* + bar*``, ``fo* + bar + one``; each slot
  occupies exactly one token position, so starts stay a set.
- ``"foo bar"* + one``: the left operand's TAIL star becomes INTERNAL in
  the merged phrase (matches "foo barrel one") — the star stays on its
  slot across ``+`` merges.
- ``^`` anchors the whole merged phrase (tf ∈ {0,1} at position 0);
  NEAR members evaluate the starred phrase's instance starts with
  len = slot count; NOT/OR/duplicate-occurrence scoring all compose.
"""

from __future__ import annotations

import sqlite3

import pandas as pd
import pytest

from sparkgrep.operators.query import InvertedIndex

DOCS = [
    "football bar one",              # 0 slot-0 star instance
    "foo bar two",                   # 1 exact instance
    "forest bar three",              # 2 fo* only
    "foo only here",                 # 3
    "bar football reversed",         # 4 not in order
    "foo bar foo barrel",            # 5 tail-star material
    "football bar football bar dup", # 6 two instances
    "zz football bar late",          # 7 instance not at 0 (anchor case)
    "foo barrel one extra",          # 8 '"foo bar"* + one' instance
    "alpha football bar one end",    # 9 chain instance off position 0
    "alone word",                    # 10 OR material
] + [f"filler doc number {i} pad pad" for i in range(25)]


@pytest.fixture(scope="module")
def fts5si():
    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE p USING fts5(content, tokenize='porter')")
    db.executemany(
        "INSERT INTO p(rowid, content) VALUES (?,?)", list(enumerate(DOCS))
    )
    return db


@pytest.fixture(scope="module")
def si_index(spark, tmp_path_factory):
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.sources.corpus import with_ingest_columns

    pdf = pd.DataFrame({
        "repo": "r", "path": [f"p/{i}" for i in range(len(DOCS))],
        "commit": "c0", "lang": None, "content": DOCS,
        "doc_id": range(len(DOCS)),
    })
    corpus = with_ingest_columns(spark.createDataFrame(pdf))
    out = str(tmp_path_factory.mktemp("si") / "idx")
    build_index(
        corpus, out, analyzer="fts5", idf_variant="fts5",
        n_buckets=4, store_positions=True,
    )
    return InvertedIndex(spark, out), corpus


SI_QUERIES = [
    "foo* + bar",
    "foo*+bar",                     # glued
    "fo* + bar",                    # wider stem
    "^foo* + bar",                  # anchored merged phrase
    "foo* + bar*",                  # every slot starred
    "foo* + bar + one",             # chain, star at slot 0
    "foo + bar* + one",             # star mid-chain
    '"foo bar"* + one',             # left tail star becomes internal
    '"foo"* + bar',                 # quoted single-token star operand
    "NEAR(foo* + bar dup, 3)",      # starred phrase as NEAR member
    "NEAR(foo* + bar gap, 2)",      # unsatisfied NEAR
    "foo* + bar NOT two",
    "alone OR foo* + bar",
    "foo* + bar foo* + bar",        # duplicate occurrence scoring
    "fo* + bar* + one*",
]


def _ref(db, query, k=20):
    return db.execute(
        "SELECT rowid, bm25(p) FROM p WHERE p MATCH ? "
        "ORDER BY bm25(p) ASC, rowid ASC LIMIT ?",
        (query, k),
    ).fetchall()


@pytest.mark.parametrize("query", SI_QUERIES)
def test_rank_identical_to_sqlite(fts5si, si_index, query):
    idx, _ = si_index
    ref = _ref(fts5si, query)
    got = idx.search_expr(query, k=20).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in ref], query
    for (_, fts_score), eng_score in zip(ref, got["score"]):
        assert abs(-fts_score - eng_score) <= 1e-9, (query, fts_score, eng_score)


def test_serve_resident_bitwise(si_index):
    """The serving tier answers internal-star phrases RESIDENT —
    bitwise-identical to the distributed path on every composition."""
    from sparkgrep.operators.serve import LocalServer

    idx, _ = si_index
    srv = LocalServer(idx).warm(["foo* + bar"])
    for q in ["foo* + bar", "^foo* + bar", "foo* + bar*",
              '"foo bar"* + one', "NEAR(foo* + bar dup, 3)",
              "alone OR foo* + bar NOT two"]:
        dist = [(r["doc_id"], r["score"]) for r in idx.search_expr(q, 10).collect()]
        served = list(
            srv.search_expr(q, 10)[["doc_id", "score"]]
            .itertuples(index=False, name=None)
        )
        assert served == dist, q


def test_pandas_oracle_agrees(si_index):
    from tests.oracle import bm25_expr_oracle

    idx, corpus = si_index
    docs = corpus.select("doc_id", "content").toPandas()
    for q in ["foo* + bar", "foo* + bar*", '"foo bar"* + one',
              "^foo* + bar", "NEAR(foo* + bar dup, 3)"]:
        want = bm25_expr_oracle(docs, q, k=20, analyzer="fts5", idf_variant="fts5")
        got = idx.search_expr(q, k=20).toPandas()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), q
        assert (got["score"] - want["score"]).abs().max() <= 1e-9, q


@pytest.mark.parametrize("query", ["foo* + bar", "^foo* + bar"])
def test_highlight_parity(fts5si, si_index, query):
    from sparkgrep.operators.snippet import search_highlight

    idx, corpus = si_index
    ref = {
        r[0]: r[1]
        for r in fts5si.execute(
            "SELECT rowid, highlight(p, 0, '[', ']') FROM p WHERE p MATCH ?",
            (query,),
        ).fetchall()
    }
    got = search_highlight(
        idx, corpus, query, k=20, mark_start="[", mark_end="]"
    ).collect()
    assert got, query
    for r in got:
        assert r["highlight"] == ref[r["doc_id"]], (query, r["doc_id"])


def test_mc_parity(spark, tmp_path_factory):
    """Internal stars on a MULTI-FIELD index: per-(doc, field)
    instances, colset filters live — exact vs SQLite's 2-column table,
    serve tier bitwise."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.serve import LocalServer
    from sparkgrep.sources.corpus import with_ingest_columns

    titles = ["football bar title", "other words here", "foo bar title",
              "plain thing", "forest bar again"]
    bodies = ["body without it", "body football bar inside", "foo in body",
              "football alone body", "barrel body football bar end"]
    db = sqlite3.connect(":memory:")
    db.execute(
        "CREATE VIRTUAL TABLE m USING fts5(title, body, tokenize='porter')"
    )
    db.executemany(
        "INSERT INTO m(rowid, title, body) VALUES (?,?,?)",
        list(zip(range(len(titles)), titles, bodies)),
    )
    pdf = pd.DataFrame({
        "repo": "r", "path": [f"p/{i}" for i in range(len(titles))],
        "commit": "c0", "lang": None,
        "title": titles, "content": bodies, "doc_id": range(len(titles)),
    })
    corpus = with_ingest_columns(spark.createDataFrame(pdf))
    out = str(tmp_path_factory.mktemp("simc") / "idx")
    build_index(corpus, out, analyzer="fts5", idf_variant="fts5",
                n_buckets=4, store_positions=True,
                fields=["title", "content"])
    idx = InvertedIndex(spark, out)
    srv = LocalServer(idx)

    for q_ref, q_eng in [
        ("foo* + bar", "foo* + bar"),
        ("title:foo* + bar", "title:foo* + bar"),
        ("body:foo* + bar OR plain", "content:foo* + bar OR plain"),
        ("NEAR(foo* + bar end, 4)", "NEAR(foo* + bar end, 4)"),
        ("fo* + bar*", "fo* + bar*"),
    ]:
        ref = db.execute(
            "SELECT rowid, bm25(m) FROM m WHERE m MATCH ? "
            "ORDER BY bm25(m) ASC, rowid ASC LIMIT 10",
            (q_ref,),
        ).fetchall()
        got = idx.search_expr(q_eng, k=10).toPandas()
        assert got["doc_id"].tolist() == [r[0] for r in ref], q_eng
        for (_, fs), es in zip(ref, got["score"]):
            assert abs(-fs - es) <= 1e-9, (q_eng, fs, es)
        served = list(
            srv.search_expr(q_eng, 10)[["doc_id", "score"]]
            .itertuples(index=False, name=None)
        )
        assert served == [
            (r["doc_id"], r["score"]) for _, r in got.iterrows()
        ], q_eng
