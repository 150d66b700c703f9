"""Phrase-with-prefix-tail units — FTS5's ``"a b"*`` / ``a_b*`` — exact
against real SQLite.

Pinned semantics (probed): a phrase whose LAST token carries ``*`` is
ONE atom; its instances are head-phrase positions with a stem-matching
successor token; tf = instance count, df = docs with ≥1 instance
(emulated-score probe: identical to 6 decimals against a hand-built
corpus where a single token reproduces the same tf/df/dl pattern);
``^`` keeps only instance start 0; NEAR members span len(terms)
positions; the detached form ``"a b" *`` is accepted too.
"""

from __future__ import annotations

import sqlite3

import pandas as pd
import pytest

from sparkgrep.operators.query import InvertedIndex

DOCS = [
    "foo bar one",                 # exact phrase
    "foo barrel two",              # prefix tail
    "foo bart foo barn mix",       # two instances
    "bar foo reversed",            # not in order
    "foo only here",
    "barrel alone word",
    "foo bar foo barrel both",     # exact + prefix instances
    "zz foo barrel late start",    # instance not at 0 (anchor case)
    "near foo barn target mix gap",# NEAR material
] + [f"filler document number {i} pad pad pad" for i in range(30)]


@pytest.fixture(scope="module")
def fts5pp():
    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE p USING fts5(content, tokenize='porter')")
    db.executemany(
        "INSERT INTO p(rowid, content) VALUES (?,?)", list(enumerate(DOCS))
    )
    return db


@pytest.fixture(scope="module")
def pp_index(spark, tmp_path_factory):
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.sources.corpus import with_ingest_columns

    pdf = pd.DataFrame({
        "repo": "r", "path": [f"p/{i}" for i in range(len(DOCS))],
        "commit": "c0", "lang": None, "content": DOCS,
        "doc_id": range(len(DOCS)),
    })
    corpus = with_ingest_columns(spark.createDataFrame(pdf))
    out = str(tmp_path_factory.mktemp("pp") / "idx")
    build_index(
        corpus, out, analyzer="fts5", idf_variant="fts5",
        n_buckets=4, store_positions=True,
    )
    return InvertedIndex(spark, out), corpus


PP_QUERIES = [
    '"foo bar"*',
    '"foo bar" *',                  # detached star
    'foo_bar*',                     # bareword form ('_' separates)
    '"foo"*',                       # single-token quoted prefix ≡ foo*
    '^"foo bar"*',                  # anchored: doc with instance at 1 drops
    '"foo bar"* NOT two',
    'alone OR "foo bar"*',
    'NEAR("foo bar"* mix, 3)',
    'NEAR("foo bar"* gap, 2)',
    '"foo bar"* "foo bar"*',        # duplicate occurrence scoring
]


@pytest.mark.parametrize("query", PP_QUERIES)
def test_rank_identical_to_sqlite(fts5pp, pp_index, query):
    k = 20
    ref = fts5pp.execute(
        "SELECT rowid, bm25(p) FROM p WHERE p MATCH ? "
        "ORDER BY bm25(p) ASC, rowid ASC LIMIT ?",
        (query, k),
    ).fetchall()
    idx, _ = pp_index
    got = idx.search_expr(query, k=k).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in ref], query
    for (_, fts_score), eng_score in zip(ref, got["score"]):
        assert abs(-fts_score - eng_score) <= 1e-9, (query, fts_score, eng_score)


PLUS_QUERIES = [
    "foo + bar",
    "foo+bar",                      # glued (FTS5: '+' is not a bareword char)
    '"foo" + "bar"',                # quoted operands concatenate
    "foo + barrel*",                # trailing prefix star rides the tail
    "^foo + bar",                   # anchor applies to the whole phrase
    "foo + bar + one",              # left-assoc chain
    "only OR foo + bar",            # binds above OR
    "foo NOT foo + bar",            # binds above NOT
    "NEAR(foo + bar mix, 6)",       # inside NEAR
]


@pytest.mark.parametrize("query", PLUS_QUERIES)
def test_plus_concat_rank_identical(fts5pp, pp_index, query):
    """FTS5 '+' phrase concatenation (probed: tightest-binding; any
    spacing) — rank/score-identical on every composition."""
    k = 20
    ref = fts5pp.execute(
        "SELECT rowid, bm25(p) FROM p WHERE p MATCH ? "
        "ORDER BY bm25(p) ASC, rowid ASC LIMIT ?",
        (query, k),
    ).fetchall()
    idx, _ = pp_index
    got = idx.search_expr(query, k=k).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in ref], query
    for (_, fts_score), eng_score in zip(ref, got["score"]):
        assert abs(-fts_score - eng_score) <= 1e-9, (query, fts_score, eng_score)


def test_plus_midphrase_prefix_parses(pp_index):
    """'a* + b' (FTS5 phrase-internal prefix) parses to one phrase atom
    with the star recorded on its slot (full parity suite:
    tests/test_star_internal.py)."""
    from sparkgrep.functions.querylang import parse_query, star_slots

    (u,) = parse_query("foo* + bar", "fts5").units()
    assert u.terms == ("foo", "bar") and star_slots(u) == (0,)
    assert not u.prefix and u.stars == (0,)


def test_serve_resident_bitwise(pp_index):
    """Single-field serve answers phrase-prefix RESIDENT (numpy _pp_eval
    mirror) — bitwise-identical to the distributed path, including NEAR
    members and anchors; warm() prefetches the right tiers."""
    from sparkgrep.operators.serve import LocalServer

    idx, _ = pp_index
    srv = LocalServer(idx).warm(['"foo bar"*'])
    for q in ['"foo bar"*', 'alone OR "foo bar"*', '^"foo bar"*',
              'NEAR("foo bar"* mix, 3)', '"foo bar"* NOT two']:
        dist = [(r["doc_id"], r["score"]) for r in idx.search_expr(q, 10).collect()]
        served = list(
            srv.search_expr(q, 10)[["doc_id", "score"]]
            .itertuples(index=False, name=None)
        )
        assert served == dist, q


@pytest.mark.parametrize("query", ['"foo bar"*', '^"foo bar"*'])
def test_highlight_parity(fts5pp, pp_index, query):
    from sparkgrep.operators.snippet import search_highlight

    idx, corpus = pp_index
    ref = {
        r[0]: r[1]
        for r in fts5pp.execute(
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
    """Phrase-prefix on a MULTI-FIELD index: per-(doc, field) instances,
    colset filters live — exact vs SQLite's 2-column fts5 table."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.sources.corpus import with_ingest_columns

    titles = ["foo bar title", "other words here", "foo barrel title",
              "plain thing", "foo bar again"]
    bodies = ["body without it", "body foo barn inside", "foo bar in body",
              "foo alone body", "barrel body foo bart end"]
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
    out = str(tmp_path_factory.mktemp("ppmc") / "idx")
    build_index(corpus, out, analyzer="fts5", idf_variant="fts5",
                n_buckets=4, store_positions=True,
                fields=["title", "content"])
    idx = InvertedIndex(spark, out)
    from sparkgrep.operators.serve import LocalServer
    srv = LocalServer(idx)

    for q_ref, q_eng in [
        ('"foo bar"*', '"foo bar"*'),
        ('title:"foo bar"*', 'title:"foo bar"*'),
        ('body:"foo bar"* OR plain', 'content:"foo bar"* OR plain'),
        ('NEAR("foo bar"* end, 4)', 'NEAR("foo bar"* end, 4)'),
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
