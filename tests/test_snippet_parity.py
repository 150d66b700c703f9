"""highlight()/snippet() parity with real SQLite FTS5.

Two layers:
- pure-function fuzz (no Spark): random punctuated docs and query
  shapes, every matching doc's highlight/snippet string compared
  byte-for-byte against SQLite's aux functions;
- end-to-end Spark operators on the reference's own 80-email corpus
  (single-field and 3-column indexes).
"""

from __future__ import annotations

import base64
import json
import random
import sqlite3

import pytest

from sparkgrep.functions.querylang import parse_query
from sparkgrep.operators.snippet import (
    choose_window,
    doc_instances,
    render_highlight,
    render_snippet,
    tokenize_offsets,
)

SAMPLE = "/root/reference/sample-messages.jsonl"


def _aux_row(text_cols, query, n):
    """Our highlight (per col) + snippet(col=-1) for one doc."""
    pq = parse_query(query, "fts5", fields=None if len(text_cols) == 1 else FIELDS)
    spans = [tokenize_offsets(t, "fts5") for t in text_cols]
    toks = [[t for (t, _a, _b) in sp] for sp in spans]
    insts = doc_instances(pq, toks)
    per_col = [[] for _ in text_cols]
    for (c, s, w, u) in insts:
        per_col[c].append((s, w, u))
    highlights = [
        render_highlight(
            text_cols[c], spans[c], [(s, s + w) for (s, w, _u) in per_col[c]],
            "[", "]",
        )
        for c in range(len(text_cols))
    ]
    c_sel, start = choose_window(per_col, text_cols, spans, n, -1)
    snip = render_snippet(
        text_cols[c_sel], spans[c_sel],
        [(s, s + w) for (s, w, _u) in per_col[c_sel]],
        start, n, "[", "]", "…",
    )
    return highlights, snip


FIELDS = ["subject", "body_text", "sender"]


@pytest.fixture(scope="module")
def emails():
    rows = []
    with open(SAMPLE) as f:
        for i, line in enumerate(f):
            if not line.strip():
                continue
            m = json.loads(line)
            body = base64.b64decode(m["body"]).decode("utf-8", errors="replace")
            rows.append((i, m["subject"], body, m["from"]))
    return rows


QUERIES = [
    ("receipt", 8),
    ("order OR shipping OR discount", 8),
    ("meeting calendar", 10),
    ('"your order"', 8),
    ("ship*", 6),
    ("order NOT shipping", 8),
    ("(order OR receipt) NOT (shipping confirmation)", 8),
    ("NEAR(order shipped, 6)", 10),
    ("^re", 5),
    ("order order", 8),
    ("the", 4),
]


def test_fuzz_single_col_vs_sqlite():
    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE t USING fts5(c, tokenize='porter')")
    random.seed(31)
    vocab = ["alpha", "beta", "gamma", "delta", "run", "running", "ship",
             "shipped", "order", "receipt", "the", "a99", "x"]
    seps = [" ", "  ", ". ", ": ", ", ", "; ", "\n", " - ",
            ":", ".", ".; ", ",. ", ":\n", ". . "]
    queries = [
        ("alpha", 4), ("alpha OR beta", 6), ("alpha beta", 8),
        ('"alpha beta"', 5), ("run*", 6), ("alpha NOT beta", 6),
        ("(alpha OR beta) NOT (gamma delta)", 8),
        ("NEAR(alpha beta, 3)", 6), ("^alpha", 4), ("alpha alpha", 6),
        ('"alpha beta" OR beta', 7),
    ]
    n_checked = 0
    for trial in range(300):
        ntok = random.randint(1, 25)
        doc = ""
        for i in range(ntok):
            doc += random.choice(vocab) + random.choice(seps)
        db.execute("DELETE FROM t")
        db.execute("INSERT INTO t(rowid, c) VALUES (1, ?)", (doc,))
        for q, n in queries:
            row = db.execute(
                "SELECT highlight(t,0,'[',']'), snippet(t,0,'[',']','…',?) "
                "FROM t WHERE t MATCH ?",
                (n, q),
            ).fetchone()
            if row is None:
                continue
            want_h, want_s = row
            (got_h,), got_s = _aux_row([doc], q, n)
            assert got_h == want_h, (q, doc)
            assert got_s == want_s, (q, n, doc)
            n_checked += 1
    assert n_checked > 500


def test_email_corpus_vs_sqlite_single_col(emails):
    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE t USING fts5(c, tokenize='porter')")
    db.executemany(
        "INSERT INTO t(rowid, c) VALUES (?, ?)",
        [(i, body) for (i, _s, body, _f) in emails],
    )
    for q, n in QUERIES:
        for rowid, want_h, want_s in db.execute(
            "SELECT rowid, highlight(t,0,'[',']'), "
            "snippet(t,0,'[',']','…',?) FROM t WHERE t MATCH ?",
            (n, q),
        ):
            body = emails[rowid][2]
            (got_h,), got_s = _aux_row([body], q, n)
            assert got_h == want_h, (q, rowid)
            assert got_s == want_s, (q, n, rowid)


MC_QUERIES = [
    ("receipt", 8),
    ("subject:order", 8),
    ('{subject sender}:re*', 6),
    ("order OR discount", 8),
    ('"your order"', 8),
]


def test_email_corpus_vs_sqlite_multicol(emails):
    db = sqlite3.connect(":memory:")
    db.execute(
        "CREATE VIRTUAL TABLE t USING fts5"
        "(subject, body_text, sender, tokenize='porter')"
    )
    db.executemany(
        "INSERT INTO t(rowid, subject, body_text, sender) VALUES (?,?,?,?)",
        emails,
    )
    for q, n in MC_QUERIES:
        for rowid, h0, h1, h2, want_s in db.execute(
            "SELECT rowid, highlight(t,0,'[',']'), highlight(t,1,'[',']'), "
            "highlight(t,2,'[',']'), snippet(t,-1,'[',']','…',?) "
            "FROM t WHERE t MATCH ?",
            (n, q),
        ):
            cols = list(emails[rowid][1:])
            got_h, got_s = _aux_row(cols, q, n)
            assert got_h == [h0, h1, h2], (q, rowid)
            assert got_s == want_s, (q, n, rowid)


def test_spark_operators(spark, emails):
    import tempfile

    import pandas as pd

    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.operators.snippet import search_highlight, search_snippet

    pdf = pd.DataFrame(
        [(i, body) for (i, _s, body, _f) in emails],
        columns=["doc_id", "content"],
    )
    corpus = spark.createDataFrame(pdf)
    out = tempfile.mkdtemp(prefix="snip_") + "/idx"
    build_index(
        corpus, out, analyzer="fts5", idf_variant="fts5",
        store_positions=True, n_buckets=8,
    )
    idx = InvertedIndex(spark, out)

    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE t USING fts5(c, tokenize='porter')")
    db.executemany(
        "INSERT INTO t(rowid, c) VALUES (?, ?)",
        [(i, body) for (i, _s, body, _f) in emails],
    )
    for q, n in [("receipt", 8), ('"official receipt"', 8), ("confirm*", 6)]:
        want = dict(
            db.execute(
                "SELECT rowid, snippet(t,0,'<b>','</b>','…',?) "
                "FROM t WHERE t MATCH ?",
                (n, q),
            )
        )
        assert want, f"probe query {q!r} matches nothing — pick another"
        got = search_snippet(idx, corpus, q, k=100, n_tokens=n).collect()
        assert {r["doc_id"] for r in got} == set(want), q
        for r in got:
            assert r["snippet"] == want[r["doc_id"]], (q, r["doc_id"])
        want_h = dict(
            db.execute(
                "SELECT rowid, highlight(t,0,'<b>','</b>') "
                "FROM t WHERE t MATCH ?",
                (q,),
            )
        )
        got_h = search_highlight(idx, corpus, q, k=100).collect()
        assert {r["doc_id"] for r in got_h} == set(want_h), q
        for r in got_h:
            assert r["highlight"] == want_h[r["doc_id"]], (q, r["doc_id"])
