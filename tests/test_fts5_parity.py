"""Rank-identity against the REFERENCE's actual retrieval engine.

The reference's keyword search is SQLite FTS5 with porter tokenization
and bm25() ranking over (subject, body_text, sender)
(message_manager.py:101-110, 225-264). This test feeds the reference's
own 80-email corpus (sample-messages.jsonl, base64 bodies decoded — the
same bytes both engines see) to:

  a) a real SQLite FTS5 table — the reference's engine verbatim, and
  b) sparkgrep with analyzer='fts5' and idf_variant='fts5',

and asserts top-k docIDs are rank-identical and scores equal (engine
score = -bm25() score; FTS5 sorts ASC because more negative = better,
message_manager.py:246). FTS5's bm25 with default column weights equals
BM25 over the concatenated columns, with idf clamped to 1e-6 when ≤ 0 —
both facts are pinned here against the real SQLite.
"""

from __future__ import annotations

import base64
import json
import sqlite3

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkgrep.operators import score as S
from sparkgrep.operators import stats as ST

SAMPLE = "/root/reference/sample-messages.jsonl"

# disjunctive keyword queries (the engine's query model, SURVEY R8);
# FTS5 gets the same terms joined with OR
QUERIES = [
    "receipt",
    "order shipping discount",
    "meeting calendar invite",
    "flight travel confirmation",
    "run running runner",       # stemming behavior
    "newsletter unsubscribe weekly",
    "the",                      # hot term → clamped idf path
    "zqzqzq",                   # no match
]


@pytest.fixture(scope="module")
def emails() -> pd.DataFrame:
    rows = []
    with open(SAMPLE) as f:
        for i, line in enumerate(f):
            if not line.strip():
                continue
            m = json.loads(line)
            body = base64.b64decode(m["body"]).decode("utf-8", errors="replace")
            rows.append(
                {
                    "doc_id": i,
                    "subject": m["subject"],
                    "body_text": body,
                    "sender": m["from"],
                }
            )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def fts5(emails):
    db = sqlite3.connect(":memory:")
    db.execute(
        "CREATE VIRTUAL TABLE msgs USING fts5"
        "(subject, body_text, sender, tokenize='porter')"
    )
    db.executemany(
        "INSERT INTO msgs(rowid, subject, body_text, sender) VALUES (?,?,?,?)",
        list(emails.itertuples(index=False, name=None)),
    )
    return db


@pytest.fixture(scope="module")
def engine(spark, emails):
    corpus = spark.createDataFrame(
        emails.assign(
            content=emails.subject + "\n" + emails.body_text + "\n" + emails.sender
        )[["doc_id", "content"]]
    )
    tf = ST.term_freqs(corpus, "fts5").cache()
    stats = ST.corpus_stats(ST.doc_lengths(corpus, "fts5"))
    return tf, stats


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identical_to_reference_fts5(fts5, engine, query):
    k = 20
    match = " OR ".join(query.split())
    ref = fts5.execute(
        "SELECT rowid, bm25(msgs) FROM msgs WHERE msgs MATCH ? "
        "ORDER BY bm25(msgs) ASC, rowid ASC LIMIT ?",
        (match, k),
    ).fetchall()

    tf, stats = engine
    got = (
        S.search(tf, stats, query, k=k, analyzer="fts5", idf_variant="fts5")
        .toPandas()
    )

    assert got["doc_id"].tolist() == [r[0] for r in ref], query
    # engine positive-is-better == negated FTS5 lower-is-better
    for (_, fts_score), eng_score in zip(ref, got["score"]):
        assert abs(-fts_score - eng_score) <= 1e-9, (query, fts_score, eng_score)


def test_stemming_matches_reference(fts5, engine):
    """Reference behavioral spec (test_message_manager.py:681-704):
    querying 'run' retrieves docs containing running/runs."""
    tf, stats = engine
    ref_ids = {r[0] for r in fts5.execute(
        "SELECT rowid FROM msgs WHERE msgs MATCH 'run'").fetchall()}
    got_ids = {
        r["doc_id"]
        for r in S.search(tf, stats, "run", k=100, analyzer="fts5",
                          idf_variant="fts5").collect()
    }
    assert got_ids == ref_ids


def test_case_insensitive(engine):
    tf, stats = engine
    a = S.search(tf, stats, "RECEIPT Delta", k=10, analyzer="fts5", idf_variant="fts5").toPandas()
    b = S.search(tf, stats, "receipt delta", k=10, analyzer="fts5", idf_variant="fts5").toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert (a["score"] == b["score"]).all()


# ---------------------------------------------------------------------------
# F2: HTML→text cleaning ON — both engines get the CLEANED bodies
# (reference pipeline order: decode base64 → html_to_text → index,
# process_email_body.py:8-12)


@pytest.fixture(scope="module")
def emails_clean(emails) -> pd.DataFrame:
    from sparkgrep.functions.html import html_to_text_py

    out = emails.copy()
    out["body_text"] = out["body_text"].map(html_to_text_py)
    return out


@pytest.fixture(scope="module")
def fts5_clean(emails_clean):
    db = sqlite3.connect(":memory:")
    db.execute(
        "CREATE VIRTUAL TABLE msgs USING fts5"
        "(subject, body_text, sender, tokenize='porter')"
    )
    db.executemany(
        "INSERT INTO msgs(rowid, subject, body_text, sender) VALUES (?,?,?,?)",
        list(emails_clean.itertuples(index=False, name=None)),
    )
    return db


@pytest.fixture(scope="module")
def engine_clean(spark, emails_clean):
    corpus = spark.createDataFrame(
        emails_clean.assign(
            content=emails_clean.subject
            + "\n"
            + emails_clean.body_text
            + "\n"
            + emails_clean.sender
        )[["doc_id", "content"]]
    )
    tf = ST.term_freqs(corpus, "fts5").cache()
    stats = ST.corpus_stats(ST.doc_lengths(corpus, "fts5"))
    return tf, stats


@pytest.mark.parametrize("query", QUERIES[:5])
def test_rank_identical_with_html_cleaning(fts5_clean, engine_clean, query):
    k = 20
    match = " OR ".join(query.split())
    ref = fts5_clean.execute(
        "SELECT rowid, bm25(msgs) FROM msgs WHERE msgs MATCH ? "
        "ORDER BY bm25(msgs) ASC, rowid ASC LIMIT ?",
        (match, k),
    ).fetchall()
    tf, stats = engine_clean
    got = S.search(tf, stats, query, k=k, analyzer="fts5", idf_variant="fts5").toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in ref], query
    for (_, fts_score), eng_score in zip(ref, got["score"]):
        assert abs(-fts_score - eng_score) <= 1e-9, (query, fts_score, eng_score)


def test_html_cleaning_semantics():
    from sparkgrep.functions.html import html_to_text_py

    assert html_to_text_py(
        '<p>Hello <b>world</b></p><script>var x=1;</script><p>bye</p>'
    ) == "Hello world\n\nbye"
    assert html_to_text_py(
        '<a href="http://x.com">Click here</a> now'
    ) == "Click here (http://x.com) now"
    assert html_to_text_py('<a href="http://x.com"></a>') == ""
    assert html_to_text_py('<a>bare text</a>') == "bare text"
    assert html_to_text_py('<img alt="Company logo"> <img alt="x">') == (
        "[Image: Company logo] [Image]"
    )
    assert html_to_text_py("<ul><li>one</li><li>two</li></ul>") == "• one\n• two"
    assert html_to_text_py("a &amp; b &lt;tag&gt;") == "a & b <tag>"
    assert html_to_text_py("<style>.x{}</style>visible") == "visible"
    assert html_to_text_py(None) == "" and html_to_text_py("") == ""


def test_html_cleaning_udf_matches_py(spark, emails):
    from sparkgrep.functions.html import html_to_text_col, html_to_text_py

    df = spark.createDataFrame(emails[["doc_id", "body_text"]])
    got = {
        r["doc_id"]: r["clean"]
        for r in df.select(
            "doc_id", html_to_text_col(F.col("body_text")).alias("clean")
        ).collect()
    }
    for r in emails.itertuples():
        assert got[r.doc_id] == html_to_text_py(r.body_text)


# ---------------------------------------------------------------------------
# phrase-query parity against the real FTS5 (single-column table: FTS5
# positions are per-column, so a fair comparison can't concatenate)


@pytest.fixture(scope="module")
def fts5_body(emails_clean):
    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE bodies USING fts5(body_text, tokenize='porter')")
    db.executemany(
        "INSERT INTO bodies(rowid, body_text) VALUES (?,?)",
        list(emails_clean[["doc_id", "body_text"]].itertuples(index=False, name=None)),
    )
    return db


@pytest.fixture(scope="module")
def body_index(spark, emails_clean, tmp_path_factory):
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.sources.corpus import with_ingest_columns

    pdf = emails_clean.rename(columns={"body_text": "content"})
    pdf["repo"] = "inbox"
    pdf["path"] = pdf["doc_id"].map(lambda i: f"mail/{i}")
    pdf["commit"] = "c0"
    pdf["lang"] = None
    corpus = with_ingest_columns(
        spark.createDataFrame(
            pdf[["repo", "path", "commit", "lang", "content", "doc_id"]]
        )
    )
    out = str(tmp_path_factory.mktemp("fts5pos") / "idx")
    build_index(
        corpus, out, analyzer="fts5", idf_variant="fts5",
        n_buckets=8, store_positions=True,
    )
    return InvertedIndex(spark, out)


PHRASES = [
    '"thank you"',        # 3 matching docs in the reference corpus
    '"let me know"',      # 5 (3-token phrase)
    '"thank you" OR unsubscribe',  # boolean mix, 30+ docs
    '"order confirmation"',        # no matches — empty == empty
    '"running shoes"',
]


@pytest.mark.parametrize("phrase", PHRASES)
def test_phrase_rank_identical_to_reference_fts5(fts5_body, body_index, phrase):
    k = 20
    ref = fts5_body.execute(
        "SELECT rowid, bm25(bodies) FROM bodies WHERE bodies MATCH ? "
        "ORDER BY bm25(bodies) ASC, rowid ASC LIMIT ?",
        (phrase, k),
    ).fetchall()
    got = body_index.search_expr(phrase, k=k).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in ref], phrase
    for (_, fts_score), eng_score in zip(ref, got["score"]):
        assert abs(-fts_score - eng_score) <= 1e-9, (phrase, fts_score, eng_score)


NOT_QUERIES = [
    'unsubscribe NOT "thank you"',
    '"let me know" NOT meeting',
    "you NOT thank",
    "thank NOT you NOT know",   # chained NOT
    "unsub*",                   # prefix (one atom, tf summed over matches)
    "meet* OR thank",           # prefix in a disjunction
    "order* NOT meeting",       # prefix + NOT
    "runn*",                    # stems through porter first (FTS5 behavior)
    '("thank you" OR unsubscribe) NOT meeting',  # parens + NOT
    # FTS5 needs explicit AND after a ')' (implicit AND is a syntax
    # error there); the engine accepts both forms
    "(thank OR know) AND you",                    # parens → DNF
    "(unsubscribe OR meeting) AND (you OR thank)",  # product of groups
    "NEAR(thank you, 2)",                         # proximity
    "NEAR(thank you, 0)",                         # adjacency only
    'NEAR("let me" know, 4)',                     # phrase member
    "NEAR(meet* you, 6)",                         # prefix member
    "NEAR(you know, 5) NOT meeting",              # NEAR + NOT
    "NEAR(you thank know, 8)",                    # 3 members
    "NEAR(you thank, 1)",                         # constrained member tf
    "NEAR(you your, 2) OR unsubscribe",           # NEAR in a disjunction
    "thank OR NEAR(thank you, 0)",                # plain + member atom mix
    # exact NOT-of-group semantics (AND / NEAR / nested operands)
    "you NOT (thank meeting)",
    "unsubscribe NOT (thank AND you)",
    "you NOT NEAR(thank meeting, 5)",
    "you NOT (thank NOT meeting)",
    'know NOT ("thank you" OR meeting)',          # OR-of-units operand
    # per-disjunct contribution gating (unit present, subtree unmatched)
    "meeting OR (you NOT thank)",
    "(meeting you) OR unsubscribe",
    "thank OR (meeting NOT you)",
    # duplicated atoms: FTS5 scores each textual occurrence separately
    # (probed: 'alpha alpha' = 'alpha OR alpha' = 2× alpha) — the lexer
    # numbers repeat occurrences into distinct atoms
    "thank thank",
    "you AND you",
    "thank OR thank",
    "(thank OR you) AND (thank OR you)",
    '"thank you" OR "thank you"',
    "NEAR(you thank, 3) OR NEAR(you thank, 3)",
    "NEAR(you you, 2)",  # duplicate members (same instance may serve both)
    # '^' initial-token anchor
    "^thank",
    '^"thank you"',
    "^thank*",
    "^hi OR ^hello",
    "you NOT ^thank",
    "^thank OR meeting",
]


@pytest.mark.parametrize("query", NOT_QUERIES)
def test_not_rank_identical_to_reference_fts5(fts5_body, body_index, query):
    """FTS5 binary NOT: matched set and bm25 ranking must both agree with
    real SQLite FTS5 (the excluded operand contributes nothing to
    surviving docs, so scores equal the include-unit sums)."""
    k = 20
    ref = fts5_body.execute(
        "SELECT rowid, bm25(bodies) FROM bodies WHERE bodies MATCH ? "
        "ORDER BY bm25(bodies) ASC, rowid ASC LIMIT ?",
        (query, k),
    ).fetchall()
    got = body_index.search_expr(query, k=k).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in ref], query
    for (_, fts_score), eng_score in zip(ref, got["score"]):
        assert abs(-fts_score - eng_score) <= 1e-9, (query, fts_score, eng_score)


def test_phrase_parity_covers_nonempty_results(fts5_body):
    hits = sum(
        len(fts5_body.execute(
            "SELECT rowid FROM bodies WHERE bodies MATCH ?", (p,)
        ).fetchall()) > 0
        for p in PHRASES
    )
    assert hits >= 2, "phrase parity must exercise real matches"
