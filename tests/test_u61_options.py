"""FTS5 unicode61 tokenizer OPTIONS parity — probed and pinned against
the installed SQLite (sqlite.org/fts5.html#unicode61_tokenizer):

- ``remove_diacritics`` 0/1/2: probe-generated fold tables (0 = case
  folds only; 2 additionally folds the 112 multi-diacritic precomposed
  codepoints level 1 leaves alone — FOLD2_DIFF);
- ``tokenchars`` / ``separators``: class edits on RAW codepoints before
  case folding (probed: ``separators 'b'`` splits ``abc`` but not
  ``aBc``), last declaration winning per character;
- the ``unicode61`` base analyzer — FTS5's DEFAULT tokenizer (no
  porter) — and option specs on ``fts5`` (porter-wrapped);
- constructor error parity for the inputs SQLite refuses.

Token streams are compared via fts5vocab 'instance'; bm25 rank/score
parity runs the full grammar (phrase/prefix/NEAR/^) over an
option-spec'd index at ≤1e-9.
"""

from __future__ import annotations

import random
import sqlite3

import pandas as pd
import pytest

from sparkgrep.functions.tokenizer import tokenize_py, validate_analyzer
from sparkgrep.operators.index_build import build_index
from sparkgrep.operators.query import InvertedIndex
from sparkgrep.sources.corpus import with_ingest_columns

TEXTS = [
    "Héllo WÖRLD naïve café crème-brûlée",
    "Ǖber ǖber Ǟhnlich Ấn Ǚ Ǜ",          # multi-diacritic precomposed (rd1 != rd2)
    "Héllo Åb ño é̂̃x",  # combining runs
    "ά αλφα Й Москва ΟΔΥΣΣΕΥΣ οδυσσεύς ς",
    "foo-bar_baz x-y A*B a*b%c O_o",
    "Running runs RUN runner happiness caresses ponies",
    "abc123 42-x3 0xFF 3.14159",
    "... --- ___ *** '' \"\"",
    "KK kelvin ß strasse ﬁﬂ",
    "sort-merge JOIN hash-JOIN outer_join",
    # token-LEADING combining marks: skipped at token start (SQLite's
    # fixed isdiacritic nonstarter set), kept mid-token — visible
    # under remove_diacritics 0
    "̊a b̊a ́̃x ̊",
]

# (engine analyzer spec, sqlite tokenize= string)
SPECS = [
    ("unicode61", "unicode61"),
    ("unicode61 remove_diacritics 0", "unicode61 remove_diacritics 0"),
    ("unicode61 remove_diacritics 2", "unicode61 remove_diacritics 2"),
    ("fts5 remove_diacritics 0", "porter unicode61 remove_diacritics 0"),
    ("fts5 remove_diacritics 2", "porter unicode61 remove_diacritics 2"),
    ("unicode61 tokenchars '-_'", "unicode61 tokenchars '-_'"),
    ("unicode61 separators 'oO'", "unicode61 separators 'oO'"),
    # a char declared BOTH ways: last declaration wins (probed)
    ("unicode61 tokenchars '-' separators '-'",
     "unicode61 tokenchars '-' separators '-'"),
    ("unicode61 separators '-' tokenchars '-'",
     "unicode61 separators '-' tokenchars '-'"),
    ("fts5 remove_diacritics 2 tokenchars '._'",
     "porter unicode61 remove_diacritics 2 tokenchars '._'"),
]


def _sqlite_tokens(db, tokenize: str, text: str) -> list[str]:
    db.execute("DROP TABLE IF EXISTS t")
    db.execute("DROP TABLE IF EXISTS v")
    db.execute(f"CREATE VIRTUAL TABLE t USING fts5(c, tokenize={tokenize!r})")
    db.execute("CREATE VIRTUAL TABLE v USING fts5vocab(t, 'instance')")
    db.execute("INSERT INTO t VALUES (?)", (text,))
    return [
        r[0]
        for r in db.execute("SELECT term, offset FROM v ORDER BY offset")
    ]


@pytest.fixture(scope="module")
def db():
    return sqlite3.connect(":memory:")


@pytest.mark.parametrize("ours,theirs", SPECS, ids=[s for s, _ in SPECS])
def test_token_stream_parity(db, ours, theirs):
    for text in TEXTS:
        assert tokenize_py(text, ours) == _sqlite_tokens(db, theirs, text), (
            ours,
            text,
        )


def test_token_stream_fuzz(db):
    pool = (
        "abcXYZ 012-_.*' àÀçÇñÑéÉüÜ ǕǖǞǟǙǜ ́̊̃ "
        "αΑβΒςΣ йЙжЖ Kßﬁ ①½"
    )
    rng = random.Random(20260819)
    for _ in range(60):
        text = "".join(rng.choice(pool) for _ in range(rng.randrange(0, 40)))
        ours, theirs = SPECS[rng.randrange(len(SPECS))]
        assert tokenize_py(text, ours) == _sqlite_tokens(db, theirs, text), (
            ours,
            repr(text),
        )


def test_constructor_error_parity(db):
    """Every spec SQLite refuses ('error in tokenizer constructor') our
    validate_analyzer refuses too, driver-side."""
    bad = [
        "unicode61 remove_diacritics 3",
        "unicode61 remove_diacritics x",
        "unicode61 bogus_option 1",
        "unicode61 tokenchars",  # missing value
    ]
    for spec in bad:
        # fresh connection per attempt: a FAILED fts5 CREATE leaves a
        # phantom schema entry whose later DROP re-raises the error
        with pytest.raises(sqlite3.OperationalError):
            _sqlite_tokens(sqlite3.connect(":memory:"), spec, "x")
        with pytest.raises(ValueError):
            validate_analyzer(spec)
    # categories: SQLite accepts, we refuse with a documented divergence
    with pytest.raises(ValueError, match="categories"):
        validate_analyzer("unicode61 categories 'L* N* Co'")
    # quoted values and '' escapes parse exactly like FTS5's syntax
    validate_analyzer("unicode61 tokenchars ''''")
    assert tokenize_py("a'b", "unicode61 tokenchars ''''") == _sqlite_tokens(
        db, "unicode61 tokenchars ''''", "a'b"
    )


QUERIES = [
    "café",
    "creme OR crème",
    'crème brûlée',               # multi-token bareword → phrase (u61 family)
    '"naïve café"',
    "hél*",
    "NEAR(héllo café, 6)",
    "^héllo wörld",
    "moscow OR Москва",
    "strasse OR straße",
]


@pytest.fixture(scope="module")
def u61_corpus(spark):
    pdf = pd.DataFrame(
        {
            "repo": "r",
            "path": [f"p/{i}" for i in range(len(TEXTS))],
            "commit": "c0",
            "lang": None,
            "content": TEXTS,
            "doc_id": range(len(TEXTS)),
        }
    )
    return with_ingest_columns(spark.createDataFrame(pdf))


@pytest.mark.parametrize(
    "ours,theirs",
    [
        ("unicode61", "unicode61"),
        ("unicode61 remove_diacritics 0", "unicode61 remove_diacritics 0"),
        ("fts5 remove_diacritics 2 tokenchars '-'",
         "porter unicode61 remove_diacritics 2 tokenchars '-'"),
    ],
    ids=["u61", "u61rd0", "fts5rd2tc"],
)
def test_bm25_rank_identical(spark, u61_corpus, tmp_path, db, ours, theirs):
    """Full-grammar bm25 parity over an option-spec'd index: the spec
    threads through indexing, query lexing, phrase/prefix/NEAR/anchor
    machinery and scoring."""
    db.execute("DROP TABLE IF EXISTS t")
    db.execute("DROP TABLE IF EXISTS v")
    db.execute(f"CREATE VIRTUAL TABLE t USING fts5(c, tokenize={theirs!r})")
    db.executemany(
        "INSERT INTO t(rowid, c) VALUES (?, ?)", list(enumerate(TEXTS))
    )
    out = str(tmp_path / "idx")
    build_index(
        u61_corpus, out, analyzer=ours, idf_variant="fts5",
        n_buckets=4, store_positions=True,
    )
    idx = InvertedIndex(spark, out)
    for q in QUERIES:
        want = db.execute(
            "SELECT rowid, bm25(t) FROM t WHERE t MATCH ? "
            "ORDER BY bm25(t) ASC, rowid ASC LIMIT 20",
            (q,),
        ).fetchall()
        got = idx.search_expr(q, k=20).toPandas()
        assert got["doc_id"].tolist() == [r[0] for r in want], (ours, q)
        for (_rid, fts), eng in zip(want, got["score"]):
            assert abs(-fts - eng) <= 1e-9, (ours, q, fts, eng)
