"""The fts5 analyzer is token-exact with SQLite's porter tokenizer
(unicode61 word-split + case-fold + remove_diacritics, then porter) —
fuzzed against the installed SQLite via fts5vocab, which is the actual
engine the reference uses (message_manager.py:108-110).

These pins cover the deviations SQLite's porter makes from the classic
1980 algorithm (see sparkgrep/functions/porter.py docstring): digit
tokens ARE stemmed, the 3..64-byte window, proper-suffix guards with
match-stops-chain semantics, and the context-free 'y' in the
double-consonant test.
"""

from __future__ import annotations

import random
import sqlite3

import pytest

from sparkgrep.functions.porter import porter_stem
from sparkgrep.functions.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def sq():
    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE t USING fts5(c, tokenize='porter')")
    db.execute("CREATE VIRTUAL TABLE v USING fts5vocab(t, 'instance')")
    cur = db.cursor()

    def tokens(text: str) -> list[str]:
        cur.execute("DELETE FROM t")
        cur.execute("INSERT INTO t VALUES (?)", (text,))
        return [
            r[0]
            for r in cur.execute(
                "SELECT term FROM v ORDER BY offset"
            )
        ]

    return tokens


EDGES = [
    # (input, expected) — each pins one discovered SQLite deviation
    ("d8ce273e", ["d8ce273"]),   # digits are consonants; digit tokens stem
    ("abc1ing", ["abc1"]),
    ("ies", ["ie"]),             # proper-suffix guard: classic gives "i"
    ("eed", ["e"]),              # guard fails -> falls through to "ed" rule
    ("sses", ["sse"]),           # guard fails -> single-s drop
    ("feed", ["feed"]),          # suffix matched, m=0: chain STOPS
    ("yying", ["y"]),            # 'y' is a consonant in the double-cons test
    ("ÉTUDES Café", ["etud", "cafe"]),   # fold + stem
    ("ΑΣ naïve", ["ασ", "naiv"]),        # sigma: simple fold, not final-form
    ("run2ning", ["run2n"]),
    ("a" * 65 + "ing", ["a" * 65 + "ing"]),  # >64 bytes: pass-through
]


@pytest.mark.parametrize("text,want", EDGES)
def test_pinned_edges(sq, text, want):
    assert tokenize_py(text, "fts5") == sq(text) == want


def test_fuzz_single_tokens(sq):
    random.seed(1234)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    suff = [
        "", "s", "es", "ies", "sses", "ed", "eed", "ing", "ation",
        "tional", "ational", "izer", "logi", "bli", "alli", "entli",
        "eli", "ousli", "ization", "ator", "alism", "iveness",
        "fulness", "ousness", "aliti", "iviti", "biliti", "icate",
        "ative", "alize", "iciti", "ical", "ful", "ness", "al", "ance",
        "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
        "ent", "ion", "sion", "tion", "ou", "ism", "ate", "iti", "ous",
        "ive", "ize", "e", "y", "ly", "ll", "at", "bl", "iz", "ying",
        "ied", "eedly",
    ]
    for _ in range(20000):
        w = "".join(
            random.choice(alpha) for _ in range(random.randint(1, 10))
        ) + random.choice(suff)
        if not w:
            continue
        assert tokenize_py(w, "fts5") == sq(w), w


def test_fuzz_mixed_text(sq):
    """Multi-token strings: separator classification, astral chars,
    diacritics, casing — the whole pipeline, not just the stemmer."""
    random.seed(77)
    pool = (
        "abcdefgh XYZ 0189 \t,.;!?()[]«»—"
        "éÉàÀöÖøØßΣσαβАБвгśżłŁ中文東京🎉😀𝕏𐌰"
    )
    for _ in range(2000):
        text = "".join(
            random.choice(pool) for _ in range(random.randint(0, 60))
        )
        assert tokenize_py(text, "fts5") == sq(text), repr(text)


def test_porter_idempotent_on_output_length():
    # stemming never grows a token beyond input+1 ('e' re-append)
    for w in ("rate", "hopping", "controlling", "ba", "x"):
        assert len(porter_stem(w)) <= len(w) + 1
