"""Generate sparkgrep/functions/_trigramfold.py by probing the installed
SQLite's fts5 ``trigram`` tokenizer (public SQLite feature, fts5 docs
§4.3.3; added in 3.34).

The trigram tokenizer (default ``case_sensitive=0 remove_diacritics=0``)
emits every contiguous 3-CODEPOINT window of the text after a simple
per-codepoint case fold — no separator classes at all (whitespace,
punctuation, control chars are all token characters), no diacritic
removal, and the fold is context-free and 1:1 (probed: ß, ﬁ, ŉ, İ and
the astral planes stay as-is; Σ→σ including final position). Rather
than re-deriving SQLite's fold table from its fts5_unicode2.c source,
this tool asks the engine: every codepoint cp is inserted as the 3-cp
document ``chr(cp)*3`` into a bare trigram fts5 table (rowid = cp) and
the single resulting vocab term ``fold(cp)*3`` read back through
fts5vocab. The run ASSERTS the 1:1 length-preserving property the
engine's tokenizer relies on (a violation would change window offsets).

Deterministic given the SQLite build; run
``python tools/gen_trigram_fold.py`` to regenerate.
"""

from __future__ import annotations

import sqlite3
import sys

OUT = "sparkgrep/functions/_trigramfold.py"


def probe_all(limit: int = 0x110000) -> dict[int, str]:
    db = sqlite3.connect(":memory:")
    db.execute("PRAGMA journal_mode=OFF")
    db.execute("CREATE VIRTUAL TABLE t USING fts5(c, tokenize='trigram')")
    db.execute("CREATE VIRTUAL TABLE v USING fts5vocab(t, 'instance')")
    cur = db.cursor()

    rows = []
    skipped: list[int] = []
    for cp in range(1, limit):  # NUL is untestable through C strings
        if 0xD800 <= cp <= 0xDFFF:  # surrogates: not encodable
            continue
        rows.append((cp, chr(cp) * 3))
    cur.executemany("INSERT INTO t(rowid, c) VALUES (?, ?)", rows)

    fold: dict[int, str] = {}
    seen: set[int] = set()
    for term, doc in cur.execute("SELECT term, doc FROM v WHERE offset = 0"):
        seen.add(doc)
        src = chr(doc)
        assert len(term) == 3, (doc, term)  # 1:1 fold — offsets depend on it
        assert term == term[0] * 3, (doc, term)
        if term[0] != src:
            fold[doc] = term[0]
    for cp, _ in rows:
        if cp not in seen:
            skipped.append(cp)  # engine indexed nothing: treat as identity
    if skipped:
        print(f"note: {len(skipped)} cps yielded no vocab row "
              f"(first: {[hex(c) for c in skipped[:8]]}) — kept as identity",
              file=sys.stderr)
    return fold


def main() -> None:
    fold = probe_all()
    with open(OUT, "w") as f:
        f.write(
            '"""SQLite fts5 trigram tokenizer case-fold table — GENERATED '
            "by\ntools/gen_trigram_fold.py from the installed SQLite "
            f"({sqlite3.sqlite_version}); do not edit.\n\n"
            "Per-codepoint simple fold (1:1, context-free, no diacritic\n"
            'removal — the tokenizer\'s defaults), as a str.translate map.\n"""\n\n'
        )
        f.write("TRIGRAM_FOLD: dict[int, str] = {\n")
        for cp in sorted(fold):
            f.write(f"    {cp}: {fold[cp]!r},\n")
        f.write("}\n")
    print(f"wrote {OUT}: {len(fold)} non-identity folds")


if __name__ == "__main__":
    main()
