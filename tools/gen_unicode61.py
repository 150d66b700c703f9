"""Generate sparkgrep/functions/_unicode61.py by probing the installed
SQLite's fts5 unicode61 tokenizer (the reference's tokenizer,
message_manager.py:108-110).

unicode61 classifies codepoints as token vs separator characters using
Unicode 6.1 category tables (L* and N* are token chars) and case-folds
token characters, stripping diacritics per the ``remove_diacritics``
level (0 = case-fold only, 1 = default strip, 2 = additionally fold the
multi-diacritic precomposed codepoints level 1 leaves alone — SQLite
fts5_unicode2.c). Rather than re-deriving those tables from a Unicode
6.1 data file (Python's unicodedata is a NEWER Unicode version —
categories moved), this tool asks the actual engine: for every
codepoint it tokenizes ``"a<cp>a"`` under all three levels and records

  - separator  → tokens ['a', 'a']
  - token char → one token 'a' + fold(cp) + 'a' (fold may be '' for a
    combining mark that remove_diacritics deletes)

and emits the result as compact tables: ALNUM_RANGES (the class is
IDENTICAL across levels — asserted), FOLD (level 1, the default),
FOLD0 (level 0: case folds only), and FOLD2_DIFF (the level-2 entries
that differ from level 1). Deterministic given the SQLite build; run
``python tools/gen_unicode61.py`` to regenerate.
"""

from __future__ import annotations

import sqlite3
import sys

OUT = "sparkgrep/functions/_unicode61.py"


def probe_all(limit: int = 0x110000):
    db = sqlite3.connect(":memory:")
    curs = {}
    for rd in (0, 1, 2):
        db.execute(
            f"CREATE VIRTUAL TABLE t{rd} USING "
            f"fts5(c, tokenize='unicode61 remove_diacritics {rd}')"
        )
        db.execute(f"CREATE VIRTUAL TABLE v{rd} USING fts5vocab(t{rd}, 'instance')")
        curs[rd] = db.cursor()

    ranges: dict[int, list[tuple[int, int]]] = {0: [], 1: [], 2: []}
    fold: dict[int, dict[int, str]] = {0: {}, 1: {}, 2: {}}
    run_start: dict[int, int | None] = {0: None, 1: None, 2: None}
    # token chars that cannot START a token (SQLite's fixed isdiacritic
    # set: combining marks inside the default class are skipped at token
    # start but kept mid-token — visible under remove_diacritics 0,
    # where '<mark>a' tokenizes to 'a' but 'b<mark>a' keeps the mark).
    # Probed with the rd0 table so no fold ambiguity (no rd0 fold is '')
    nonstarters: list[int] = []

    for cp in range(limit):
        for rd in (0, 1, 2):
            cur = curs[rd]
            if 0xD800 <= cp <= 0xDFFF:  # surrogates: not encodable
                tokenish = False
            else:
                ch = chr(cp)
                cur.execute(f"DELETE FROM t{rd}")
                try:
                    cur.execute(f"INSERT INTO t{rd} VALUES (?)", (f"a{ch}a",))
                except (sqlite3.OperationalError, UnicodeEncodeError):
                    tokenish = False
                else:
                    toks = [
                        r[0] for r in cur.execute(f"SELECT term FROM v{rd}")
                    ]
                    if (
                        len(toks) == 1
                        and toks[0].startswith("a")
                        and toks[0].endswith("a")
                    ):
                        tokenish = True
                        folded = toks[0][1:-1]
                        # store the complete non-identity fold map, so the
                        # tokenizer is a single str.translate with no
                        # .lower() (Python's str.lower is a DIFFERENT case
                        # mapping for some cps, and context-sensitive for
                        # final sigma)
                        if folded != ch:
                            fold[rd][cp] = folded
                        if rd == 0:
                            cur.execute("DELETE FROM t0")
                            cur.execute(
                                "INSERT INTO t0 VALUES (?)", (f"{ch}a",)
                            )
                            lead = [
                                r[0]
                                for r in cur.execute("SELECT term FROM v0")
                            ]
                            if lead == ["a"]:
                                nonstarters.append(cp)
                    else:
                        tokenish = False
            if tokenish and run_start[rd] is None:
                run_start[rd] = cp
            elif not tokenish and run_start[rd] is not None:
                ranges[rd].append((run_start[rd], cp - 1))
                run_start[rd] = None
    for rd in (0, 1, 2):
        if run_start[rd] is not None:
            ranges[rd].append((run_start[rd], limit - 1))
    return ranges, fold, nonstarters


def main() -> None:
    sys.stderr.write(
        "probing SQLite unicode61 (rd 0/1/2) over all Unicode planes...\n"
    )
    ranges, fold, nonstarters = probe_all()
    # the token-character CLASS is level-independent: remove_diacritics
    # only changes the fold, never the split
    assert ranges[0] == ranges[1] == ranges[2], "class differs across rd levels"
    rngs = ranges[1]
    f1 = fold[1]
    f0 = fold[0]
    # level 2 emitted as a diff against level 1 (small: the
    # multi-diacritic precomposed codepoints level 1 leaves alone)
    f2_diff = {
        cp: fold[2].get(cp, chr(cp))
        for cp in set(f1) | set(fold[2])
        if fold[2].get(cp, chr(cp)) != f1.get(cp, chr(cp))
    }
    n_alnum = sum(b - a + 1 for a, b in rngs)
    with open(OUT, "w") as f:
        f.write(
            '"""GENERATED by tools/gen_unicode61.py — SQLite unicode61\n'
            "token-character ranges and remove_diacritics fold maps\n"
            "(levels 0/1/2), probed from the installed SQLite (the\n"
            "reference's engine).\n"
            f"{len(rngs)} ranges covering {n_alnum} token codepoints; "
            f"folds: rd1 {len(f1)}, rd0 {len(f0)}, rd2 diff {len(f2_diff)}."
            '"""\n\n'
        )
        f.write("ALNUM_RANGES = (\n")
        for a, b in rngs:
            f.write(f"    ({a}, {b}),\n")
        f.write(")\n\n")
        f.write("# cp -> folded text wherever folding is not the identity\n")
        f.write("# (remove_diacritics=1, the default)\n")
        f.write("FOLD = {\n")
        for cp in sorted(f1):
            f.write(f"    {cp}: {f1[cp]!r},\n")
        f.write("}\n\n")
        f.write("# remove_diacritics=0: case folds only, diacritics kept\n")
        f.write("FOLD0 = {\n")
        for cp in sorted(f0):
            f.write(f"    {cp}: {f0[cp]!r},\n")
        f.write("}\n\n")
        f.write(
            "# remove_diacritics=2 entries that DIFFER from level 1\n"
            "# (value chr(cp) means: identity at level 2)\n"
        )
        f.write("FOLD2_DIFF = {\n")
        for cp in sorted(f2_diff):
            f.write(f"    {cp}: {f2_diff[cp]!r},\n")
        f.write("}\n\n")
        ns_ranges: list[tuple[int, int]] = []
        for cp in nonstarters:
            if ns_ranges and ns_ranges[-1][1] == cp - 1:
                ns_ranges[-1] = (ns_ranges[-1][0], cp)
            else:
                ns_ranges.append((cp, cp))
        f.write(
            "# token chars that cannot START a token (SQLite's fixed\n"
            "# isdiacritic set: skipped at token start, kept mid-token;\n"
            "# immune to tokenchars/separators overrides — probed)\n"
        )
        f.write("NONSTARTER_RANGES = (\n")
        for a, b in ns_ranges:
            f.write(f"    ({a}, {b}),\n")
        f.write(")\n")
    sys.stderr.write(
        f"wrote {OUT}: {len(rngs)} ranges, {n_alnum} token cps, folds "
        f"rd1={len(f1)} rd0={len(f0)} rd2diff={len(f2_diff)}\n"
    )


if __name__ == "__main__":
    main()
