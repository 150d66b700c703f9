"""Query language: implicit AND, explicit AND/OR, quoted phrases.

Reference behavior being reproduced (FTS5 MATCH syntax as exercised by
the reference's own tests, ``test_message_manager.py:417-435``):

- ``foo bar``          — implicit AND of two terms
- ``foo AND bar``      — explicit AND (same as implicit)
- ``foo OR bar``       — either term
- ``foo NOT bar``      — docs matching foo but not bar (FTS5 binary NOT,
                         highest precedence: applies to the NEXT unit)
- ``foo*``             — prefix match: one scoring atom covering every
                         index term starting with the stem
- ``"foo bar"``        — quoted phrase: adjacent tokens in order
- combinations: ``"big data" OR spark``, ``spark NOT "big data"`` etc.

Grammar here (deliberately the same flat shape FTS5 gives these tests —
no parentheses): a query is a disjunction of conjunctions; each
conjunct carries include units (terms/phrases that must all be present)
and exclude units (introduced by NOT; none may be present). FTS5 gives
NOT the highest precedence, so ``a NOT b c`` ≡ (a NOT b) AND c — which
is exactly the flat include/exclude reading. A conjunct with only
excludes (``NOT a`` — an FTS5 syntax error) matches nothing here.

Scoring model (FTS5's): every unit is a scoring atom with its own
within-doc frequency (tf = occurrences of the term / of the whole
phrase) and document frequency (docs containing the unit). A matched
doc's score is the sum of BM25 contributions of the query's units
present in it. AND requires all units of some conjunct; OR unions
conjunct match-sets.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from sparkgrep.functions.tokenizer import tokenize_py

_PHRASE_RE = re.compile(r'"([^"]*)"')


@dataclass(frozen=True)
class Unit:
    """One scoring atom: a single term, an ordered phrase of terms, or a
    term PREFIX (``tok*``). A prefix unit scores like FTS5's: one atom
    whose per-doc tf is the SUM of tfs of every index term starting with
    the (analyzer-processed) stem, and whose df is the count of docs
    containing at least one such term — pinned against SQLite FTS5 in
    tests/test_fts5_parity.py."""

    terms: tuple[str, ...]  # analyzer-tokenized, order preserved
    prefix: bool = False    # prefix units are always single-stem

    @property
    def is_phrase(self) -> bool:
        return len(self.terms) > 1

    @property
    def uid(self) -> str:
        # deterministic sort key shared with the SQL oracle
        if self.prefix:
            return "x:" + self.terms[0]
        return ("p:" if self.is_phrase else "t:") + " ".join(self.terms)


@dataclass(frozen=True)
class Conjunct:
    """One AND group: every include unit present, no exclude unit
    present (excludes come from FTS5's binary NOT)."""

    includes: tuple[Unit, ...]
    excludes: tuple[Unit, ...] = ()


@dataclass(frozen=True)
class ParsedQuery:
    """Disjunction (OR) of conjunctions (AND/NOT) of units."""

    disjuncts: tuple[Conjunct, ...]

    def units(self) -> list[Unit]:
        """All distinct units (includes AND excludes — exclusion needs
        the unit's match set too), ordered by uid (deterministic fold
        order)."""
        seen: dict[str, Unit] = {}
        for conj in self.disjuncts:
            for u in conj.includes + conj.excludes:
                seen.setdefault(u.uid, u)
        return [seen[k] for k in sorted(seen)]

    def all_terms(self) -> list[str]:
        return sorted({t for u in self.units() for t in u.terms})

    def has_phrase(self) -> bool:
        return any(u.is_phrase for u in self.units())


def parse_query(text: str, analyzer: str = "simple") -> ParsedQuery:
    """Parse a query string into OR-of-AND units.

    Quoted segments become phrase units (tokenized with the index
    analyzer, order preserved). Outside quotes, the token ``OR`` splits
    disjuncts; ``AND`` is a no-op separator (implicit AND); ``NOT``
    excludes the NEXT unit (FTS5 binary NOT at highest precedence);
    everything else is a term unit. Phrases that tokenize to one term
    degrade to term units; empty phrases/terms vanish (a NOT whose unit
    vanishes excludes nothing). An all-empty query yields zero disjuncts
    (callers treat it as no-match or raise in strict mode, matching
    FTS5's error on an empty MATCH).
    """
    # pull out quoted phrases, leaving placeholders to preserve position
    phrases: list[str] = []

    def _stash(m: re.Match) -> str:
        phrases.append(m.group(1))
        return f" \x00{len(phrases) - 1}\x00 "

    rest = _PHRASE_RE.sub(_stash, text or "")

    disjuncts: list[Conjunct] = []
    inc: list[Unit] = []
    exc: list[Unit] = []
    neg_next = False

    def _flush() -> None:
        nonlocal inc, exc
        if inc or exc:
            disjuncts.append(Conjunct(tuple(inc), tuple(exc)))
            inc, exc = [], []

    def _add(units: list[Unit]) -> None:
        nonlocal neg_next
        # NOT binds every unit the next raw token yields (a raw word can
        # tokenize to several terms under the code analyzer — all are
        # part of the negated operand, as FTS5 phrases them)
        (exc if neg_next else inc).extend(units)
        neg_next = False

    for raw in rest.split():
        if raw == "OR":
            _flush()
            neg_next = False
            continue
        if raw == "AND":
            continue
        if raw == "NOT":
            neg_next = True
            continue
        m = re.fullmatch("\x00(\\d+)\x00", raw)
        if m:
            terms = tuple(tokenize_py(phrases[int(m.group(1))], analyzer))
            if terms:
                _add([Unit(terms)])
            continue
        if raw.endswith("*"):
            # FTS5 prefix token: the stem goes THROUGH the tokenizer
            # (stemming included — verified against SQLite), then
            # prefix-matches stored terms. A '*' inside quotes is
            # stripped by the tokenizer (literal — also FTS5's
            # behavior). Multi-token stems (code analyzer splitting)
            # keep all but the last token as plain terms.
            toks = tokenize_py(raw.rstrip("*"), analyzer)
            if toks:
                _add(
                    [Unit((t,)) for t in toks[:-1]]
                    + [Unit((toks[-1],), prefix=True)]
                )
            continue
        _add([Unit((t,)) for t in tokenize_py(raw, analyzer)])
    _flush()
    return ParsedQuery(tuple(disjuncts))
