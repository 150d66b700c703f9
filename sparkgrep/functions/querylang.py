"""Query language: implicit AND, explicit AND/OR, quoted phrases.

Reference behavior being reproduced (FTS5 MATCH syntax as exercised by
the reference's own tests, ``test_message_manager.py:417-435``):

- ``foo bar``          — implicit AND of two terms
- ``foo AND bar``      — explicit AND (same as implicit)
- ``foo OR bar``       — either term
- ``"foo bar"``        — quoted phrase: adjacent tokens in order
- combinations: ``"big data" OR spark`` etc.

Grammar here (deliberately the same flat shape FTS5 gives these tests —
no parentheses): a query is a disjunction of conjunctions; each conjunct
item ("unit") is a term or a phrase.

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
    """One scoring atom: a single term, or an ordered phrase of terms."""

    terms: tuple[str, ...]  # analyzer-tokenized, order preserved

    @property
    def is_phrase(self) -> bool:
        return len(self.terms) > 1

    @property
    def uid(self) -> str:
        # deterministic sort key shared with the SQL oracle
        return ("p:" if self.is_phrase else "t:") + " ".join(self.terms)


@dataclass(frozen=True)
class ParsedQuery:
    """Disjunction (OR) of conjunctions (AND) of units."""

    disjuncts: tuple[tuple[Unit, ...], ...]

    def units(self) -> list[Unit]:
        """All distinct units, ordered by uid (deterministic fold order)."""
        seen: dict[str, Unit] = {}
        for conj in self.disjuncts:
            for u in conj:
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
    disjuncts; ``AND`` is a no-op separator (implicit AND); everything
    else is a term unit. Phrases that tokenize to one term degrade to
    term units; empty phrases/terms vanish. An all-empty query yields
    zero disjuncts (callers treat it as no-match or raise in strict
    mode, matching FTS5's error on an empty MATCH).
    """
    # pull out quoted phrases, leaving placeholders to preserve position
    phrases: list[str] = []

    def _stash(m: re.Match) -> str:
        phrases.append(m.group(1))
        return f" \x00{len(phrases) - 1}\x00 "

    rest = _PHRASE_RE.sub(_stash, text or "")

    disjuncts: list[tuple[Unit, ...]] = []
    conj: list[Unit] = []
    for raw in rest.split():
        if raw == "OR":
            if conj:
                disjuncts.append(tuple(conj))
                conj = []
            continue
        if raw == "AND":
            continue
        m = re.fullmatch("\x00(\\d+)\x00", raw)
        if m:
            terms = tuple(tokenize_py(phrases[int(m.group(1))], analyzer))
            if terms:
                conj.append(Unit(terms))
            continue
        for t in tokenize_py(raw, analyzer):
            conj.append(Unit((t,)))
    if conj:
        disjuncts.append(tuple(conj))
    return ParsedQuery(tuple(disjuncts))
