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
- ``^foo`` / ``^"a b"``— initial-token anchor: matches only instances
                         starting at token position 0 (tf ∈ {0,1})
- ``NEAR(a "b c", 5)`` — proximity: all members within ≤N intervening
                         token positions (default 10); members score as
                         CONSTRAINED atoms (only instances participating
                         in a valid selection count toward tf)
- ``a NOT (b c)``      — exact group exclusion: subtracts the operand's
                         full match set (docs matching b AND c)
- combinations: ``"big data" OR spark``, ``spark NOT "big data"`` etc.

Duplicated atoms (``alpha alpha``, ``alpha OR alpha``, repeated
phrases/NEAR groups) score each textual occurrence separately — FTS5's
behavior, probed and pinned — via lexer-assigned occurrence numbering
(Unit.occ / NearGroup.occ): the first occurrence keeps its plain uid,
later ones become distinct atoms with identical postings, and DNF
distribution shares one occurrence across disjuncts (counted once via
gating). Every construct is pinned ≤1e-9 against real SQLite in
tests/test_fts5_parity.py.

Grammar here (deliberately the same flat shape FTS5 gives these tests —
no parentheses): a query is a disjunction of conjunctions; each
conjunct carries include units (terms/phrases that must all be present)
and exclude units (introduced by NOT; none may be present). FTS5 gives
NOT the highest precedence, so ``a NOT b c`` ≡ (a NOT b) AND c — which
is exactly the flat include/exclude reading. A conjunct with only
excludes (``NOT a`` — an FTS5 syntax error) matches nothing here.

Scoring model (FTS5's, pinned against SQLite): every unit is a scoring
atom with its own within-doc frequency (tf = occurrences of the term /
of the whole phrase; constrained for NEAR members and anchored units)
and document frequency (docs containing the unit). A matched doc's
score is the sum of BM25 contributions of the atoms GATED per disjunct:
an atom contributes only when some disjunct scoring it (containing it
as an include, or via its NEAR group) matches the doc — a present unit
whose own subexpression fails adds nothing. AND requires all units of
some conjunct; OR unions conjunct match-sets.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, replace

from sparkgrep.functions.tokenizer import tokenize_py

# optional '^' captured so the anchor stays attached to the phrase
# placeholder through lexing (FTS5 '^"a b"')
_PHRASE_RE = re.compile(r'(\^?)"([^"]*)"\s*(\*?)')


@dataclass(frozen=True)
class Unit:
    """One scoring atom: a single term, an ordered phrase of terms, or a
    term PREFIX (``tok*``). A prefix unit scores like FTS5's: one atom
    whose per-doc tf is the SUM of tfs of every index term starting with
    the (analyzer-processed) stem, and whose df is the count of docs
    containing at least one such term — pinned against SQLite FTS5 in
    tests/test_fts5_parity.py.

    ``anchored`` is FTS5's ``^`` initial-token anchor: the unit matches
    only instances starting at token position 0. Pinned against SQLite:
    an anchored unit is its own atom whose tf counts ONLY the anchored
    instances (a single term/phrase can start a doc at most once, so
    tf ∈ {0, 1}) and whose df is the count of docs with an anchored
    instance — a doc with the term at positions 0 and 5 scores exactly
    like one with it at position 0 only."""

    terms: tuple[str, ...]  # analyzer-tokenized, order preserved
    # tail star ('tok*' / '"a b"*'): the LAST slot is a prefix stem
    prefix: bool = False
    anchored: bool = False  # FTS5 '^': instances at token position 0 only
    # INTERNAL prefix slots (FTS5 'a* + b', probed): indices of non-tail
    # slots whose term is a prefix stem — slot i matches any stored term
    # starting with terms[i]. Always sorted, never includes the last
    # slot (a trailing star stays in ``prefix`` so every star-free and
    # tail-star query keeps its exact prior representation and uid).
    stars: tuple[int, ...] = ()
    # column filter (FTS5 ``col:``/``{c1 c2}:``/``-col:``): sorted field
    # indices the unit is restricted to, or None = every indexed field.
    # On a multi-field index the colset restricts MATCHING, tf counting
    # AND df (all pinned against SQLite — probes in
    # tests/test_multicol_parity.py); single-field indexes never set it.
    # An empty tuple (an impossible nested intersection like
    # ``c0:(c1:x)``) matches nothing, also FTS5's behavior.
    cols: tuple[int, ...] | None = None
    # FTS5 scores each textual OCCURRENCE of a phrase as its own atom
    # (``alpha alpha`` and ``alpha OR alpha`` both score 2× alpha —
    # probed): the lexer numbers repeat occurrences of the same atom,
    # so the first occurrence keeps the plain uid (every query without
    # duplicates is bitwise-unchanged) and later ones become distinct
    # atoms with identical postings. DNF distribution copies the SAME
    # occurrence into several disjuncts (shared identity — counted
    # once via gating), while textual repeats stay distinct.
    occ: int = 0

    @property
    def is_phrase(self) -> bool:
        return len(self.terms) > 1

    @property
    def uid(self) -> str:
        # deterministic sort key shared with the SQL oracle ('c' < 'p' <
        # 't' < 'x' in ASCII and in DuckDB's binary collation, so the
        # uid-ordered fold agrees on both sides); '~' (0x7E) keeps
        # occurrence suffixes deterministic on both sides too
        # internal star slots marked with a trailing '*' on the term —
        # analyzers strip '*', so the mark can never collide with a
        # stored term; units without internal stars render byte-for-byte
        # as before
        toks = " ".join(
            t + ("*" if i in self.stars else "")
            for i, t in enumerate(self.terms)
        )
        if self.anchored:
            base = "x:" if self.prefix else ("p:" if self.is_phrase else ":")
            out = "c" + base + toks
        elif self.prefix:
            # tail star is conveyed by the 'x:' head (unchanged for
            # every pre-existing prefix unit); internal marks compose:
            # 'a* + b*' → "x:a* b" vs 'a* + b' → "p:a* b" — distinct
            out = "x:" + toks
        else:
            out = ("p:" if self.is_phrase else "t:") + toks
        if self.cols is not None:
            # 'f' (0x66) sorts before 'c'/'p'/'t'/'x' uid heads — only
            # determinism matters, and both engines sort the same bytes
            out = "f" + ",".join(map(str, self.cols)) + "|" + out
        return out + (f"~{self.occ}" if self.occ else "")


def star_slots(u: Unit) -> tuple[int, ...]:
    """ALL starred slot indices of a unit — the internal ``stars`` plus
    the tail when ``prefix`` — sorted ascending; empty for star-free
    units. Slot i of a starred index matches any stored term starting
    with ``terms[i]`` (one token per instance, so instance starts stay a
    set and tf = |starts| exactly as for plain phrases)."""
    s = set(u.stars)
    if u.prefix:
        s.add(len(u.terms) - 1)
    return tuple(sorted(s))


def plain_terms(u: Unit) -> list[str]:
    """Terms of the NON-starred slots (exact-match tokens)."""
    s = set(star_slots(u))
    return [t for i, t in enumerate(u.terms) if i not in s]


def stem_terms(u: Unit) -> list[str]:
    """Stems of the starred slots, in slot order (may repeat)."""
    return [u.terms[i] for i in star_slots(u)]


@dataclass(frozen=True)
class NearGroup:
    """FTS5 ``NEAR(p1 p2 ... pk, N)``: a PROXIMITY PREDICATE over k
    units (terms, phrases, or prefixes). A doc satisfies the group iff
    some selection of one instance per unit has
    ``max(start) - min(end) - 1 <= n`` (i.e. at most n token positions
    between the earliest-ending and latest-starting instance — pinned
    against SQLite FTS5). Scoring is untouched: the member units score
    as ordinary atoms with their full tfs (also FTS5's behavior)."""

    phrases: tuple[Unit, ...]
    n: int = 10  # FTS5 default
    # textual occurrence index among identical NEAR groups (FTS5 scores
    # each occurrence's members separately — same rule as Unit.occ)
    occ: int = 0
    # column filter (``c0:NEAR(...)``): the whole group — selections AND
    # member tf/df — is restricted to these fields; the members' own
    # ``cols`` are set to the same colset by the colspec application so
    # their standalone df relations are colset-restricted too (pinned:
    # a NEAR member's df is its full presence WITHIN the colset).
    cols: tuple[int, ...] | None = None


def near_supported(starts: list, lens: list[int], n: int) -> list[int] | None:
    """Per-member SUPPORTED-instance counts for a NEAR group, or None if
    the group is unsatisfied. An instance is supported iff it belongs to
    at least one selection (one instance per member) whose span satisfies
    ``max(start) - min(end) - 1 <= n``. Pinned against SQLite FTS5
    (randomized 300-case probe): a NEAR member scores as a BM25 atom
    whose per-doc tf counts ONLY its supported instances (df stays the
    member's full corpus presence) — e.g. in ``NEAR(a x, 1)`` over
    ``a . x x``, the second x cannot pair with a, so x's tf is 1.

    Polynomial test (no selection enumeration): instance (s, e) of
    member m is supported iff some window floor E — always the end of
    some instance — has E <= e, s <= n+1+E, and every other member j
    has an instance with end >= E and start <= n+1+E. Sufficiency: the
    chosen instances' actual span is within [E, n+1+E]; necessity: take
    E = the valid selection's min end."""
    k = len(starts)
    if any(len(s) == 0 for s in starts):
        return None
    ends_all = sorted({
        int(s) + lens[m] - 1 for m in range(k) for s in starts[m]
    })
    out = []
    for m in range(k):
        cnt = 0
        for s in starts[m]:
            e = int(s) + lens[m] - 1
            ok = False
            for E in ends_all:
                if E > e:
                    break
                if int(s) > n + 1 + E:
                    continue
                if all(
                    any(
                        int(sj) + lens[j] - 1 >= E and int(sj) <= n + 1 + E
                        for sj in starts[j]
                    )
                    for j in range(k)
                    if j != m
                ):
                    ok = True
                    break
            if ok:
                cnt += 1
        if cnt == 0:
            return None  # no supported instance for a member ⇒ no valid selection
        out.append(cnt)
    return out


def near_ok(starts: list, lens: list[int], n: int) -> bool:
    """FTS5's NEAR test (the fts5ExprNearIsMatch sliding algorithm):
    repeatedly measure the current selection's span and advance the
    phrase with the smallest END — complete, because any selection
    keeping that instance spans at least as wide."""
    k = len(starts)
    idx = [0] * k
    sizes = [len(s) for s in starts]
    if any(sz == 0 for sz in sizes):
        return False
    while True:
        ends = [starts[i][idx[i]] + lens[i] - 1 for i in range(k)]
        mx = max(starts[i][idx[i]] for i in range(k))
        j = min(range(k), key=lambda i: ends[i])
        if mx - ends[j] - 1 <= n:
            return True
        idx[j] += 1
        if idx[j] >= sizes[j]:
            return False


@dataclass(frozen=True)
class Conjunct:
    """One AND group: every include unit present, no exclude unit
    present (excludes come from FTS5's binary NOT), every NEAR group
    satisfied, and no exclude EXPRESSION matched.

    ``excludes`` carries unit-like NOT operands (a single term / phrase /
    prefix, or an OR of such — excluding each member is exact there).
    ``exclude_exprs`` carries every other NOT operand as a sub-expression
    in DNF (a tuple of Conjuncts, possibly nested): a doc is excluded iff
    it MATCHES the sub-expression — FTS5's exact semantics for
    ``a NOT (b c)`` (excludes docs matching b AND c) and
    ``a NOT NEAR(b c, n)`` (excludes docs satisfying the proximity
    group), pinned against SQLite in tests/test_fts5_parity.py."""

    includes: tuple[Unit, ...]
    excludes: tuple[Unit, ...] = ()
    nears: tuple[NearGroup, ...] = ()
    exclude_exprs: tuple[tuple["Conjunct", ...], ...] = ()


def _collect_units(conjs, seen: dict) -> None:
    for conj in conjs:
        for u in conj.includes + conj.excludes:
            seen.setdefault(u.uid, u)
        for grp in conj.nears:
            for u in grp.phrases:  # member presence feeds the atom's df
                seen.setdefault(u.uid, u)
        for e in conj.exclude_exprs:
            _collect_units(e, seen)


def _collect_nears(conjs, out: list) -> None:
    for conj in conjs:
        for grp in conj.nears:
            if grp not in out:
                out.append(grp)
        for e in conj.exclude_exprs:
            _collect_nears(e, out)


@dataclass(frozen=True)
class ParsedQuery:
    """Disjunction (OR) of conjunctions (AND/NOT) of units."""

    disjuncts: tuple[Conjunct, ...]

    def units(self) -> list[Unit]:
        """All distinct units (includes AND excludes, recursing into
        exclude expressions — exclusion needs the unit's match set too;
        NEAR members are includes), ordered by uid (deterministic fold
        order)."""
        seen: dict[str, Unit] = {}
        _collect_units(self.disjuncts, seen)
        return [seen[k] for k in sorted(seen)]

    def near_groups(self) -> list[NearGroup]:
        """All distinct NEAR groups, including those inside exclude
        expressions, in deterministic first-seen order."""
        out: list[NearGroup] = []
        _collect_nears(self.disjuncts, out)
        return out

    def all_terms(self) -> list[str]:
        return sorted({t for u in self.units() for t in u.terms})

    def has_phrase(self) -> bool:
        return any(u.is_phrase for u in self.units())


def uses_colsets(pq: ParsedQuery) -> bool:
    """Whether any atom (including NOT operands and NEAR groups —
    units()/near_groups() recurse) carries an FTS5 column filter. The
    detail=none query gate: such queries raise FTS5's "column queries
    are not supported (detail=none)" on an index without per-field tf
    streams."""
    return any(u.cols is not None for u in pq.units()) or any(
        g.cols is not None for g in pq.near_groups()
    )


# complexity ceiling for DNF expansion of parenthesized queries — real
# queries are tiny; this guards against adversarial OR-nesting blowup
_MAX_DISJUNCTS = 64


def _cols_inter(a: tuple | None, b: tuple[int, ...]) -> tuple[int, ...]:
    """Nested colspecs INTERSECT (pinned: ``c0:(c1:x)`` matches nothing,
    ``c0:(c0:x)`` ≡ ``c0:x``)."""
    return b if a is None else tuple(sorted(set(a) & set(b)))


def _unit_with_cols(u: Unit, cols: tuple[int, ...]) -> Unit:
    return replace(u, cols=_cols_inter(u.cols, cols))


def _group_with_cols(g: NearGroup, cols: tuple[int, ...]) -> NearGroup:
    c = _cols_inter(g.cols, cols)
    # members carry the group colset too: their standalone relations
    # (which feed member-atom dfs) must be colset-restricted
    return replace(g, cols=c, phrases=tuple(replace(u, cols=c) for u in g.phrases))


def _apply_cols(conjs: list[Conjunct], cols: tuple[int, ...]) -> list[Conjunct]:
    """Distribute a column filter over a parsed subexpression — FTS5's
    ``c0:(a OR b NOT d)`` restricts every atom inside, including NOT
    operands (pinned: ``c0:(alpha NOT beta)`` matches a doc with beta
    only outside c0)."""
    return [
        Conjunct(
            tuple(_unit_with_cols(u, cols) for u in c.includes),
            tuple(_unit_with_cols(u, cols) for u in c.excludes),
            tuple(_group_with_cols(g, cols) for g in c.nears),
            tuple(tuple(_apply_cols(list(e), cols)) for e in c.exclude_exprs),
        )
        for c in conjs
    ]


_NEAR_RE = re.compile(r"\bNEAR\(([^()]*?)(?:\s*,\s*(\d+))?\)")

# FTS5 column-filter prefix: ``col:`` / ``{c1 c2}:`` / ``-col:`` /
# ``-{c1 c2}:`` (optional spaces around ':'). Only applied when the
# caller declares index fields — single-field indexes never see it, so
# their query surface (including literal colons in raw text) is
# byte-for-byte unchanged.
_COLSPEC_RE = re.compile(r"(-?)(\{[^{}]*\}|[A-Za-z_]\w*)\s*:")


def _sub_colspecs(text: str, fields: tuple[str, ...]) -> str:
    """Rewrite column filters into ``\\x04<indices>\\x04`` marker tokens.
    Unknown column names raise ValueError — FTS5 parity ("no such
    column"); colons inside quoted phrases are already stashed away."""

    def _stash(m: re.Match) -> str:
        neg, body = m.group(1), m.group(2)
        names = body[1:-1].split() if body.startswith("{") else [body]
        idxs: set[int] = set()
        for nm in names:
            if nm not in fields:
                raise ValueError(f"no such column: {nm}")
            idxs.add(fields.index(nm))
        if neg:  # '-col:' = every OTHER indexed column (pinned)
            idxs = set(range(len(fields))) - idxs
        return " \x04" + ",".join(map(str, sorted(idxs))) + "\x04 "

    return _COLSPEC_RE.sub(_stash, text)


class _OccCounter:
    """Numbers repeat textual occurrences of the same atom: the first
    keeps occ=0 (plain uid — nothing changes for duplicate-free
    queries), later ones become distinct atoms (FTS5 scores each
    occurrence separately, probed: ``alpha alpha`` = ``alpha OR alpha``
    = 2× alpha)."""

    def __init__(self):
        self.seen: dict[str, int] = {}

    def unit(self, u: Unit) -> Unit:
        n = self.seen.get(u.uid, 0)
        self.seen[u.uid] = n + 1
        return u if n == 0 else replace(u, occ=n)

    def group(self, g: "NearGroup") -> "NearGroup":
        key = "N(" + ",".join(u.uid for u in g.phrases) + f"){g.n}"
        n = self.seen.get(key, 0)
        self.seen[key] = n + 1
        return g if n == 0 else replace(g, occ=n)


# Analyzers under which a bareword that tokenizes to SEVERAL tokens is
# ONE ordered phrase — FTS5's reading (probed: `foo_bar` under porter
# unicode61 matches only adjacent "foo bar"; under trigram EVERY word
# >= 4 codepoints is a multi-trigram phrase). The engine-defined
# analyzers (`simple`, `code`) keep the historical AND reading: for code
# search, `buildSide` should match build/side anywhere in the doc, and
# every DuckDB contract oracle encodes that semantics.
PHRASE_BAREWORD_ANALYZERS = frozenset({"fts5", "trigram", "unicode61"})


def _is_trigram(analyzer: str) -> bool:
    from sparkgrep.functions.tokenizer import base_analyzer

    return base_analyzer(analyzer) == "trigram"


def _phrase_barewords(analyzer: str) -> bool:
    """True when the analyzer reads multi-token barewords as phrases —
    the whole unicode61 family (any option spec) plus trigram."""
    from sparkgrep.functions.tokenizer import base_analyzer

    return base_analyzer(analyzer) in PHRASE_BAREWORD_ANALYZERS


def _parse_near(body: str, n: str | None, analyzer: str, phrases: list[str]):
    """NEAR(member member ..., N) → NearGroup (or a plain unit list when
    fewer than 2 members survive tokenization — no predicate needed).
    Duplicate members WITHIN the group get occurrence suffixes (their
    constrained atoms must stay distinct); the group itself is
    occurrence-numbered by the caller."""
    units: list[Unit] = []
    seq: list = []  # units and '+' markers, merged below (FTS5 concat)
    for raw in body.replace("+", " + ").split():
        if raw == "+":
            seq.append("+")
            continue
        if re.fullmatch("\x04[0-9,]*\x04", raw):
            # colspec inside NEAR: FTS5 rejects ("syntax error"); ignored
            # here (documented superset) — filter the whole group instead
            continue
        if raw.startswith("^"):
            # FTS5 rejects '^' inside NEAR ("syntax error near ^");
            # accepted here as a plain member (documented superset)
            raw = raw.lstrip("^")
            if not raw:
                continue
        m = re.fullmatch("\x00(\\d+)\x00(\\*?)", raw)
        if m:
            terms = tuple(tokenize_py(phrases[int(m.group(1))], analyzer))
            if terms:
                star = bool(m.group(2)) and not _is_trigram(analyzer)
                seq.append(Unit(terms, prefix=star))
            continue
        if raw.endswith("*"):
            toks = tokenize_py(raw.rstrip("*"), analyzer)
            if toks:
                if _is_trigram(analyzer):
                    # 3-cp prefix over 3-cp terms = exact phrase (see _lex)
                    seq.append(Unit(tuple(toks)))
                    continue
                # inside NEAR a multi-token stem is ONE phrase-prefix
                # member (FTS5: the phrase "a + b*")
                seq.append(Unit(tuple(toks), prefix=True))
            continue
        toks = tokenize_py(raw, analyzer)
        if toks:
            # a multi-token raw word inside NEAR is ONE phrase (FTS5)
            seq.append(Unit(tuple(toks)))
    merged = _plus_merge([[u] if isinstance(u, Unit) else u for u in seq])
    units = [u for lst in merged for u in (lst if isinstance(lst, list) else [lst])]
    if len(units) < 2:
        return units  # degenerate: no proximity constraint
    local = _OccCounter()
    return NearGroup(
        tuple(local.unit(u) for u in units), int(n) if n is not None else 10
    )


def _plus_merge(seq: list) -> list:
    """FTS5 ``+`` phrase concatenation (probed: binds tightest — above
    NOT/AND/OR — composes with quoted phrases, a trailing prefix star,
    and ``^`` on the LEFT end; any spacing): merge the unit left of each
    ``+`` with the unit right of it into ONE phrase atom. Elements of
    ``seq`` are unit lists, NearGroups, operator strings, or ``"+"``
    markers. A ``+`` whose neighbours are not units (FTS5: syntax error)
    is dropped — documented superset. A LEFT operand carrying a prefix
    star (``a* + b`` / ``"a b"* + c`` — FTS5's phrase-INTERNAL prefix,
    probed valid: 'foo* + bar' matches "football bar") keeps the star on
    its slot, which becomes internal in the merged phrase
    (``Unit.stars``); the merged atom's tail star is the RIGHT operand's
    (pinned: '"foo bar"* + one' matches "foo barrel one")."""
    res: list = []
    pending = False
    for el in seq:
        if el == "+":
            pending = bool(res) and isinstance(res[-1], list) and bool(res[-1])
            continue
        if pending and isinstance(el, list) and el:
            left = res[-1]
            lu, ru = left[-1], el[0]
            lt = len(lu.terms)
            merged = Unit(
                lu.terms + ru.terms,
                prefix=ru.prefix,
                anchored=lu.anchored,
                cols=lu.cols,
                stars=lu.stars
                + ((lt - 1,) if lu.prefix else ())
                + tuple(i + lt for i in ru.stars),
            )
            res[-1] = left[:-1] + [merged] + el[1:]
            pending = False
            continue
        pending = False
        res.append(el)
    return res


def _lex(text: str, analyzer: str, phrases: list[str]) -> list:
    """Token stream: '(' / ')' / 'OR' / 'AND' / 'NOT' markers, NearGroup
    predicates, or lists of Units (what one raw word/phrase
    contributes). ``+`` concatenates adjacent phrase atoms (FTS5),
    merged BEFORE occurrence numbering. Repeat occurrences of the same
    atom are numbered (Unit.occ) so each textual occurrence scores
    separately, matching FTS5."""
    nears: list = []
    occ = _OccCounter()

    def _stash_near(m: re.Match) -> str:
        nears.append(_parse_near(m.group(1), m.group(2), analyzer, phrases))
        return f" \x02{len(nears) - 1}\x02 "

    text = _NEAR_RE.sub(_stash_near, text or "")

    raw_out: list = []
    padded = (
        text.replace("(", " ( ").replace(")", " ) ").replace("+", " + ")
    )
    for raw in padded.split():
        mc = re.fullmatch("\x04([0-9,]*)\x04", raw)
        if mc:
            spec = mc.group(1)
            raw_out.append(
                ("COL", tuple(int(x) for x in spec.split(",")) if spec else ())
            )
            continue
        m2 = re.fullmatch("\x02(\\d+)\x02", raw)
        if m2:
            g = nears[int(m2.group(1))]
            if isinstance(g, NearGroup) or g:
                raw_out.append(g)
            continue
        if raw in ("(", ")", "OR", "AND", "NOT", "+"):
            raw_out.append(raw)
            continue
        # FTS5 '^' initial-token anchor: applies to the unit it prefixes
        # (term, quoted phrase, or prefix stem)
        anchored = raw.startswith("^")
        if anchored:
            raw = raw.lstrip("^")
            if not raw:
                continue
        m = re.fullmatch("\x00(\\d+)\x00(\\*?)", raw)
        if m:
            terms = tuple(tokenize_py(phrases[int(m.group(1))], analyzer))
            # '"a b"*': ordered phrase whose LAST token is a prefix stem
            # (FTS5, probed: tf = instance count, df = docs with an
            # instance). Trigram: ≡ the plain phrase (3-cp prefix over
            # 3-cp terms is exact)
            star = bool(m.group(2)) and not _is_trigram(analyzer)
            if terms:
                raw_out.append([Unit(terms, prefix=star, anchored=anchored)])
            continue
        if raw.endswith("*"):
            # FTS5 prefix token: the stem goes THROUGH the tokenizer
            # (stemming included — verified against SQLite), then
            # prefix-matches stored terms. A '*' inside quotes is
            # stripped by the tokenizer (literal — also FTS5's
            # behavior).
            toks = tokenize_py(raw.rstrip("*"), analyzer)
            if toks:
                if _is_trigram(analyzer):
                    # trigram: all stored terms are EXACTLY 3 codepoints
                    # (1:1 fold, asserted at table generation), so a
                    # 3-cp prefix over them is an exact match — `X*` is
                    # score-identical to the plain phrase `X` (probed:
                    # hel* == hel, hell* == hello-window phrase)
                    raw_out.append([Unit(tuple(toks), anchored=anchored)])
                elif len(toks) == 1:
                    raw_out.append(
                        [Unit((toks[0],), prefix=True, anchored=anchored)]
                    )
                elif anchored or _phrase_barewords(analyzer):
                    # FTS5 reads `foo_bar*` as the phrase "foo + bar*":
                    # one phrase-prefix unit (exact — tf = instance
                    # count, df = docs with an instance; probed)
                    raw_out.append(
                        [Unit(tuple(toks), prefix=True, anchored=anchored)]
                    )
                else:
                    raw_out.append(
                        [Unit((t,)) for t in toks[:-1]]
                        + [Unit((toks[-1],), prefix=True)]
                    )
            continue
        toks = tokenize_py(raw, analyzer)
        if not toks:
            continue
        if len(toks) > 1 and (anchored or _phrase_barewords(analyzer)):
            # a multi-token word reads as ONE ordered phrase — FTS5's
            # semantics (always under `^`; for fts5/trigram analyzers
            # everywhere, probed: `foo_bar` == "foo bar" phrase, and a
            # trigram bareword is its sliding-window phrase)
            raw_out.append([Unit(tuple(toks), anchored=anchored)])
        else:
            raw_out.append(
                [Unit((toks[0],), anchored=anchored)]
                if anchored
                else [Unit((t,)) for t in toks]
            )

    out: list = []
    for el in _plus_merge(raw_out):
        if isinstance(el, list) and el and isinstance(el[0], Unit):
            out.append([occ.unit(u) for u in el])
        elif isinstance(el, NearGroup):
            out.append(occ.group(el))
        else:
            out.append(el)
    return out


def _dnf_or(a: list[Conjunct], b: list[Conjunct]) -> list[Conjunct]:
    return a + b


def _dnf_and(a: list[Conjunct], b: list[Conjunct]) -> list[Conjunct]:
    out = [
        Conjunct(
            x.includes + y.includes,
            x.excludes + y.excludes,
            x.nears + y.nears,
            x.exclude_exprs + y.exclude_exprs,
        )
        for x in a
        for y in b
    ]
    if len(out) > _MAX_DISJUNCTS:
        raise ValueError(
            f"query too complex: DNF expansion exceeds {_MAX_DISJUNCTS} conjuncts"
        )
    return out


class _Parser:
    """Recursive descent over the token stream; produces DNF directly
    (lists of Conjunct). Precedence (FTS5): NOT > AND (implicit on
    adjacency) > OR. Error recovery, not rejection, for unbalanced
    parens: a stray ')' ends the innermost group; an unclosed '(' is
    closed at end of input — arbitrary garbage never raises. NOT
    operands of any shape are exact: unit-like operands become
    unit-level excludes, grouped/NEAR/nested operands keep their full
    match-set as an exclude expression. ValueError is raised only for
    DNF blowup past the complexity ceiling (documented limit)."""

    def __init__(self, toks: list):
        self.toks = toks
        self.i = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def expr(self) -> list[Conjunct]:
        out = self.and_expr()
        while self._peek() == "OR":
            self._next()
            out = _dnf_or(out, self.and_expr())
        return out

    def and_expr(self) -> list[Conjunct]:
        out: list[Conjunct] | None = None
        while True:
            t = self._peek()
            if t is None or t in ("OR", ")"):
                break
            if t == "AND":
                self._next()
                continue
            nxt = self.not_expr()
            if not nxt:
                continue
            out = nxt if out is None else _dnf_and(out, nxt)
        return out if out is not None else []

    def not_expr(self) -> list[Conjunct]:
        out = self.atom()
        while self._peek() == "NOT":
            self._next()
            rhs = self.atom()
            # UNIT-LIKE operands (a single unit, or an OR of single
            # units) become unit-level excludes: excluding each member
            # individually is exact there (absent-any-of ≡ not-matching
            # the group). Every OTHER operand — AND groups, NEAR groups,
            # nested NOTs — is kept as a full exclude EXPRESSION whose
            # match set is subtracted downstream: FTS5's exact semantics
            # (pinned by parity tests; 'a NOT (b c)' excludes only docs
            # matching b AND c).
            excl_units: list[Unit] = []
            excl_exprs: list[tuple[Conjunct, ...]] = []
            unitlike = bool(rhs) and all(
                len(c.includes) == 1
                and not c.excludes
                and not c.nears
                and not c.exclude_exprs
                for c in rhs
            )
            if unitlike:
                for c in rhs:
                    excl_units.extend(c.includes)
            elif rhs:
                excl_exprs.append(tuple(rhs))
            if not out:
                # bare NOT (no LHS): FTS5 errors; keep an exclude-only
                # conjunct, which matches nothing downstream
                out = [Conjunct((), tuple(excl_units), (), tuple(excl_exprs))]
            else:
                out = [
                    Conjunct(
                        c.includes,
                        c.excludes + tuple(excl_units),
                        c.nears,
                        c.exclude_exprs + tuple(excl_exprs),
                    )
                    for c in out
                ]
        return out

    def atom(self) -> list[Conjunct]:
        t = self._peek()
        if isinstance(t, tuple) and t and t[0] == "COL":
            # column filter binds to the next atom — a unit, a NEAR
            # group, or a whole parenthesized group (distribution over
            # the group is FTS5's semantics, pinned); nested colspecs
            # intersect (_cols_inter)
            self._next()
            return _apply_cols(self.atom(), t[1])
        if isinstance(t, NearGroup):
            self._next()
            # the group is self-contained: satisfaction implies every
            # member is present, and members score as CONSTRAINED atoms
            # (supported instances only — near_supported), so they are
            # NOT duplicated into the includes
            return [Conjunct((), (), (t,))]
        if t == "(":
            self._next()
            inner = self.expr()
            if self._peek() == ")":
                self._next()
            return inner
        if t == ")":
            self._next()  # stray ')': ignore
            return []
        if isinstance(t, list):
            self._next()
            return [Conjunct(tuple(t))]
        if t in ("OR", "AND", "NOT", None):
            return []
        self._next()
        return []


def parse_query(
    text: str,
    analyzer: str = "simple",
    fields: tuple[str, ...] | list[str] | None = None,
) -> ParsedQuery:
    """Parse a query string into OR-of-AND units (DNF).

    Quoted segments become phrase units (tokenized with the index
    analyzer, order preserved); ``tok*`` becomes a prefix unit; ``^``
    anchors the unit it prefixes to token position 0 (FTS5 initial-token
    anchor); ``OR`` joins disjuncts; ``AND`` is a no-op separator
    (implicit AND); ``NOT`` excludes its right operand (FTS5 binary NOT
    at highest precedence) — exactly: unit-like operands as unit
    excludes, grouped/NEAR/nested operands as full exclude expressions
    whose match set is subtracted; parentheses group arbitrarily — the
    parser normalizes to disjunctive normal form, so ``(a OR b) c``
    executes as ``(a c) OR (b c)`` with FTS5's per-subexpression scoring
    preserved via disjunct-level contribution gating in the engines.
    Phrases that tokenize to one term degrade to term units; empty
    phrases/terms vanish. An all-empty query yields zero disjuncts
    (callers treat it as no-match or raise in strict mode, matching
    FTS5's error on an empty MATCH). Unbalanced parentheses are
    recovered, never fatal; ValueError is raised only for DNF blowup
    past 64 conjuncts (documented limit).
    """
    phrases: list[str] = []

    def _stash(m: re.Match) -> str:
        phrases.append(m.group(2))
        # trailing '*' (attached or whitespace-detached — FTS5 accepts
        # both, probed) rides the marker: the phrase's LAST token
        # becomes a prefix stem ('"foo bar"*' = the phrase "foo + bar*")
        return f" {m.group(1)}\x00{len(phrases) - 1}\x00{m.group(3)} "

    rest = _PHRASE_RE.sub(_stash, text or "")
    if fields:
        # multi-field index: FTS5 column-filter syntax is live (colons
        # inside quoted phrases are already stashed). fields=None keeps
        # the single-field surface byte-for-byte unchanged.
        rest = _sub_colspecs(rest, tuple(fields))
    parser = _Parser(_lex(rest, analyzer, phrases))
    disjuncts: list[Conjunct] = []
    while parser._peek() is not None:  # recover across stray ')' at top level
        part = parser.expr()
        disjuncts.extend(
            c
            for c in part
            if c.includes or c.excludes or c.nears or c.exclude_exprs
        )
        if parser._peek() == ")":
            parser._next()
    # dedupe identical conjuncts (DNF distribution can repeat them) —
    # set-keyed: every node is a frozen dataclass, and list membership
    # was O(d²) dataclass comparisons over unbounded top-level OR fanout
    seen: list[Conjunct] = []
    seen_set: set[Conjunct] = set()
    for c in disjuncts:
        if c not in seen_set:
            seen.append(c)
            seen_set.add(c)
    return ParsedQuery(tuple(seen))
