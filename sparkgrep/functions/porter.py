"""Porter stemmer, exactly as SQLite FTS5's ``tokenize='porter'``
applies it (reference ``message_manager.py:108-110``; behavior pinned by
reference tests ``test_message_manager.py:681-704``: run/running/runs/
runner all match "run").

Pure-Python, self-contained re-implementation (no code copied from
SQLite) of the Porter, 1980 "An algorithm for suffix stripping"
algorithm WITH the deviations SQLite's implementation makes — each one
discovered and pinned by probing the installed SQLite through
fts5vocab (tests/test_porter_sqlite.py fuzzes hundreds of thousands of
tokens to zero mismatches):

- operates on UTF-8 BYTES: digits and non-ASCII bytes are consonants,
  so digit-bearing tokens ("d8ce273e" -> "d8ce273") ARE stemmed —
  classic implementations usually skip them;
- stems only tokens of 3..64 bytes (FTS5_PORTER_MAX_TOKEN); longer or
  shorter tokens pass through untouched;
- every suffix rule requires a PROPER suffix (the stem must be
  non-empty), and a rule whose suffix matches stops its chain even when
  the measure condition fails. Hence "ies" -> "ie" (classic: "i"),
  "eed" -> "e" (classic: "eed"), "sses" -> "sse" (classic: "ss") on
  stem-less words;
- the step-1b2 double-consonant test classifies 'y' as a consonant
  unconditionally ("yying" -> "y"), without the previous-char context
  used by the measure/vowel tests.
"""

from __future__ import annotations

VOWELS = frozenset(b"aeiou")


def _is_cons(b: bytes, i: int) -> bool:
    c = b[i]
    if c in VOWELS:
        return False
    if c == 0x79:  # 'y'
        return i == 0 or not _is_cons(b, i - 1)
    return True


def _measure(b: bytes, n: int) -> int:
    """Porter 'm' of the first n bytes."""
    m = 0
    i = 0
    while i < n and _is_cons(b, i):
        i += 1
    while True:
        if i >= n:
            return m
        while i < n and not _is_cons(b, i):
            i += 1
        if i >= n:
            return m
        while i < n and _is_cons(b, i):
            i += 1
        m += 1


def _m_gt0(b, n):
    return _measure(b, n) > 0


def _m_gt1(b, n):
    return _measure(b, n) > 1


def _m_eq1(b, n):
    return _measure(b, n) == 1


def _has_vowel(b: bytes, n: int) -> bool:
    return any(not _is_cons(b, i) for i in range(n))


def _ends_cvc(b: bytes, n: int) -> bool:
    """*o: stem ends cons-vowel-cons, final cons not w/x/y."""
    if n < 3:
        return False
    return (
        _is_cons(b, n - 1)
        and b[n - 1] not in b"wxy"
        and not _is_cons(b, n - 2)
        and _is_cons(b, n - 3)
    )


def _chain(b: bytes, rules) -> bytes:
    """First PROPER-suffix match wins; apply replacement only if the
    condition holds on the stem; matching stops the chain either way."""
    n = len(b)
    for sfx, rep, cond in rules:
        ls = len(sfx)
        if n > ls and b.endswith(sfx):
            stem = n - ls
            if cond is None or cond(b, stem):
                return b[:stem] + rep
            return b
    return b


_STEP2 = [
    (b"ational", b"ate", _m_gt0),
    (b"tional", b"tion", _m_gt0),
    (b"enci", b"ence", _m_gt0),
    (b"anci", b"ance", _m_gt0),
    (b"izer", b"ize", _m_gt0),
    (b"logi", b"log", _m_gt0),
    (b"bli", b"ble", _m_gt0),
    (b"alli", b"al", _m_gt0),
    (b"entli", b"ent", _m_gt0),
    (b"eli", b"e", _m_gt0),
    (b"ousli", b"ous", _m_gt0),
    (b"ization", b"ize", _m_gt0),
    (b"ation", b"ate", _m_gt0),
    (b"ator", b"ate", _m_gt0),
    (b"alism", b"al", _m_gt0),
    (b"iveness", b"ive", _m_gt0),
    (b"fulness", b"ful", _m_gt0),
    (b"ousness", b"ous", _m_gt0),
    (b"aliti", b"al", _m_gt0),
    (b"iviti", b"ive", _m_gt0),
    (b"biliti", b"ble", _m_gt0),
]

_STEP3 = [
    (b"icate", b"ic", _m_gt0),
    (b"ative", b"", _m_gt0),
    (b"alize", b"al", _m_gt0),
    (b"iciti", b"ic", _m_gt0),
    (b"ical", b"ic", _m_gt0),
    (b"ful", b"", _m_gt0),
    (b"ness", b"", _m_gt0),
]

_STEP4 = [
    (b"al", b"", _m_gt1),
    (b"ance", b"", _m_gt1),
    (b"ence", b"", _m_gt1),
    (b"er", b"", _m_gt1),
    (b"ic", b"", _m_gt1),
    (b"able", b"", _m_gt1),
    (b"ible", b"", _m_gt1),
    (b"ant", b"", _m_gt1),
    (b"ement", b"", _m_gt1),
    (b"ment", b"", _m_gt1),
    (b"ent", b"", _m_gt1),
    (b"ion", b"", None),  # special: m>1 and stem ends s/t — handled below
    (b"ou", b"", _m_gt1),
    (b"ism", b"", _m_gt1),
    (b"ate", b"", _m_gt1),
    (b"iti", b"", _m_gt1),
    (b"ous", b"", _m_gt1),
    (b"ive", b"", _m_gt1),
    (b"ize", b"", _m_gt1),
]


def _ion_cond(b, stem):
    return stem > 0 and b[stem - 1] in b"st" and _m_gt1(b, stem)


def _step1a(b: bytes) -> bytes:
    n = len(b)
    if not b.endswith(b"s"):
        return b
    if n > 4 and b.endswith(b"sses"):
        return b[: n - 2]
    if n > 3 and b.endswith(b"ies"):
        return b[: n - 2]
    if b[n - 2 : n - 1] != b"s":
        return b[: n - 1]
    return b


def _step1b2(b: bytes) -> bytes:
    n = len(b)
    if n > 2 and b.endswith(b"at"):
        return b + b"e"
    if n > 2 and b.endswith(b"bl"):
        return b + b"e"
    if n > 2 and b.endswith(b"iz"):
        return b + b"e"
    # double-consonant test: SQLite classifies 'y' as a consonant here
    # UNCONDITIONALLY (no previous-char context), unlike measure/vowel
    if n >= 2 and b[n - 1] == b[n - 2] and b[n - 1] not in VOWELS:
        if b[n - 1] not in b"lsz":
            return b[: n - 1]
        return b
    if _m_eq1(b, n) and _ends_cvc(b, n):
        return b + b"e"
    return b


def _step1b(b: bytes) -> bytes:
    n = len(b)
    if n > 3 and b.endswith(b"eed"):
        if _m_gt0(b, n - 3):
            return b[: n - 1]
        return b
    if n > 2 and b.endswith(b"ed"):
        if _has_vowel(b, n - 2):
            return _step1b2(b[: n - 2])
        return b
    if n > 3 and b.endswith(b"ing"):
        if _has_vowel(b, n - 3):
            return _step1b2(b[: n - 3])
        return b
    return b


def _step1c(b: bytes) -> bytes:
    n = len(b)
    if n > 1 and b.endswith(b"y") and _has_vowel(b, n - 1):
        return b[: n - 1] + b"i"
    return b


def _step4_apply(b: bytes) -> bytes:
    n = len(b)
    for sfx, rep, cond in _STEP4:
        ls = len(sfx)
        if n > ls and b.endswith(sfx):
            stem = n - ls
            if sfx == b"ion":
                if _ion_cond(b, stem):
                    return b[:stem]
                return b
            if cond(b, stem):
                return b[:stem] + rep
            return b
    return b


def _step5a(b: bytes) -> bytes:
    n = len(b)
    if b.endswith(b"e"):
        m = _measure(b, n - 1)
        if m > 1 or (m == 1 and not _ends_cvc(b, n - 1)):
            return b[: n - 1]
    return b


def _step5b(b: bytes) -> bytes:
    n = len(b)
    if (
        n > 1
        and b.endswith(b"l")
        and b[n - 2] == b[n - 1]
        and _m_gt1(b, n - 1)
    ):
        return b[: n - 1]
    return b


def porter_stem(word: str) -> str:
    b = word.encode("utf-8")
    if not (3 <= len(b) <= 64):
        return word
    b = _step1a(b)
    b = _step1b(b)
    b = _step1c(b)
    b = _chain(b, _STEP2)
    b = _chain(b, _STEP3)
    b = _step4_apply(b)
    b = _step5a(b)
    b = _step5b(b)
    return b.decode("utf-8")
