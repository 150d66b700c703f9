"""Tokenization — the engine's analyzers.

The reference delegates tokenization to FTS5 ``tokenize='porter'``
(unicode61 word-split + case-fold + diacritic-strip, then Porter stem;
``message_manager.py:101-110``). The engine implements three analyzers,
all applied identically at index *and* query time (the FTS5 contract —
"stems the words before indexing and querying"):

- ``simple``   — lowercase, split on ``[^a-z0-9]+``. Expressible as a
  native Spark Column (JVM-side, whole-stage codegen — no UDF at all)
  and replicable in ANSI SQL, so it is the analyzer used for the DuckDB
  correctness oracle.
- ``fts5``     — unicode61 + Porter: rank-identity mode against the
  reference's actual SQLite FTS5 behavior (parity-tested in
  tests/test_fts5_parity.py).
- ``unicode61`` — FTS5's DEFAULT tokenizer (unicode61 WITHOUT the
  porter wrapper).

The two unicode61-family analyzers accept FTS5's own tokenizer options
appended to the name, with SQLite's exact semantics (probed; parity in
tests/test_u61_options.py):

    "fts5 remove_diacritics 2 tokenchars '-_' separators 'X'"
    "unicode61 remove_diacritics 0"

``remove_diacritics`` 0/1/2 select probed fold tables (0 = case folds
only, 1 = default diacritic strip, 2 = additionally folds the
multi-diacritic precomposed codepoints level 1 leaves alone);
``tokenchars``/``separators`` edit the token-character CLASS on raw
codepoints BEFORE case folding (probed: ``separators 'b'`` splits
``abc`` but not ``aBc``), applied in declaration order with the last
declaration winning per character. Values are bare words or
single-quoted with ``''`` escaping, exactly FTS5's tokenize-argument
syntax. ``categories`` is refused (documented divergence).
- ``code``     — code-aware (north star): splits identifiers on
  camelCase / snake_case boundaries, lowercases, drops language-specific
  stopwords (keywords like ``def``/``import`` that would dominate the
  index), optional Porter stemming off by default.

Python-side batch implementations are vectorized over pandas Series with
a per-batch vocabulary cache (stemming cost is O(unique tokens), not
O(tokens)); exposed to Spark as Arrow ``pandas_udf`` — no per-row Python
at the plan level (BASELINE.json input_hint).
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from sparkgrep.functions.porter import porter_stem
from sparkgrep.functions._trigramfold import TRIGRAM_FOLD
from sparkgrep.functions._unicode61 import (
    ALNUM_RANGES,
    FOLD,
    NONSTARTER_RANGES,
)

SIMPLE_SPLIT_RE = "[^a-z0-9]+"  # shared with the DuckDB oracle SQL

# `code` analyzer word chars: unicode letters/digits (engine-defined
# split, mirrored by its oracle SQL — NOT an FTS5-parity surface)
_UNICODE_WORD_RE = re.compile(r"[^\W_]+", re.UNICODE)

# fts5 analyzer: SQLite unicode61's EXACT token-character set and
# case-fold + remove_diacritics=1 map, generated from the installed
# SQLite by tools/gen_unicode61.py (unassigned codepoints are token
# chars in unicode61 — only known separators split). A token is
# STARTER CONTINUATION* — the probed NONSTARTER set (SQLite's fixed
# isdiacritic combining marks inside the class) is skipped at token
# start but kept mid-token; invisible under remove_diacritics 1/2
# (those marks fold to '') but load-bearing under level 0.
def _char_class(ranges) -> str:
    parts = []
    for a, b in ranges:
        parts.append(f"\\U{a:08x}" if a == b else f"\\U{a:08x}-\\U{b:08x}")
    return "[" + "".join(parts) + "]"


def _subtract_ranges(base, removed_cps):
    """Range list minus a sorted iterable of codepoints."""
    out = []
    for a, b in base:
        start = a
        for cp in removed_cps:
            if a <= cp <= b and cp >= start:
                if start <= cp - 1:
                    out.append((start, cp - 1))
                start = cp + 1
        if start <= b:
            out.append((start, b))
    return tuple(out)


_NS_CPS = tuple(
    cp for a, b in NONSTARTER_RANGES for cp in range(a, b + 1)
)
_NS_SET = frozenset(_NS_CPS)


def _token_regex(class_ranges) -> "re.Pattern[str]":
    starters = _subtract_ranges(class_ranges, _NS_CPS)
    return re.compile(_char_class(starters) + _char_class(class_ranges) + "*")


_U61_TOKEN_RE = _token_regex(ALNUM_RANGES)
# camelCase boundaries: lower/digit→Upper, and ACRONYMWord splits
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")

# Language keywords excluded by the `code` analyzer (the north star's
# "lang-specific stoplists" — hot tokens like def/import carry no signal
# and create merge skew).
CODE_STOPLISTS: dict[str, frozenset[str]] = {
    "python": frozenset(
        "def import from return class self if else elif for while in not and "
        "or none true false pass with as try except raise lambda yield is "
        "del global nonlocal assert break continue finally".split()
    ),
    "java": frozenset(
        "public private protected static void class import return new final "
        "if else for while int long boolean string this null true false try "
        "catch throws throw extends implements package interface".split()
    ),
    "go": frozenset(
        "func package import return var type struct interface if else for "
        "range map chan go defer nil true false const switch case break "
        "continue select".split()
    ),
    "js": frozenset(
        "function const let var return import export if else for while new "
        "this null undefined true false class extends async await try catch "
        "throw typeof instanceof".split()
    ),
    "rust": frozenset(
        "fn let mut pub use impl struct enum trait return if else for while "
        "loop match mod crate self super true false const static ref where "
        "async await dyn box".split()
    ),
}

ANALYZERS = ("simple", "fts5", "code", "trigram", "unicode61")

# analyzers that accept FTS5 unicode61 tokenizer options appended to
# the name ("fts5 remove_diacritics 2 tokenchars '-_'"); 'fts5' wraps
# the folded stream in porter (the reference's tokenize='porter'),
# 'unicode61' is FTS5's default tokenizer, unstemmed
U61_BASES = frozenset({"fts5", "unicode61"})


def base_analyzer(spec: str) -> str:
    """First word of an analyzer spec — the family name; options follow."""
    return spec.split(None, 1)[0] if spec and spec.strip() else spec


def is_u61_family(spec: str) -> bool:
    return base_analyzer(spec) in U61_BASES


def _lex_u61_opts(rest: str) -> list[str]:
    """Split an options tail into words, honoring FTS5's tokenize-argument
    syntax: whitespace-separated bare words or single-quoted strings with
    '' escaping."""
    out: list[str] = []
    i, n = 0, len(rest)
    while i < n:
        c = rest[i]
        if c.isspace():
            i += 1
            continue
        if c == "'":
            i += 1
            buf = []
            while True:
                if i >= n:
                    raise ValueError(
                        "error in tokenizer constructor: unterminated "
                        f"quoted value in analyzer spec {rest!r}"
                    )
                if rest[i] == "'":
                    if i + 1 < n and rest[i + 1] == "'":  # '' escape
                        buf.append("'")
                        i += 2
                        continue
                    i += 1
                    break
                buf.append(rest[i])
                i += 1
            out.append("".join(buf))
        else:
            j = i
            while j < n and not rest[j].isspace():
                j += 1
            out.append(rest[i:j])
            i = j
    return out


@lru_cache(maxsize=None)
def _parse_u61_spec(spec: str) -> tuple[bool, int, tuple[tuple[int, bool], ...]]:
    """Parse a unicode61-family analyzer spec → (stem, remove_diacritics
    level, per-codepoint class overrides in declaration order). Raises
    ValueError with FTS5's 'error in tokenizer constructor' phrasing on
    the inputs SQLite refuses (probed)."""
    parts = spec.split(None, 1)
    base = parts[0]
    if base not in U61_BASES:
        raise ValueError(f"not a unicode61-family analyzer: {spec!r}")
    words = _lex_u61_opts(parts[1]) if len(parts) > 1 else []
    if len(words) % 2:
        raise ValueError(
            "error in tokenizer constructor: unicode61 options come in "
            f"name/value pairs, got {words!r}"
        )
    rd = 1
    overrides: list[tuple[int, bool]] = []
    for name, val in zip(words[::2], words[1::2]):
        if name == "remove_diacritics":
            if val not in ("0", "1", "2"):
                raise ValueError(
                    "error in tokenizer constructor: remove_diacritics "
                    f"must be 0, 1 or 2, got {val!r}"
                )
            rd = int(val)
        elif name == "tokenchars":
            overrides.extend((ord(ch), True) for ch in val)
        elif name == "separators":
            overrides.extend((ord(ch), False) for ch in val)
        elif name == "categories":
            raise ValueError(
                "unicode61 'categories' is not supported by this engine "
                "(SQLite accepts it; documented divergence — the default "
                "L*/N*/Co class is always used)"
            )
        else:
            raise ValueError(
                "error in tokenizer constructor: unknown unicode61 "
                f"option {name!r}"
            )
    return base == "fts5", rd, tuple(overrides)


@lru_cache(maxsize=8)
def _fold_for(rd: int) -> dict[int, str]:
    if rd == 1:
        return FOLD
    from sparkgrep.functions._unicode61 import FOLD0, FOLD2_DIFF

    if rd == 0:
        return FOLD0
    f = dict(FOLD)
    for cp, s in FOLD2_DIFF.items():
        if s == chr(cp):
            f.pop(cp, None)
        else:
            f[cp] = s
    return f


def _ranges_with_overrides(
    overrides: tuple[tuple[int, bool], ...]
) -> tuple[tuple[int, int], ...]:
    """Token-character ranges after tokenchars/separators edits (last
    declaration wins per codepoint; the NONSTARTER diacritic set is
    immune to both edits — all probed FTS5 behavior)."""
    final: dict[int, bool] = {}
    for cp, is_tok in overrides:
        if cp not in _NS_SET:
            final[cp] = is_tok
    removed = sorted(cp for cp, v in final.items() if not v)
    added = sorted(cp for cp, v in final.items() if v)
    out = list(_subtract_ranges(ALNUM_RANGES, removed))
    for cp in added:
        if not any(a <= cp <= b for a, b in out):
            out.append((cp, cp))
    return tuple(sorted(out))


@lru_cache(maxsize=64)
def _u61_components(spec: str):
    """(compiled token regex, fold translate table, stem flag) for a
    unicode61-family analyzer spec. 'fts5' bare resolves to the exact
    module-level fast-path tables (bitwise-identical streams)."""
    stem, rd, overrides = _parse_u61_spec(spec)
    if not overrides:
        token_re = _U61_TOKEN_RE
    else:
        token_re = _token_regex(_ranges_with_overrides(overrides))
    return token_re, _fold_for(rd), stem


@lru_cache(maxsize=64)
def _u61_tokenizer(spec: str):
    """Tokenizer callable for a unicode61-family spec, with its own
    per-vocabulary stem/fold cache (same O(distinct tokens) discipline
    as the bare-fts5 fast path)."""
    token_re, fold, stem = _u61_components(spec)
    cache: dict[str, str] = {}

    def tok(text: str) -> list[str]:
        if len(cache) > _FTS5_CACHE_MAX:
            cache.clear()
        out = []
        for m in token_re.findall(text):
            s = cache.get(m)
            if s is None:
                w = m.translate(fold)
                s = cache[m] = porter_stem(w) if stem else w
            if s:
                out.append(s)
        return out

    return tok


@lru_cache(maxsize=None)
def trigram_case_sensitive(spec: str) -> bool:
    """Parse a trigram analyzer spec ('trigram [case_sensitive 0|1]') →
    the case_sensitive flag. SQLite's trigram tokenizer option, probed
    on the installed build (its ``remove_diacritics`` is a NEWER SQLite
    feature and is refused here like the installed engine refuses it).
    Raises FTS5's 'error in tokenizer constructor' phrasing on the
    inputs SQLite refuses."""
    parts = spec.split(None, 1)
    if parts[0] != "trigram":
        raise ValueError(f"not a trigram analyzer: {spec!r}")
    words = _lex_u61_opts(parts[1]) if len(parts) > 1 else []
    if len(words) % 2:
        raise ValueError(
            "error in tokenizer constructor: trigram options come in "
            f"name/value pairs, got {words!r}"
        )
    cs = False
    for name, val in zip(words[::2], words[1::2]):
        if name == "case_sensitive":
            if val not in ("0", "1"):
                raise ValueError(
                    "error in tokenizer constructor: case_sensitive "
                    f"must be 0 or 1, got {val!r}"
                )
            cs = val == "1"
        else:
            raise ValueError(
                "error in tokenizer constructor: unknown trigram option "
                f"{name!r} (the installed SQLite supports only "
                "case_sensitive)"
            )
    return cs


def trigram_fold(spec: str) -> dict[int, str]:
    """The trigram fold table for a spec: the probe-generated 1:1 table
    under case_sensitive 0 (the default), identity under 1."""
    return {} if trigram_case_sensitive(spec) else TRIGRAM_FOLD


def _trigram_cs_py(text: str) -> list[str]:
    return [text[i : i + 3] for i in range(len(text) - 2)] if text else []


def _trigram_fn(spec: str):
    return _trigram_cs_py if trigram_case_sensitive(spec) else _trigram_py


def _spec_tokenizer(analyzer: str):
    """Tokenizer callable for a parameterized analyzer spec (unicode61
    family or trigram options), or None for the plain named analyzers
    handled by the fast paths."""
    b = base_analyzer(analyzer)
    if b in U61_BASES:
        return _u61_tokenizer(analyzer)
    if b == "trigram":
        return _trigram_fn(analyzer)
    return None


def validate_analyzer(analyzer: str) -> None:
    """Fail fast (driver-side) on an unknown analyzer or a malformed
    tokenizer option spec, before any executor touches it."""
    if analyzer in ANALYZERS:
        return
    if is_u61_family(analyzer):
        _parse_u61_spec(analyzer)
        return
    if base_analyzer(analyzer) == "trigram":
        trigram_case_sensitive(analyzer)
        return
    raise ValueError(f"unknown analyzer {analyzer!r} (choose from {ANALYZERS})")


# ---------------------------------------------------------------------------
# native-Column analyzer (simple): stays entirely JVM-side


def simple_tokens_col(text: Column) -> Column:
    """`simple` analyzer as a native Spark expression (WholeStageCodegen;
    DuckDB oracle: ``list_filter(regexp_split_to_array(lower(text),
    '[^a-z0-9]+'), x -> x <> '')``)."""
    return F.array_remove(F.split(F.lower(text), SIMPLE_SPLIT_RE), "")


# ---------------------------------------------------------------------------
# python-side analyzers (vectorized over pandas batches)


def _simple_py(text: str) -> list[str]:
    return [t for t in re.split(SIMPLE_SPLIT_RE, text.lower()) if t]


def _fts5_norm_stem(raw: str) -> str:
    # unicode61 case-fold + remove_diacritics via the probed table (one
    # translate — no str.lower(), whose mapping differs from SQLite's
    # simple fold for some codepoints and is context-sensitive for final
    # sigma), then SQLite's porter
    return porter_stem(raw.translate(FOLD))


# Vocabulary cache: stemming cost is O(distinct tokens), not O(tokens).
# A plain dict beats lru_cache's wrapper by ~1.7x in the hot loop and a
# factorize/np.unique batch pass by ~1.5x (measured — object-array
# shuffling costs more than dict hits). Bounded to keep a pathological
# vocabulary from pinning executor memory.
_FTS5_CACHE: dict[str, str] = {}
_FTS5_CACHE_MAX = 1 << 20


def _fts5_py(text: str) -> list[str]:
    cache = _FTS5_CACHE
    if len(cache) > _FTS5_CACHE_MAX:
        cache.clear()
    out = []
    for m in _U61_TOKEN_RE.findall(text):
        s = cache.get(m)
        if s is None:
            s = cache[m] = _fts5_norm_stem(m)
        if s:
            out.append(s)
    return out


def _trigram_py(text: str) -> list[str]:
    """SQLite fts5 ``trigram`` tokenizer (fts5 docs §4.3.3, defaults
    ``case_sensitive=0 remove_diacritics=0``): every contiguous
    3-CODEPOINT window of the case-folded text — no separator classes
    (whitespace/punctuation are token chars), no diacritic removal. The
    fold table is probe-generated from the installed SQLite
    (tools/gen_trigram_fold.py) and 1:1, so token i covers codepoints
    [i, i+3) and positions are ordinary sequential token indexes —
    barewords/phrases/NEAR/anchors ride the standard phrase machinery.
    Texts (and query words) shorter than 3 codepoints yield no tokens,
    matching SQLite (a 2-char trigram query matches nothing)."""
    folded = text.translate(TRIGRAM_FOLD)
    return [folded[i : i + 3] for i in range(len(folded) - 2)]


@lru_cache(maxsize=1 << 20)
def _code_subtokens(raw: str) -> tuple[str, ...]:
    return tuple(p.lower() for p in _CAMEL_RE.split(raw) if p)


# Per-language vocabulary cache: raw identifier → the tuple of kept
# (camel/snake-split, lowercased, stop-filtered) subtokens. Same
# plain-dict-beats-wrappers result as the fts5 cache (1.3x measured on
# code-shaped batches). Bounded per language.
_CODE_CACHES: dict[str, dict[str, tuple[str, ...]]] = {}
_CODE_CACHE_MAX = 1 << 20


def _code_py(text: str, lang: str | None = None, stem: bool = False) -> list[str]:
    lg = (lang or "").lower()
    stop = CODE_STOPLISTS.get(lg, frozenset())
    cache = _CODE_CACHES.get(lg)
    if cache is None:
        cache = _CODE_CACHES[lg] = {}
    elif len(cache) > _CODE_CACHE_MAX:
        cache.clear()
    out: list[str] = []
    for m in _UNICODE_WORD_RE.findall(text):
        subs = cache.get(m)
        if subs is None:
            subs = cache[m] = tuple(
                s for s in _code_subtokens(m) if s not in stop
            )
        if stem:
            out.extend(porter_stem(s) for s in subs)
        else:
            out.extend(subs)
    return out


def tokenize_py(text: str, analyzer: str = "simple", lang: str | None = None) -> list[str]:
    """Single-string tokenization (query side — same function the UDFs
    apply per batch, so index and query agree by construction)."""
    if text is None:
        return []
    if analyzer == "simple":
        return _simple_py(text)
    if analyzer == "fts5":
        return _fts5_py(text)
    if analyzer == "code":
        return _code_py(text, lang)
    if analyzer == "trigram":
        return _trigram_py(text)
    fn = _spec_tokenizer(analyzer)
    if fn is not None:
        return fn(text)
    raise ValueError(f"unknown analyzer {analyzer!r} (choose from {ANALYZERS})")


def _fts5_series(texts: pd.Series) -> pd.Series:
    """Batch fts5 tokenization: per-batch vocabulary dict means porter
    runs once per DISTINCT token (measured 1.15x the `simple` analyzer's
    cost on natural-text batches — see _FTS5_CACHE note)."""
    return texts.fillna("").map(_fts5_py)


def tokenize_series(texts: pd.Series, analyzer: str, langs: pd.Series | None = None) -> pd.Series:
    """Batch tokenization over a pandas Series (Arrow batch inside UDFs)."""
    if analyzer == "simple":
        # pure-pandas vectorized path
        return (
            texts.fillna("")
            .str.lower()
            .str.split(SIMPLE_SPLIT_RE, regex=True)
            .map(lambda toks: [t for t in toks if t])
        )
    if analyzer == "fts5":
        return _fts5_series(texts)
    if analyzer == "code":
        if langs is None:
            return texts.fillna("").map(_code_py)
        return pd.Series(
            [_code_py(t, lg) for t, lg in zip(texts.fillna(""), langs)],
            index=texts.index,
        )
    if analyzer == "trigram":
        return texts.fillna("").map(_trigram_py)
    fn = _spec_tokenizer(analyzer)
    if fn is not None:
        return texts.fillna("").map(fn)
    raise ValueError(f"unknown analyzer {analyzer!r} (choose from {ANALYZERS})")


def tokenize_flat(
    texts: pd.Series, analyzer: str, langs: pd.Series | None = None
):
    """Batch tokenization into ONE flat token array + per-doc lengths —
    the SPIMI pass's shape. Same analyzers and token streams as
    :func:`tokenize_series` (doc i's tokens are
    ``flat[lens[:i].sum() : lens[:i+1].sum()]``), but skips the per-doc
    list objects and the re-concatenation the Series form forces —
    measured as large as the tokenize itself on code batches.

    Returns ``(flat: np.ndarray[object], lens: np.ndarray[int64])``."""
    import numpy as np

    n = len(texts)
    lens = np.empty(n, dtype=np.int64)
    out: list[str] = []
    vals = texts.fillna("")
    if analyzer == "simple":
        fn = _simple_py
        for i, t in enumerate(vals):
            n0 = len(out)
            out.extend(fn(t))
            lens[i] = len(out) - n0
    elif analyzer == "fts5":
        for i, t in enumerate(vals):
            n0 = len(out)
            out.extend(_fts5_py(t))
            lens[i] = len(out) - n0
    elif analyzer == "code":
        if langs is None:
            for i, t in enumerate(vals):
                n0 = len(out)
                out.extend(_code_py(t))
                lens[i] = len(out) - n0
        else:
            for i, (t, lg) in enumerate(zip(vals, langs)):
                n0 = len(out)
                out.extend(_code_py(t, lg))
                lens[i] = len(out) - n0
    elif analyzer == "trigram":
        for i, t in enumerate(vals):
            n0 = len(out)
            out.extend(_trigram_py(t))
            lens[i] = len(out) - n0
    elif _spec_tokenizer(analyzer) is not None:
        fn = _spec_tokenizer(analyzer)
        for i, t in enumerate(vals):
            n0 = len(out)
            out.extend(fn(t))
            lens[i] = len(out) - n0
    else:
        raise ValueError(f"unknown analyzer {analyzer!r} (choose from {ANALYZERS})")
    flat = np.asarray(out, dtype=object) if out else np.empty(0, dtype=object)
    return flat, lens


# ---------------------------------------------------------------------------
# Spark surface


def tokens_col(text: Column, analyzer: str = "simple", lang: Column | None = None) -> Column:
    """Tokenize a text column → array<string> under the given analyzer.

    `simple` compiles to a native expression; `fts5`/`code` are Arrow
    pandas UDFs (the only place Python touches row data).
    """
    if analyzer == "simple":
        return simple_tokens_col(text)

    if analyzer == "fts5":

        @F.pandas_udf(ArrayType(StringType()))
        def _fts5_udf(s: pd.Series) -> pd.Series:
            return tokenize_series(s, "fts5")

        return _fts5_udf(text)

    if analyzer == "code":
        if lang is None:

            @F.pandas_udf(ArrayType(StringType()))
            def _code_udf(s: pd.Series) -> pd.Series:
                return tokenize_series(s, "code")

            return _code_udf(text)

        @F.pandas_udf(ArrayType(StringType()))
        def _code_lang_udf(s: pd.Series, lg: pd.Series) -> pd.Series:
            return tokenize_series(s, "code", lg)

        return _code_lang_udf(text, lang)

    if analyzer == "trigram":

        @F.pandas_udf(ArrayType(StringType()))
        def _trigram_udf(s: pd.Series) -> pd.Series:
            return tokenize_series(s, "trigram")

        return _trigram_udf(text)

    if _spec_tokenizer(analyzer) is not None:
        validate_analyzer(analyzer)  # fail fast driver-side on a bad spec

        @F.pandas_udf(ArrayType(StringType()))
        def _spec_udf(s: pd.Series) -> pd.Series:
            return tokenize_series(s, analyzer)

        return _spec_udf(text)

    raise ValueError(f"unknown analyzer {analyzer!r} (choose from {ANALYZERS})")
