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
from sparkgrep.functions._unicode61 import ALNUM_RANGES, FOLD

SIMPLE_SPLIT_RE = "[^a-z0-9]+"  # shared with the DuckDB oracle SQL

# `code` analyzer word chars: unicode letters/digits (engine-defined
# split, mirrored by its oracle SQL — NOT an FTS5-parity surface)
_UNICODE_WORD_RE = re.compile(r"[^\W_]+", re.UNICODE)

# fts5 analyzer: SQLite unicode61's EXACT token-character set and
# case-fold + remove_diacritics=1 map, generated from the installed
# SQLite by tools/gen_unicode61.py (unassigned codepoints are token
# chars in unicode61 — only known separators split)
def _u61_class() -> str:
    parts = []
    for a, b in ALNUM_RANGES:
        parts.append(
            f"\\U{a:08x}" if a == b else f"\\U{a:08x}-\\U{b:08x}"
        )
    return "[" + "".join(parts) + "]+"


_U61_TOKEN_RE = re.compile(_u61_class())
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

ANALYZERS = ("simple", "fts5", "code", "trigram")


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

    raise ValueError(f"unknown analyzer {analyzer!r} (choose from {ANALYZERS})")
