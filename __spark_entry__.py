"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` carries the
DuckDB-dialect ANSI SQL that reproduces each result bit-for-bit (modulo
documented rounding of libm-derived floats). Column names and dtypes are
aligned on both sides because the driver's compare hashes values after
sorting columns by name.

Engine: :mod:`sparkgrep` (see SURVEY.md for the blueprint, README for
the architecture).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkgrep import BM25_B, BM25_K1

# ---------------------------------------------------------------------------
# flagship inputs

FLAGSHIP_QUERY = "hash join table window"
TRIGRAM_QUERY = '"hash join" OR "slow scan"'  # trigram phrases = substrings
LIKE_PATTERN = "%hash join%table%"
PP_QUERY = '"hash jo"* OR window'  # phrase-with-prefix-tail atom
STAR_QUERY = "s* + scan OR window"  # phrase-INTERNAL prefix atom
GLOB_PATTERN = "*hash[ x]join*table*"  # class matches the space
MULTI_QUERIES = [
    ("q_hot", "the", 5),                      # hot token, df ≈ N
    ("q_mid", "spark query filter sort", 10),
    ("q_none", "zqzqzq nothing", 10),         # no-match → no rows
    ("q_two", "merge batch", 7),
]

# shared DuckDB CTE prelude: tokenize `documents` exactly like the
# engine's `simple` analyzer
_TOK_CTES = """
tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, u.pos AS pos, u.term AS term
  FROM tok,
       unnest(list_transform(toks, (t, i) -> struct_pack(pos := i, term := t))) AS v(u)
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM pos GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl,
                 CAST(sum(dl) AS BIGINT) AS tot FROM dl)
"""


def _tok_ctes(docs_select: str) -> str:
    """The shared tokenize prelude over a derived docs relation (must
    yield doc_id, text) — used by the tombstone-delete/update oracles,
    which recompute BM25 from scratch over the post-mutation corpus."""
    return _TOK_CTES.replace("FROM documents", f"FROM {docs_select}", 1)


def _bm25_sql(
    terms: list[str],
    k: int,
    with_qid: str | None = None,
    idf_variant: str = "okapi",
    require_all: bool = False,
    ctes: str = _TOK_CTES,
) -> str:
    """DuckDB BM25 (k1=1.2 b=0.75) for one query, mirroring the engine's
    exact operation order (score.py:bm25_contrib_col). ``require_all``
    adds conjunctive (implicit-AND) match semantics: only docs containing
    every query term score. ``ctes`` swaps the tokenize prelude (e.g. a
    filtered corpus for the tombstone-delete oracle)."""
    uniq = sorted(set(terms))
    tlist = ", ".join(f"('{t}')" for t in uniq)
    qid_col = f"'{with_qid}' AS query_id, " if with_qid else ""
    having = f"HAVING count(*) = {len(uniq)}" if require_all else ""
    idf_expr = (
        "ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5))"
        if idf_variant == "okapi"
        else "ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))"
    )
    return f"""
WITH {ctes},
qt(term) AS (VALUES {tlist}),
dfq AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
contrib AS (
  SELECT tf.doc_id, tf.term,
         {idf_expr}
           * (tf.tf * {BM25_K1 + 1.0})
           / (tf.tf + ({BM25_K1} * ({1.0 - BM25_B} + (({BM25_B} * dl.dl) / stats.avgdl)))) AS c
  FROM tf
  JOIN dfq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
scored AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id {having})
SELECT {qid_col}CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank,
       doc_id, round(score, 4) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def _substr_bm25_sql(pats: list[str], k: int) -> str:
    """DuckDB BM25 oracle for the TRIGRAM analyzer: a trigram phrase
    match is exactly a substring occurrence (1:1 fold, window i covers
    codepoints [i, i+3)), so per-atom tf = OVERLAP-counted substring
    occurrences, df = docs containing the substring, dl = len(text)-2
    (the trigram count). documents.text is lowercase ASCII at every sf,
    so the fold is the identity and raw substr comparison is exact.
    Same okapi contribution and operation order as _bm25_sql."""
    tf_blocks = []
    for aid, p in enumerate(pats):
        lp = len(p)
        tf_blocks.append(f"""
  SELECT doc_id, {aid} AS aid,
         len(list_filter(range(1, greatest(length(text) - {lp - 1}, 0) + 1),
                         i -> substr(text, i, {lp}) = '{p}')) AS tf,
         greatest(length(text) - 2, 0) AS dl
  FROM documents""")
    tf_union = " UNION ALL ".join(tf_blocks)
    return f"""
WITH stats AS (
  SELECT count(*) AS n,
         sum(greatest(length(text) - 2, 0)) / count(*) AS avgdl
  FROM documents
),
tfs AS ({tf_union}),
dfq AS (
  SELECT aid, count(*) FILTER (WHERE tf > 0) AS df FROM tfs GROUP BY aid
),
contrib AS (
  SELECT tfs.doc_id, tfs.aid,
         ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
           * (tfs.tf * {BM25_K1 + 1.0})
           / (tfs.tf + ({BM25_K1} * ({1.0 - BM25_B} + (({BM25_B} * tfs.dl) / stats.avgdl)))) AS c
  FROM tfs
  JOIN dfq USING (aid)
  CROSS JOIN stats
  WHERE tfs.tf > 0
),
scored AS (SELECT doc_id, sum(c ORDER BY aid) AS score FROM contrib GROUP BY doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank,
       doc_id, round(score, 4) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def _units_sql(
    phrase_units: list[tuple[str, ...]],
    term_units: list[str],
    k: int,
    match_having: str = "",
    exclude_terms: list[str] | None = None,
    prefix_units: list[str] | None = None,
    near2: tuple[str, str, int] | None = None,
    caret_units: list[str] | None = None,
    exclude_group: list[str] | None = None,
    pp_units: list[tuple[str, ...]] | None = None,
    star_units: list[tuple[tuple[str, ...], tuple[int, ...]]] | None = None,
) -> str:
    """DuckDB oracle for the unit-scoring query language (querylang.py):
    each phrase/term is a BM25 atom with its own tf/df; a doc's score is
    the uid-ordered sum of contributions of the units it contains.
    ``match_having`` filters the matched-doc set (boolean semantics);
    empty = any unit present (OR). ``exclude_terms`` removes docs
    containing any of those terms (NOT semantics) — excluded units score
    0 in surviving docs by construction, so the uid-ordered sum over
    include units is unchanged. ``exclude_group`` removes docs containing
    ALL of those terms (exact NOT-of-group). ``caret_units`` are FTS5
    '^'-anchored terms (tf=1 where the doc's first token matches, df =
    anchored-doc count). ``near2`` emits the two CONSTRAINED member atoms
    of a single-term 2-member NEAR group (uid ``n0:t:<term>``): tf counts
    instances with a partner within N intervening positions, df stays
    the member's full presence — FTS5 semantics, pinned by the parity
    suite."""
    ph_ctes, ph_selects = [], []
    udf_overrides = []
    for pi, pterms in enumerate(phrase_units):
        joins = "\n  ".join(
            f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.pos = p0.pos + {i} "
            f"AND p{i}.term = '{t}'"
            for i, t in enumerate(pterms[1:], start=1)
        )
        ph_ctes.append(
            f"ph{pi} AS (\n  SELECT p0.doc_id, count(*) AS tf FROM pos p0\n  {joins}\n"
            f"  WHERE p0.term = '{pterms[0]}' GROUP BY p0.doc_id\n)"
        )
        uid = "p:" + " ".join(pterms)
        ph_selects.append(f"SELECT '{uid}' AS uid, doc_id, tf FROM ph{pi}")
    if term_units:
        tlist = ", ".join(f"'{t}'" for t in sorted(set(term_units)))
        ph_selects.append(
            f"SELECT 't:' || term AS uid, doc_id, tf FROM tf WHERE term IN ({tlist})"
        )
    for stem in sorted(set(prefix_units or [])):
        # FTS5 prefix scoring: ONE atom, tf = Σ tf(term startswith stem)
        ph_selects.append(
            f"SELECT 'x:{stem}' AS uid, doc_id, CAST(sum(tf) AS BIGINT) AS tf "
            f"FROM tf WHERE term LIKE '{stem}%' GROUP BY doc_id"
        )
    for terms in pp_units or []:
        # phrase-prefix atom ('"a b"*'): head phrase positions with a
        # stem-matching successor; tf = instance count (FTS5, pinned in
        # tests/test_phrase_prefix.py). uid mirrors querylang.Unit.uid.
        head, stem = terms[:-1], terms[-1]
        joins = "\n  ".join(
            f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.pos = p0.pos + {i} "
            + (f"AND p{i}.term = '{t}'" if t is not None else "")
            for i, t in enumerate(list(head[1:]) + [None], start=1)
        )
        nh = len(head)
        uid = "x:" + " ".join(terms)
        ph_selects.append(
            f"SELECT '{uid}' AS uid, p0.doc_id, count(*) AS tf FROM pos p0\n"
            f"  {joins}\n"
            f"  WHERE p0.term = '{head[0]}' AND p{nh}.term LIKE '{stem}%' "
            f"GROUP BY p0.doc_id"
        )
    for terms, slots in star_units or []:
        # phrase atom with arbitrary PREFIX slots (FTS5 'a* + b', pinned
        # in tests/test_star_internal.py): slot i prefix-matches when
        # starred, exact-matches otherwise; tf = instance-start count.
        # uid mirrors querylang.Unit.uid (internal stars marked '*',
        # 'x:' head only when the TAIL slot is starred).
        star = set(slots)

        def _cond(alias: str, i: int) -> str:
            if i in star:
                return f"{alias}.term LIKE '{terms[i]}%'"
            return f"{alias}.term = '{terms[i]}'"

        joins = "\n  ".join(
            f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND "
            f"p{i}.pos = p0.pos + {i} AND {_cond(f'p{i}', i)}"
            for i in range(1, len(terms))
        )
        marked = " ".join(
            t + ("*" if i in star and i < len(terms) - 1 else "")
            for i, t in enumerate(terms)
        )
        uid = ("x:" if (len(terms) - 1) in star else "p:") + marked
        ph_selects.append(
            f"SELECT '{uid}' AS uid, p0.doc_id, count(*) AS tf FROM pos p0\n"
            f"  {joins}\n"
            f"  WHERE {_cond('p0', 0)} GROUP BY p0.doc_id"
        )
    for t in sorted(set(caret_units or [])):
        # '^t': matches only where t is the doc's FIRST token (DuckDB
        # list positions are 1-based), tf = 1
        ph_selects.append(
            f"SELECT 'c:{t}' AS uid, doc_id, CAST(1 AS BIGINT) AS tf "
            f"FROM pos WHERE term = '{t}' AND pos = 1"
        )
    if near2:
        # CONSTRAINED member atoms (FTS5): an instance counts iff some
        # partner instance is within N intervening positions; df stays
        # the member's full corpus presence
        t1, t2, nn = near2
        for me, other in ((t1, t2), (t2, t1)):
            ph_selects.append(
                f"SELECT 'n0:t:{me}' AS uid, p1.doc_id, "
                f"CAST(count(DISTINCT p1.pos) AS BIGINT) AS tf "
                f"FROM pos p1 JOIN pos p2 USING (doc_id) "
                f"WHERE p1.term = '{me}' AND p2.term = '{other}' "
                f"AND greatest(p1.pos, p2.pos) - least(p1.pos, p2.pos) - 1 <= {nn} "
                f"GROUP BY p1.doc_id"
            )
            udf_overrides.append(
                f"SELECT 'n0:t:{me}' AS uid, count(*) AS df FROM tf "
                f"WHERE term = '{me}'"
            )
    unit_union = "\n  UNION ALL\n  ".join(ph_selects)
    ph_block = (",\n".join(ph_ctes) + ",") if ph_ctes else ""
    having = f"HAVING {match_having}" if match_having else ""
    not_filter = ""
    if exclude_terms:
        xlist = ", ".join(f"'{t}'" for t in sorted(set(exclude_terms)))
        not_filter = (
            f"WHERE doc_id NOT IN (SELECT doc_id FROM tf WHERE term IN ({xlist}))"
        )
    if exclude_group:
        glist = ", ".join(f"'{t}'" for t in sorted(set(exclude_group)))
        clause = (
            f"doc_id NOT IN (SELECT doc_id FROM tf WHERE term IN ({glist}) "
            f"GROUP BY doc_id HAVING count(DISTINCT term) = {len(set(exclude_group))})"
        )
        not_filter = (
            f"{not_filter} AND {clause}" if not_filter else f"WHERE {clause}"
        )
    udf_sql = "SELECT uid, count(*) AS df FROM unit_tf GROUP BY uid"
    if udf_overrides:
        # n-atoms keep full-presence df; their unit_tf rows (satisfied
        # docs only) must not define it
        udf_sql = (
            "SELECT uid, count(*) AS df FROM unit_tf "
            "WHERE uid NOT LIKE 'n%:%' GROUP BY uid"
            + "".join(f"\n  UNION ALL\n  {o}" for o in udf_overrides)
        )
    return f"""
WITH {_TOK_CTES},
{ph_block}
unit_tf AS (
  {unit_union}
),
udf AS ({udf_sql}),
matched AS (
  SELECT doc_id FROM (SELECT doc_id FROM unit_tf GROUP BY doc_id {having})
  {not_filter}
),
contrib AS (
  SELECT u.doc_id, u.uid,
         ln((stats.n - udf.df + 0.5) / (udf.df + 0.5))
           * (u.tf * {BM25_K1 + 1.0})
           / (u.tf + ({BM25_K1} * ({1.0 - BM25_B} + (({BM25_B} * dl.dl) / stats.avgdl)))) AS c
  FROM unit_tf u
  JOIN udf USING (uid)
  JOIN dl ON u.doc_id = dl.doc_id
  CROSS JOIN stats
),
scored AS (
  SELECT c.doc_id, sum(c ORDER BY uid) AS score
  FROM contrib c JOIN matched ON c.doc_id = matched.doc_id
  GROUP BY c.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank,
       doc_id, round(score, 4) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# XXH64 in pure DuckDB SQL — the segment_metrics oracle needs Spark's
# xxhash64 (seed 42) for (a) the segment assignment pmod(xxhash64(doc_id),
# n_segments) and (b) the order-independent lineage hash
# pmod(xxhash64(sha256(sha256(text))), 2^61). All arithmetic runs on
# HUGEINT values kept in [0, 2^64); 64×64-bit products are split into
# 32-bit halves so nothing exceeds the signed-128-bit range. Each hash
# step becomes ONE nested projection level — DuckDB's binder textually
# inlines lateral column aliases, which explodes exponentially for
# chained references; nested SELECTs keep every step evaluated once.
# Bit-parity with Spark is transitively pinned by tests/test_xxhash.py
# (python ↔ JVM) plus the contract hash check (SQL ↔ engine output).

_XP1 = 0x9E3779B185EBCA87
_XP2 = 0xC2B2AE3D27D4EB4F
_XP3 = 0x165667B19E3779F9
_XP4 = 0x85EBCA77C2B2AE63
_XP5 = 0x27D4EB2F165667C5
_M64 = 1 << 64
_XSEED = 42  # Spark's fixed seed


def _sql_mul64(a: str, b: int) -> str:
    bh, bl = b >> 32, b & 0xFFFFFFFF
    return (
        f"((((({a}) % 4294967296) * {bh} + (({a}) // 4294967296) * {bl})"
        f" % 4294967296) * 4294967296 + (({a}) % 4294967296) * {bl})"
        f" % 18446744073709551616"
    )


def _sql_rotl(a: str, r: int) -> str:
    lo = 1 << (64 - r)
    return f"((({a}) % {lo}) * {1 << r} + ({a}) // {lo})"


def _sql_xor(a: str, b: str) -> str:
    return f"xor(CAST({a} AS HUGEINT), CAST({b} AS HUGEINT))"


def _sql_shr(a: str, r: int) -> str:
    return f"(({a}) // {1 << r})"


def _sql_add64(a: str, b: str) -> str:
    return f"(({a}) + ({b})) % 18446744073709551616"


def _sql_round(acc: str, w: str) -> str:
    # XXH64 round: rotl(acc + w*P2, 31) * P1  (mod 2^64)
    return _sql_mul64(_sql_rotl(_sql_add64(acc, _sql_mul64(w, _XP2)), 31), _XP1)


def _sql_fmix(h: str, pfx: str) -> list[tuple[str, str]]:
    return [
        (f"{pfx}g0", _sql_xor(h, _sql_shr(h, 33))),
        (f"{pfx}g1", _sql_mul64(f"{pfx}g0", _XP2)),
        (f"{pfx}g2", _sql_xor(f"{pfx}g1", _sql_shr(f"{pfx}g1", 29))),
        (f"{pfx}g3", _sql_mul64(f"{pfx}g2", _XP3)),
        (f"{pfx}out", _sql_xor(f"{pfx}g3", _sql_shr(f"{pfx}g3", 32))),
    ]


def _xxh64_long_steps(inp: str, pfx: str) -> list[tuple[str, str]]:
    """Chain for XXH64 of an 8-byte little-endian long ≥ 0 (Spark's
    F.xxhash64 on LongType): len-8 path — one 8-byte round + fmix."""
    h0 = (_XSEED + _XP5 + 8) % _M64
    steps = [
        (f"{pfx}k", _sql_round("0", inp)),
        (f"{pfx}h0", _sql_xor(str(h0), f"{pfx}k")),
        (f"{pfx}h1", _sql_rotl(f"{pfx}h0", 27)),
        (f"{pfx}h2", _sql_add64(_sql_mul64(f"{pfx}h1", _XP1), str(_XP4))),
    ]
    return steps + _sql_fmix(f"{pfx}h2", pfx)


def _xxh64_hex64_steps(col: str, pfx: str) -> list[tuple[str, str]]:
    """Chain for XXH64 of a 64-char ASCII string column (a sha256 hex
    digest = 64 bytes = two 32-byte stripes, no tail)."""

    def word(j: int) -> str:
        parts = [
            f"ascii(substr({col}, {j * 8 + m + 1}, 1)) * {1 << (8 * m)}"
            for m in range(8)
        ]
        return "CAST(" + " + ".join(parts) + " AS HUGEINT)"

    v_init = {
        1: (_XSEED + _XP1 + _XP2) % _M64,
        2: (_XSEED + _XP2) % _M64,
        3: _XSEED % _M64,
        4: (_XSEED - _XP1) % _M64,
    }
    steps = [(f"{pfx}w{j}", word(j)) for j in range(8)]
    for lane in range(1, 5):
        steps.append((f"{pfx}v{lane}a", _sql_round(str(v_init[lane]), f"{pfx}w{lane - 1}")))
        steps.append((f"{pfx}v{lane}b", _sql_round(f"{pfx}v{lane}a", f"{pfx}w{lane + 3}")))
    steps.append(
        (
            f"{pfx}hh",
            "(" + " + ".join(
                _sql_rotl(f"{pfx}v{lane}b", r)
                for lane, r in ((1, 1), (2, 7), (3, 12), (4, 18))
            ) + ") % 18446744073709551616",
        )
    )
    h = f"{pfx}hh"
    for lane in range(1, 5):  # merge rounds
        steps.append((f"{pfx}m{lane}x", _sql_xor(h, _sql_round("0", f"{pfx}v{lane}b"))))
        steps.append((f"{pfx}m{lane}", _sql_add64(_sql_mul64(f"{pfx}m{lane}x", _XP1), str(_XP4))))
        h = f"{pfx}m{lane}"
    steps.append((f"{pfx}hl", _sql_add64(h, "64")))  # + input length
    return steps + _sql_fmix(f"{pfx}hl", pfx)


def _nest_steps(base_sql: str, keep: list[str], steps: list[tuple[str, str]]) -> str:
    """One projection level per step (see module comment above)."""
    sql = base_sql
    done: list[str] = []
    for alias, expr in steps:
        cols = ", ".join(keep + done)
        sql = f"SELECT {cols}, {expr} AS {alias} FROM ({sql})"
        done.append(alias)
    return sql


def _segment_metrics_sql(n_segments: int) -> str:
    """Oracle for the checkpointed build's lineage manifest: per segment
    (pmod(xxhash64(doc_id), n_segments)) the doc/token/posting counts and
    the order-independent content hash
    hex(Σ pmod(xxhash64(sha256(sha256(text))), 2^61)) — engine source:
    plans/manifest.py (wall_time_sec is non-deterministic and excluded)."""
    assert n_segments & (n_segments - 1) == 0, "pmod == % needs a power of 2"
    seg_sql = _nest_steps(
        "SELECT doc_id, CAST(doc_id AS HUGEINT) AS did, sha256(sha256(text)) AS hstr FROM documents",
        ["doc_id", "did", "hstr"],
        _xxh64_long_steps("did", "s"),
    )
    both_sql = _nest_steps(
        f"SELECT doc_id, sout % {n_segments} AS seg, hstr FROM ({seg_sql})",
        ["doc_id", "seg", "hstr"],
        _xxh64_hex64_steps("hstr", "c"),
    )
    return f"""
WITH {_TOK_CTES},
segmap AS (
  SELECT doc_id, seg, cout % 2305843009213693952 AS ph
  FROM ({both_sql})
),
postc AS (
  SELECT s.seg, count(*) AS n_postings
  FROM tf JOIN segmap s USING (doc_id) GROUP BY s.seg
),
agg AS (
  SELECT s.seg,
         count(*) AS n_docs,
         CAST(sum(dl.dl) AS BIGINT) AS n_tokens,
         CAST(sum(s.ph) AS HUGEINT) AS hsum
  FROM segmap s JOIN dl USING (doc_id) GROUP BY s.seg
)
SELECT CAST(segs.seg AS VARCHAR) AS segment_id,
       CAST(coalesce(agg.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(postc.n_postings, 0) AS BIGINT) AS n_postings,
       lower(to_hex(coalesce(agg.hsum, 0))) AS content_hash
FROM (SELECT CAST(unnest(range({n_segments})) AS HUGEINT) AS seg) segs
LEFT JOIN agg ON agg.seg = segs.seg
LEFT JOIN postc ON postc.seg = segs.seg
"""


def _tokenize(text: str) -> list[str]:
    from sparkgrep.functions.tokenizer import tokenize_py

    return sorted(set(tokenize_py(text, "simple")))


# ---------------------------------------------------------------------------
# Spark-side query callables


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.sources.corpus import load_corpus

    return load_corpus(spark, sf_dir)


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.stats import doc_lengths

    dls = doc_lengths(_corpus(spark, sf_dir), "simple")
    return dls.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("dl"), 6).alias("avgdl"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )


def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.stats import doc_lengths

    return doc_lengths(_corpus(spark, sf_dir), "simple").select(
        "doc_id", F.col("dl").cast("long").alias("dl")
    )


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.stats import doc_freqs, term_freqs

    return doc_freqs(term_freqs(_corpus(spark, sf_dir), "simple")).select(
        "term", F.col("df").cast("long").alias("df"), "cf"
    )


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.stats import doc_freqs, term_freqs

    return (
        doc_freqs(term_freqs(_corpus(spark, sf_dir), "simple"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(20)
        .select("term", F.col("df").cast("long").alias("df"), "cf")
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-path BM25 top-10 (SURVEY R1, R3, R5-R7)."""
    from sparkgrep.operators.score import search
    from sparkgrep.operators.stats import corpus_stats, doc_lengths, term_freqs

    corpus = _corpus(spark, sf_dir)
    tf = term_freqs(corpus, "simple")
    stats = corpus_stats(doc_lengths(corpus, "simple"))
    res = search(tf, stats, FLAGSHIP_QUERY, k=10, analyzer="simple")
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-backed BM25: SPIMI build → sharded merge → varint postings →
    pruned scan + decode + score (SURVEY R2, R4-R6). Same oracle as the
    exact path — the index must change nothing."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_idx_") + "/idx"
    build_index(_corpus(spark, sf_dir), out, analyzer="simple", n_buckets=8)
    res = InvertedIndex(spark, out).search(FLAGSHIP_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query serving over one index scan."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_idx_") + "/idx"
    build_index(_corpus(spark, sf_dir), out, analyzer="simple", n_buckets=8)
    res = InvertedIndex(spark, out).search_batch(MULTI_QUERIES)
    return res.select("query_id", "rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_serve_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-tier path (operators/serve.py): resident postings + numpy
    scoring, no Spark job per query — must equal the distributed path and
    therefore the same DuckDB oracle as bm25_topk."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.operators.serve import LocalServer

    out = tempfile.mkdtemp(prefix="sparkgrep_srv_") + "/idx"
    build_index(_corpus(spark, sf_dir), out, analyzer="simple", n_buckets=8)
    pdf = LocalServer(InvertedIndex(spark, out)).search(FLAGSHIP_QUERY, k=10)
    res = spark.createDataFrame(pdf, "rank int, doc_id long, score double")
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


PHRASE_QUERY = '"hash join"'
EXPR_QUERY = '"hash join" OR window'
PHRASE_AND_QUERY = '"hash join" table'


def _pos_index(spark: SparkSession, sf_dir: str):
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_pidx_") + "/idx"
    build_index(
        _corpus(spark, sf_dir), out, analyzer="simple", n_buckets=8,
        store_positions=True,
    )
    return InvertedIndex(spark, out)


def q_bm25_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (implicit-AND) BM25 — the reference's default MATCH
    semantics (test_message_manager.py:417-424)."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_and_") + "/idx"
    build_index(_corpus(spark, sf_dir), out, analyzer="simple", n_buckets=8)
    res = InvertedIndex(spark, out).search(FLAGSHIP_QUERY, k=10, mode="and")
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-phrase query over the positional index (reference
    test_message_manager.py:427-435): phrase = one BM25 atom whose tf is
    the phrase occurrence count."""
    res = _pos_index(spark, sf_dir).search_expr(PHRASE_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean query language: phrase OR term."""
    res = _pos_index(spark, sf_dir).search_expr(EXPR_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_phrase_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean query language: phrase AND term (implicit AND)."""
    res = _pos_index(spark, sf_dir).search_expr(PHRASE_AND_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


NOT_QUERY = "hash NOT window"
PREFIX_QUERY = "wind* scan"
PARENS_QUERY = "(hash OR window) scan"


def q_bm25_serve_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-tier boolean/phrase query language (LocalServer.search_expr)
    — must equal the distributed search_expr and therefore the same
    DuckDB oracle as bm25_expr."""
    from sparkgrep.operators.serve import LocalServer

    idx = _pos_index(spark, sf_dir)
    pdf = LocalServer(idx).search_expr(EXPR_QUERY, k=10)
    res = spark.createDataFrame(pdf, "rank int, doc_id long, score double")
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 binary NOT: docs matching the include term whose score is the
    include unit's BM25 contribution, minus docs containing the excluded
    term."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_not_") + "/idx"
    build_index(_corpus(spark, sf_dir), out, analyzer="simple", n_buckets=8)
    res = InvertedIndex(spark, out).search_expr(NOT_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 prefix unit: ``wind*`` is one scoring atom whose per-doc tf
    sums the tfs of every index term starting with the stem (pinned vs
    SQLite FTS5 in tests/test_fts5_parity.py), implicit-ANDed with a
    plain term."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_px_") + "/idx"
    build_index(_corpus(spark, sf_dir), out, analyzer="simple", n_buckets=8)
    res = InvertedIndex(spark, out).search_expr(PREFIX_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_prefix_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 ``prefix=`` INDEX (sqlite.org/fts5.html#prefix_indexes): the
    build stores one aggregated posting list per distinct 4-char term
    prefix, so ``wind*`` resolves to a single marker-term lookup —
    bucket-pruned, no dictionary scan — instead of a multi-term decode.
    Probed on real SQLite to be pure acceleration (identical bm25
    output), pinned bitwise vs the non-prefix index in
    tests/test_prefix_index.py; same DuckDB oracle as ``bm25_prefix``."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_pxi_") + "/idx"
    build_index(
        _corpus(spark, sf_dir), out, analyzer="simple", n_buckets=8,
        prefix=[4],
    )
    res = InvertedIndex(spark, out).search_expr(PREFIX_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_parens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parenthesized grouping: ``(hash OR window) scan`` — the parser
    normalizes to DNF ((hash AND scan) OR (window AND scan)); scoring is
    FTS5's global unit sum, unchanged by grouping."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_par_") + "/idx"
    build_index(_corpus(spark, sf_dir), out, analyzer="simple", n_buckets=8)
    res = InvertedIndex(spark, out).search_expr(PARENS_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


NOT_GROUP_QUERY = "hash NOT (sort merge)"


def q_bm25_not_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 NOT with a GROUPED operand (exact semantics, pinned vs
    SQLite in tests/test_fts5_parity.py): ``hash NOT (sort merge)``
    excludes only docs matching sort AND merge — the operand's full
    match set is subtracted, and its units contribute nothing to
    surviving docs' scores."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_ng_") + "/idx"
    build_index(_corpus(spark, sf_dir), out, analyzer="simple", n_buckets=8)
    res = InvertedIndex(spark, out).search_expr(NOT_GROUP_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


CARET_QUERY = "^hash join"


def q_bm25_caret(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 '^' initial-token anchor: ``^hash`` is its own BM25 atom
    matching only docs whose FIRST token is hash (tf=1, df = anchored-doc
    count — pinned vs SQLite), implicit-ANDed with a plain term. Needs a
    positional index."""
    res = _pos_index(spark, sf_dir).search_expr(CARET_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


NEAR_QUERY = "NEAR(hash window, 4)"


def q_bm25_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 NEAR: members score as ordinary atoms; the group restricts
    the match set to docs where some instance selection has ≤N token
    positions between the earliest-ending and latest-starting member
    (semantics pinned vs SQLite FTS5 in tests/test_fts5_parity.py).
    Needs a positional index."""
    res = _pos_index(spark, sf_dir).search_expr(NEAR_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


CASCADE_CATEGORIES = [("cat_hash", "hash join table"), ("cat_sort", "sort merge batch")]


def _cascade_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 4-phase classification cascade
    (classification_service.py:47-134) composed end-to-end over the BM25
    candidate tier (the reference's own dormant design,
    CANDIDATE_LIMIT_BM25=50): candidates → rescore → sigmoid +
    percentile partition (85/15) → deterministic grey validation →
    not-in-candidates defaults. The contract rescorer quantizes the BM25
    score to 3 decimals so the discrete phase/verdict columns are robust
    to cross-engine libm ulp differences (the operator's default is the
    identity)."""
    from sparkgrep.operators.classify import classify_cascade
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_cls_") + "/idx"
    build_index(corpus, out, analyzer="simple", n_buckets=8)
    return classify_cascade(
        InvertedIndex(spark, out),
        corpus,
        CASCADE_CATEGORIES,
        k_candidates=50,
        rescorer=lambda df: df.withColumn("score", F.round("score", 3)),
    )


def q_classify_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _cascade_results(spark, sf_dir)
    return res.select(
        "category", "doc_id", "phase",
        F.round("score", 4).alias("score"),
        F.round("prob", 6).alias("prob"),
        "is_in",
    )


def q_classify_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category summary counts (orchestrator.py:77-100, A3)."""
    from sparkgrep.operators.classify import classification_summary

    return classification_summary(_cascade_results(spark, sf_dir))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.dedup import exact_dup_groups

    return exact_dup_groups(_docs(spark, sf_dir))


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(
        _docs(spark, sf_dir), n_hashes=16, bands=4, k=3
    ).select("doc_id_a", "doc_id_b", F.round("est_jaccard", 6).alias("est_jaccard"))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), k=3, threshold=0.2).select(
        "doc_id_a", "doc_id_b", F.round("jaccard", 6).alias("jaccard")
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.dedup import simhash32

    return simhash32(_docs(spark, sf_dir))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded simhash near-dup pairs (hamming ≤ 3) — equi-join on 8-bit
    chunks, no cross join (pigeonhole guarantees recall 1.0)."""
    from sparkgrep.operators.dedup import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), max_hamming=3).select(
        "doc_id_a", "doc_id_b", F.col("hamming").cast("int").alias("hamming")
    )


def q_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale near-dup pipeline: LSH candidates → exact n-gram Jaccard
    verification (candidates parameter, never a corpus-wide pair sweep)."""
    from sparkgrep.operators.dedup import dedup_pipeline

    return dedup_pipeline(
        _docs(spark, sf_dir), n_hashes=16, bands=4, k=3, threshold=0.2
    ).select("doc_id_a", "doc_id_b", F.round("jaccard", 6).alias("jaccard"))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.similarity import cosine_topk

    emb = _emb(spark, sf_dir)
    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    return cosine_topk(emb, qvec, k=10).select(
        "vec_id", F.round("cosine", 4).alias("cosine")
    )


def q_ann_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted ANN index lifecycle (reference faiss_manager.py:52-95):
    build → save (partitioned by table/bucket) → load → multiprobe query.
    Must equal brute-force cosine top-10 (recall@10 = 1.0 at this scale
    with 4 planes × 16 tables, 1-bit multiprobe — wide-table/few-plane
    params chosen because random high-dim vectors have near-orthogonal
    neighbors, hyperplane LSH's hardest case) — same oracle as
    cosine_topk."""
    from sparkgrep.operators.ann_index import AnnIndex, build_ann_index

    emb = _emb(spark, sf_dir)
    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    out = tempfile.mkdtemp(prefix="sparkgrep_ann_") + "/idx"
    build_ann_index(emb, out, n_planes=4, n_tables=16)
    res = AnnIndex(spark, out).search(qvec, k=10, probe_hamming=1)
    return res.select("vec_id", F.round("cosine", 4).alias("cosine"))


def q_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN lifecycle (the FAISS IndexIVFFlat analogue next to
    ann_indexed's LSH tables; faiss_manager.py:52-95,135-178): spherical
    k-means quantizer trained on a bounded hash-ordered sample → per-list
    partitioned assignment → load → probe → exact cosine re-rank.
    nprobe = nlist here — the degenerate exhaustive probe, provably equal
    to brute force (candidates = whole corpus, same re-rank expression),
    so the brute-force oracle applies. The 500 sf0.01 embeddings are
    i.i.d. random, i.e. near-orthogonal — the coarse quantizer's hardest
    case (pruned recall at sf0.01: nprobe=8 of 16 → 0.7); PRUNED probing
    is plan-asserted in tests/test_ivf_index.py (partition pruning,
    home-list guarantee) and its recall/scan trade-off is the bench's
    ivf_recall_at_10 field."""
    from sparkgrep.operators.ivf_index import IvfIndex, build_ivf_index

    emb = _emb(spark, sf_dir)
    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    out = tempfile.mkdtemp(prefix="sparkgrep_ivf_") + "/idx"
    build_ivf_index(emb, out, nlist=16, train_size=2048)
    idx = IvfIndex(spark, out)
    res = idx.search(qvec, k=10, nprobe=idx.meta.nlist)
    return res.select("vec_id", F.round("cosine", 4).alias("cosine"))


def q_ivf2_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level IVF lifecycle (clustered coarse quantizer — FAISS's
    prescribed shape past ~10^5 lists, the reference's own scale plan
    ARCHITECTURE.md:826-836): flat-identical fine quantizer + grouped
    centroid blocks so a query node holds only ngroups centroids
    resident and fetches probed groups' blocks on demand. Full probe
    (nprobe_groups = ngroups, nprobe = nlist) is provably brute force —
    same oracle as cosine_topk; pruned two-level probing (group pruning
    + list pruning, lazy bounded residency) is plan-asserted in
    tests/test_ivf_index.py."""
    from sparkgrep.operators.ivf_index import Ivf2Index, build_ivf2_index

    emb = _emb(spark, sf_dir)
    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    out = tempfile.mkdtemp(prefix="sparkgrep_ivf2_") + "/idx"
    build_ivf2_index(emb, out, nlist=16, ngroups=4, train_size=2048)
    idx = Ivf2Index(spark, out)
    res = idx.search(
        qvec, k=10, nprobe_groups=idx.meta.ngroups, nprobe=idx.meta.nlist
    )
    return res.select("vec_id", F.round("cosine", 4).alias("cosine"))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.textstats import token_counts

    tc = token_counts(_docs(spark, sf_dir))
    return tc.select(
        "doc_id",
        F.col("n_ws").cast("long").alias("n_ws"),
        F.col("n_bpe").cast("long").alias("n_bpe"),
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.textstats import quality_scores

    return quality_scores(_docs(spark, sf_dir)).select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("stop_ratio", 6).alias("stop_ratio"),
        F.round("mean_tok_len", 6).alias("mean_tok_len"),
        "score",
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.textstats import lang_id

    return lang_id(_docs(spark, sf_dir))


def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkgrep.operators.textstats import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir), k=3, w=4)


# -- generic relational operators over the TPC-H-ish tables (SURVEY §2.1-2.8)


def q_events_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4-style conditional aggregation in one pass."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: point lookup via broadcast left_semi join (the reference's
    IN-list lookup, message_manager.py:189-209; semi-join is the
    large-N form per SURVEY S3/P3)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ids = spark.createDataFrame([(i,) for i in [1, 5, 11, 99, 123]], "event_id long")
    return ev.join(F.broadcast(ids), "event_id", "left_semi").select(
        "event_id", "user_id", "event_type"
    )


def q_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/O2: full scan ordered by time desc, top-15."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(15)
        .select("event_id", "user_id", "event_type")
    )


def q_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: last-write-wins upsert semantics via row_number window."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_id", "event_type")
    )


def q_percentile_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 + F6: sigmoid(clip(value)) then exact 85th/15th percentiles
    (reference fixed_threshold_partitioner.py:50-86)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sig = ev.select(
        F.expr(
            "1.0 / (1.0 + exp(-greatest(-500.0, least(500.0, value / 100.0))))"
        ).alias("s")
    )
    return sig.agg(
        F.round(F.expr("percentile(s, 0.85)"), 6).alias("p85"),
        F.round(F.expr("percentile(s, 0.15)"), 6).alias("p15"),
    )


def q_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: slug generation chain (reference category_manager.py:347-362)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    slug = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("p_name")), "[ _]+", "-"),
            "[^a-z0-9-]",
            "",
        ),
        "-+",
        "-",
    )
    return part.select(F.col("p_partkey").alias("partkey"), slug.alias("slug"))


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3/A1: dedup + count."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select("user_id").distinct().orderBy("user_id")


def q_validate_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: required-field validation — rows failing the contract are
    routed to a rejects relation (reference ingestion.py:107-112)."""
    docs = _docs(spark, sf_dir)
    from sparkgrep.functions.tokenizer import simple_tokens_col

    return docs.filter(
        F.col("lang").isNull()
        | F.col("text").isNull()
        | (F.size(simple_tokens_col(F.col("text"))) < 5)
    ).select("doc_id")


def q_non_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/P6: complement via left_anti join (reference
    classification_service.py:122-131 not-in-candidates default)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    buyers = ev.filter("event_type = 'purchase'").select("user_id").distinct()
    return (
        ev.select("user_id")
        .distinct()
        .join(buyers, "user_id", "left_anti")
        .orderBy("user_id")
    )


def q_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: base64 decode path (reference process_email_body.py:15-32).
    Encode-then-decode the doc text; return digests of both sides."""
    docs = _docs(spark, sf_dir)
    enc = F.base64(F.col("text").cast("binary"))
    dec = F.unbase64(enc).cast("string")
    # Spark MIME-chunks base64 at 76 chars with \r\n; canonicalize before
    # hashing so the digest is encoder-neutral
    return docs.select(
        "doc_id",
        F.md5(F.regexp_replace(enc, "[\\r\\n]", "")).alias("b64_md5"),
        (dec == F.col("text")).alias("roundtrip_ok"),
    )


def q_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: word-boundary truncation (reference utils/utils.py:6-27):
    cut at max_chars=80; if a space exists past 0.8*max, back off to it."""
    docs = _docs(spark, sf_dir)
    max_chars, thresh = 80, 64
    trunc = F.substring("text", 1, max_chars)
    last_space = F.length(trunc) - F.instr(F.reverse(trunc), " ") + 1
    cut = F.when(F.length("text") <= max_chars, F.col("text")).otherwise(
        F.when(
            (F.instr(F.reverse(trunc), " ") > 0) & (last_space > thresh),
            F.concat(F.substring(trunc, 1, (last_space - 1).cast("int")), F.lit("…")),
        ).otherwise(F.concat(trunc, F.lit("…")))
    )
    return docs.select("doc_id", cut.alias("preview"))


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: JSON field extraction (reference JSON-encodes arrays into
    TEXT, message_manager.py:171; engine uses native JSON functions)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def q_html_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: HTML→text cleaning (reference process_email_body.py:35-98).
    Wrap each doc in deterministic HTML (paragraphs, a script block, a
    link, a list item), clean it with the engine's HTMLParser UDF; the
    oracle reconstructs the expected text relationally (semantics beyond
    this shape are pinned by tests/test_fts5_parity.py against SQLite
    FTS5 with cleaning on, and unit tests)."""
    from sparkgrep.functions.html import html_to_text_col

    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit('<script>var x = 1;</script><p>'), F.col("text"),
        F.lit('</p><ul><li>item</li></ul><a href="http://example.com">link</a>'),
    )
    return docs.select("doc_id", html_to_text_col(html).alias("clean"))


def q_compact_repr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8: compact text representation via concat/format
    (reference utils/utils.py:62-96)."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.format_string(
            "[%s] %s: %s", F.col("lang"), F.col("source"), F.substring("text", 1, 40)
        ).alias("repr"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing (Arrow-batched binary feature extraction):
    media derived deterministically from documents (payload = text
    bytes); the stub decode kernel's sha256-derived first feature is
    engine-neutral, so DuckDB reproduces it bit-for-bit."""
    from sparkgrep.operators.multimodal import extract_features, media_from_documents

    media = media_from_documents(_docs(spark, sf_dir))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
    )


def q_segment_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: per-segment lineage of a checkpointed resumable build — fully
    oracle-checked (incl. the xxhash64-based content hash; the oracle
    implements XXH64 in pure SQL). wall_time_sec is the one
    non-deterministic column and is excluded."""
    from sparkgrep.plans.manifest import build_index_checkpointed, segment_metrics

    out = tempfile.mkdtemp(prefix="sparkgrep_seg_") + "/idx"
    build_index_checkpointed(_corpus(spark, sf_dir), out, n_segments=4, n_buckets=8)
    return segment_metrics(spark, out).select(
        "segment_id", "n_docs", "n_tokens", "n_postings", "content_hash"
    )


def q_bm25_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max pruned serving (rows-only check vs its own oracle —
    values must equal the exact path, which IS oracle-checked; also
    pinned by tests/test_wand.py)."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.operators.wand import search_pruned

    out = tempfile.mkdtemp(prefix="sparkgrep_wand_") + "/idx"
    build_index(
        _corpus(spark, sf_dir), out, analyzer="simple", n_buckets=8,
        idf_variant="lucene",
    )
    res = search_pruned(InvertedIndex(spark, out), FLAGSHIP_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


# the slice deleted / updated by the tombstone contract entries (below)
# and excluded / rewritten by their DuckDB oracles
_DEL_PRED = "doc_id % 7 = 3"


def q_bm25_pruned_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxScore pruning over a LAYERED index (delta append + tombstone
    delete, no compaction): each layer's sidecar ub is rescaled into a
    global-sound bound (query.py _fold_sidecar_rows), so pruned serving
    stays available between compactions. The oracle recomputes BM25 from
    scratch over the surviving corpus — the pruned path must match it
    exactly through the layered decode (driver-side global idf,
    tombstone masking, block skipping)."""
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.operators.wand import search_pruned
    from sparkgrep.plans.manifest import append_batch_delta, delete_batch_delta

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_wandl_") + "/idx"
    append_batch_delta(
        corpus.filter("doc_id % 3 != 1"), out, "b0",
        analyzer="simple", n_buckets=8, idf_variant="lucene",
    )
    append_batch_delta(corpus.filter("doc_id % 3 = 1"), out, "b1")
    delete_batch_delta(corpus.filter(_DEL_PRED), out, "b2")
    res = search_pruned(InvertedIndex(spark, out), FLAGSHIP_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


_MC_FIELDS = ["meta", "body"]


def _mc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-field corpus derived deterministically from the documents
    table (the reference's FTS5 shape is multi-column —
    subject/body_text/sender, message_manager.py:101-110): a short
    metadata field (lang + repo) and the content body. The DuckDB oracle
    derives the identical fields from the raw parquet."""
    c = _corpus(spark, sf_dir)
    return c.select(
        "doc_id",
        F.concat_ws(" ", "lang", "repo").alias("meta"),
        F.col("content").alias("body"),
    )


def _mc_index(spark: SparkSession, sf_dir: str):
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_mc_") + "/idx"
    build_index(
        _mc_corpus(spark, sf_dir), out, analyzer="simple",
        fields=_MC_FIELDS, n_buckets=8,
    )
    return InvertedIndex(spark, out)


# shared multi-field tokenize prelude: per-field token lists + per-field
# tf tables + the concatenated (full-colset) tf table; dl is the
# UNWEIGHTED row token total (FTS5's document length — pinned)
_MC_CTES = """
docs2 AS (
  SELECT doc_id,
         concat_ws(' ', lang, source) AS meta,
         coalesce(text, '') AS body
  FROM documents
),
mtok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(meta), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM docs2
),
btok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(body), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM docs2
),
mtf AS (
  SELECT doc_id, u AS term, count(*) AS tf
  FROM mtok, unnest(toks) AS v(u) GROUP BY doc_id, u
),
btf AS (
  SELECT doc_id, u AS term, count(*) AS tf
  FROM btok, unnest(toks) AS v(u) GROUP BY doc_id, u
),
dl AS (
  SELECT m.doc_id, CAST(len(m.toks) + len(b.toks) AS BIGINT) AS dl
  FROM mtok m JOIN btok b USING (doc_id)
),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl)
"""

# one atom's BM25 contribution, okapi idf, engine float-op order
# (score.py bm25_contrib_col): idf * (tf*2.2) / (tf + (1.2*(0.25 + 0.75*dl/avgdl)))
def _mc_contrib(tf_expr: str, df_sub: str, variant: str = "okapi") -> str:
    x = f"(stats.n - {df_sub} + 0.5) / ({df_sub} + 0.5)"
    idf = f"ln(1.0 + {x})" if variant == "lucene" else f"ln({x})"
    return (
        f"{idf}"
        f" * ({tf_expr} * 2.2)"
        f" / ({tf_expr} + (1.2 * (0.25 + ((0.75 * m.dl) / stats.avgdl))))"
    )


# one weighted-OR atom's per-doc tf CTE: tfw = (w_meta·tf_meta) +
# (w_body·tf_body) in fixed field order (the engine's _wsum_mc fold);
# presence (the DISTINCT union) is weight-independent — FTS5 parity
def _mc_watom(name: str, term: str, wm: float, wb: float) -> str:
    return f"""{name} AS (
  SELECT c.doc_id,
         (({wm} * coalesce(CAST(mm.tf AS DOUBLE), 0.0))
          + ({wb} * coalesce(CAST(bb.tf AS DOUBLE), 0.0))) AS tfw
  FROM (SELECT DISTINCT doc_id FROM (
          SELECT doc_id FROM mtf WHERE term = '{term}'
          UNION ALL SELECT doc_id FROM btf WHERE term = '{term}')) c
  LEFT JOIN (SELECT doc_id, tf FROM mtf WHERE term = '{term}') mm USING (doc_id)
  LEFT JOIN (SELECT doc_id, tf FROM btf WHERE term = '{term}') bb USING (doc_id)
)"""


# `meta:en scan filter`: the filtered atom's tf and df come from the
# meta field only; plain atoms use the full (meta+body) totals. uid fold
# order: f0|t:en < t:filter < t:scan.
_MC_COLS_SQL = f"""
WITH {_MC_CTES},
a_en AS (
  SELECT doc_id, (1.0 * CAST(tf AS DOUBLE)) AS tfw FROM mtf WHERE term = 'en'
),
a_scan AS (
  SELECT c.doc_id,
         ((1.0 * coalesce(CAST(mm.tf AS DOUBLE), 0.0))
          + (1.0 * coalesce(CAST(bb.tf AS DOUBLE), 0.0))) AS tfw
  FROM (SELECT DISTINCT doc_id FROM (
          SELECT doc_id FROM mtf WHERE term = 'scan'
          UNION ALL SELECT doc_id FROM btf WHERE term = 'scan')) c
  LEFT JOIN (SELECT doc_id, tf FROM mtf WHERE term = 'scan') mm USING (doc_id)
  LEFT JOIN (SELECT doc_id, tf FROM btf WHERE term = 'scan') bb USING (doc_id)
),
a_filter AS (
  SELECT c.doc_id,
         ((1.0 * coalesce(CAST(mm.tf AS DOUBLE), 0.0))
          + (1.0 * coalesce(CAST(bb.tf AS DOUBLE), 0.0))) AS tfw
  FROM (SELECT DISTINCT doc_id FROM (
          SELECT doc_id FROM mtf WHERE term = 'filter'
          UNION ALL SELECT doc_id FROM btf WHERE term = 'filter')) c
  LEFT JOIN (SELECT doc_id, tf FROM mtf WHERE term = 'filter') mm USING (doc_id)
  LEFT JOIN (SELECT doc_id, tf FROM btf WHERE term = 'filter') bb USING (doc_id)
),
matched AS (
  SELECT m.doc_id, m.dl, e.tfw AS tf_en, f.tfw AS tf_filter, s.tfw AS tf_scan
  FROM dl m
  JOIN a_en e USING (doc_id)
  JOIN a_filter f USING (doc_id)
  JOIN a_scan s USING (doc_id)
),
scored AS (
  SELECT m.doc_id,
         ({_mc_contrib('m.tf_en', '(SELECT count(*) FROM a_en)')}
          + {_mc_contrib('m.tf_filter', '(SELECT count(*) FROM a_filter)')}
          + {_mc_contrib('m.tf_scan', '(SELECT count(*) FROM a_scan)')}) AS score
  FROM matched m, stats
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
"""

# `en OR scan` with bm25 weights (3.0, 1.0): tfw = (3·tf_meta)+(1·tf_body);
# match-any, per-disjunct gating = presence. uid order: t:en < t:scan.
_MC_WEIGHTED_SQL = f"""
WITH {_MC_CTES},
a_en AS (
  SELECT c.doc_id,
         ((3.0 * coalesce(CAST(mm.tf AS DOUBLE), 0.0))
          + (1.0 * coalesce(CAST(bb.tf AS DOUBLE), 0.0))) AS tfw
  FROM (SELECT DISTINCT doc_id FROM (
          SELECT doc_id FROM mtf WHERE term = 'en'
          UNION ALL SELECT doc_id FROM btf WHERE term = 'en')) c
  LEFT JOIN (SELECT doc_id, tf FROM mtf WHERE term = 'en') mm USING (doc_id)
  LEFT JOIN (SELECT doc_id, tf FROM btf WHERE term = 'en') bb USING (doc_id)
),
a_scan AS (
  SELECT c.doc_id,
         ((3.0 * coalesce(CAST(mm.tf AS DOUBLE), 0.0))
          + (1.0 * coalesce(CAST(bb.tf AS DOUBLE), 0.0))) AS tfw
  FROM (SELECT DISTINCT doc_id FROM (
          SELECT doc_id FROM mtf WHERE term = 'scan'
          UNION ALL SELECT doc_id FROM btf WHERE term = 'scan')) c
  LEFT JOIN (SELECT doc_id, tf FROM mtf WHERE term = 'scan') mm USING (doc_id)
  LEFT JOIN (SELECT doc_id, tf FROM btf WHERE term = 'scan') bb USING (doc_id)
),
matched AS (
  SELECT m.doc_id, m.dl, e.tfw AS tf_en, s.tfw AS tf_scan
  FROM dl m
  LEFT JOIN a_en e USING (doc_id)
  LEFT JOIN a_scan s USING (doc_id)
  WHERE e.tfw IS NOT NULL OR s.tfw IS NOT NULL
),
scored AS (
  SELECT m.doc_id,
         ((CASE WHEN m.tf_en IS NOT NULL THEN
             {_mc_contrib('m.tf_en', '(SELECT count(*) FROM a_en)')}
           ELSE 0.0 END)
          + (CASE WHEN m.tf_scan IS NOT NULL THEN
             {_mc_contrib('m.tf_scan', '(SELECT count(*) FROM a_scan)')}
           ELSE 0.0 END)) AS score
  FROM matched m, stats
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
"""


# `dup src18 scan` with bm25 weights (3.0, 1.0), LUCENE idf (MaxScore
# needs non-negative contributions): the selective shape the weighted
# pruning tier pays on — 'dup' rare in body, 'src18' rare in meta (its
# contributions ride the 3.0 meta weight), 'scan' hot. Match-any,
# per-disjunct gating = presence; tfw = (3·tf_meta)+(1·tf_body).
_MC_PRUNED_WEIGHTED_SQL = f"""
WITH {_MC_CTES},
{_mc_watom('a_dup', 'dup', 3.0, 1.0)},
{_mc_watom('a_src18', 'src18', 3.0, 1.0)},
{_mc_watom('a_scan', 'scan', 3.0, 1.0)},
matched AS (
  SELECT m.doc_id, m.dl, d.tfw AS tf_dup, r.tfw AS tf_src18, s.tfw AS tf_scan
  FROM dl m
  LEFT JOIN a_dup d USING (doc_id)
  LEFT JOIN a_src18 r USING (doc_id)
  LEFT JOIN a_scan s USING (doc_id)
  WHERE d.tfw IS NOT NULL OR r.tfw IS NOT NULL OR s.tfw IS NOT NULL
),
scored AS (
  SELECT m.doc_id,
         ((((CASE WHEN m.tf_dup IS NOT NULL THEN
             {_mc_contrib('m.tf_dup', '(SELECT count(*) FROM a_dup)', 'lucene')}
           ELSE 0.0 END))
          + (CASE WHEN m.tf_scan IS NOT NULL THEN
             {_mc_contrib('m.tf_scan', '(SELECT count(*) FROM a_scan)', 'lucene')}
           ELSE 0.0 END))
          + (CASE WHEN m.tf_src18 IS NOT NULL THEN
             {_mc_contrib('m.tf_src18', '(SELECT count(*) FROM a_src18)', 'lucene')}
           ELSE 0.0 END)) AS score
  FROM matched m, stats
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
"""


# `scan filter` on a detail=none multi-field index: the index stores
# ONLY the total-tf streams (single-field layout — FTS5's detail=none
# storage level, colset queries raise), so each atom's tf/df are the
# full-colset totals and scores equal the detail=full defaults.
_MC_NONE_SQL = f"""
WITH {_MC_CTES},
a_scan AS (
  SELECT c.doc_id,
         ((1.0 * coalesce(CAST(mm.tf AS DOUBLE), 0.0))
          + (1.0 * coalesce(CAST(bb.tf AS DOUBLE), 0.0))) AS tfw
  FROM (SELECT DISTINCT doc_id FROM (
          SELECT doc_id FROM mtf WHERE term = 'scan'
          UNION ALL SELECT doc_id FROM btf WHERE term = 'scan')) c
  LEFT JOIN (SELECT doc_id, tf FROM mtf WHERE term = 'scan') mm USING (doc_id)
  LEFT JOIN (SELECT doc_id, tf FROM btf WHERE term = 'scan') bb USING (doc_id)
),
a_filter AS (
  SELECT c.doc_id,
         ((1.0 * coalesce(CAST(mm.tf AS DOUBLE), 0.0))
          + (1.0 * coalesce(CAST(bb.tf AS DOUBLE), 0.0))) AS tfw
  FROM (SELECT DISTINCT doc_id FROM (
          SELECT doc_id FROM mtf WHERE term = 'filter'
          UNION ALL SELECT doc_id FROM btf WHERE term = 'filter')) c
  LEFT JOIN (SELECT doc_id, tf FROM mtf WHERE term = 'filter') mm USING (doc_id)
  LEFT JOIN (SELECT doc_id, tf FROM btf WHERE term = 'filter') bb USING (doc_id)
),
matched AS (
  SELECT m.doc_id, m.dl, f.tfw AS tf_filter, s.tfw AS tf_scan
  FROM dl m
  JOIN a_filter f USING (doc_id)
  JOIN a_scan s USING (doc_id)
),
scored AS (
  SELECT m.doc_id,
         ({_mc_contrib('m.tf_filter', '(SELECT count(*) FROM a_filter)')}
          + {_mc_contrib('m.tf_scan', '(SELECT count(*) FROM a_scan)')}) AS score
  FROM matched m, stats
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_bm25_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 column filter on a multi-field index: ``meta:en scan filter``
    — the filtered atom matches/counts tf and df ONLY within the `meta`
    field (colset-restricted df, pinned against SQLite in
    tests/test_multicol_parity.py), the plain atoms score over the
    per-doc TOTAL tf; dl is the unweighted row total. The oracle
    recomputes all of it from the raw parquet."""
    idx = _mc_index(spark, sf_dir)
    res = idx.search_expr("meta:en scan filter", k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_cols_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column BM25 weights (FTS5 ``bm25(t, 3.0, 1.0)``) on an OR
    query: each atom's tf is the fixed-order weighted sum
    3.0·tf_meta + 1.0·tf_body; matching stays weight-independent."""
    idx = _mc_index(spark, sf_dir)
    res = idx.search_expr("en OR scan", k=10, weights=[3.0, 1.0])
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_rank_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5's 'rank' configuration option (sqlite.org/fts5.html — the
    persisted default rank function; parity in tests/test_rank_config
    .py): ``set_rank(idx, 'bm25(3.0, 1.0)')`` stores per-field weights
    that apply when a query passes none. Same weighted-OR query and
    oracle as ``bm25_cols_weighted`` — the configured default must score
    exactly like the explicit weights."""
    from sparkgrep.plans.manifest import set_rank

    idx = _mc_index(spark, sf_dir)
    set_rank(idx.index_dir, "bm25(3.0, 1.0)")
    idx = type(idx)(spark, idx.index_dir)  # reload meta with the config
    res = idx.search_expr("en OR scan", k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_serve_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 serving-tier closure: PLAIN (bag-of-words) search on a
    rank-configured multi-field index is served RESIDENT — the
    distributed OR mode's one-disjunct-per-term DNF mirrored through the
    per-field numpy fold, zero Spark jobs once warm (asserted in
    tests/test_rank_config.py). 'en scan' in OR mode has the same match
    set and per-atom scoring as bm25_rank_config's 'en OR scan', so the
    same oracle must hash-match."""
    from sparkgrep.operators.serve import LocalServer
    from sparkgrep.plans.manifest import set_rank

    idx = _mc_index(spark, sf_dir)
    set_rank(idx.index_dir, "bm25(3.0, 1.0)")
    idx = type(idx)(spark, idx.index_dir)  # reload meta with the config
    pdf = LocalServer(idx).search("en scan", k=10)
    res = spark.createDataFrame(pdf, "rank int, doc_id long, score double")
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_pruned_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED MaxScore pruning (round-5): per-column bm25 weights
    (3.0, 1.0) served through the pruned two-pass path — the per-field
    sidecar bounds (ub_cols/maxtf_cols) let the planner bound
    Σ_c w_c·tf_c, so the reference's weighted FTS5 shape keeps the
    pruning tier. Selective query ('dup' rare in body, 'src18' rare in
    meta, 'scan' hot) so the planner ENGAGES (asserted in
    tests/test_wand_weighted.py; bitwise identity vs the exact weighted
    path pinned there); the oracle recomputes the weighted lucene-idf
    BM25 from the raw parquet."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.operators.wand import search_pruned

    out = tempfile.mkdtemp(prefix="sparkgrep_wandw_") + "/idx"
    build_index(
        _mc_corpus(spark, sf_dir), out, analyzer="simple",
        fields=_MC_FIELDS, n_buckets=8, idf_variant="lucene",
    )
    res = search_pruned(
        InvertedIndex(spark, out), "dup src18 scan", k=10, weights=[3.0, 1.0]
    )
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_detail_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 ``detail=column`` storage level (pinned by probe + SQLite
    parity in tests/test_detail.py): per-field tf streams are kept but
    positions are dropped — column filters and per-column BM25 weights
    score identically to detail=full while phrase-family queries raise
    like SQLite. Same weighted-OR query and oracle as
    ``bm25_cols_weighted``: the storage level must change nothing."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_dc_") + "/idx"
    build_index(
        _mc_corpus(spark, sf_dir), out, analyzer="simple",
        fields=_MC_FIELDS, n_buckets=8, detail="column",
    )
    res = InvertedIndex(spark, out).search_expr(
        "en OR scan", k=10, weights=[3.0, 1.0]
    )
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_detail_none(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 ``detail=none`` storage level (pinned by probe + SQLite
    parity in tests/test_detail.py): a multi-field index that stores
    ONLY the total-tf streams in the single-field layout — phrase/NEAR/
    '^' and column-filter queries raise exactly like SQLite, plain
    queries score identically to detail=full. The oracle recomputes the
    full-colset totals from the raw parquet."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_dn_") + "/idx"
    build_index(
        _mc_corpus(spark, sf_dir), out, analyzer="simple",
        fields=_MC_FIELDS, n_buckets=8, detail="none",
    )
    res = InvertedIndex(spark, out).search_expr("scan filter", k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_vocab_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fts5vocab 'col' table over the multi-field index (SQLite
    fts5vocab module — per-(term, column) document and instance counts,
    parity-pinned against real SQLite in tests/test_vocab.py). Computed
    FROM the index's per-field tf streams, so the oracle's from-scratch
    per-field recount checks the multi-column posting payloads
    end-to-end."""
    from sparkgrep.operators.vocab import vocab

    idx = _mc_index(spark, sf_dir)
    return vocab(idx, "col")


def q_vocab_instance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fts5vocab 'instance' table (term, doc, col, offset) restricted to
    three terms: every stored token POSITION in the postings payload is
    value-checked against a from-scratch SQL tokenization — the direct
    oracle for the position streams that phrase/NEAR/anchor queries
    consume."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.operators.vocab import vocab

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_vocab_") + "/idx"
    build_index(corpus, out, analyzer="simple", store_positions=True, n_buckets=8)
    inst = vocab(InvertedIndex(spark, out), "instance")
    return inst.filter(F.col("term").isin("hash", "join", "scan")).select(
        "term", "doc_id", "col", "offset"
    )


def q_vocab_row_lsm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fts5vocab 'row' table over a LAYERED index (two delta appends +
    a tombstone delete, no compaction): per-term df/cf summed across
    layers with cut-aware tombstone masking must equal a from-scratch
    recount over the surviving corpus."""
    from sparkgrep.operators.vocab import vocab
    from sparkgrep.plans.manifest import append_batch_delta, delete_batch_delta

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_vocabl_") + "/idx"
    append_batch_delta(
        corpus.filter("doc_id % 3 != 1"), out, "b0", analyzer="simple", n_buckets=8
    )
    append_batch_delta(corpus.filter("doc_id % 3 = 1"), out, "b1")
    delete_batch_delta(corpus.filter(_DEL_PRED), out, "b2")
    from sparkgrep.operators.query import InvertedIndex

    return vocab(InvertedIndex(spark, out), "row")


def _aux_index(spark: SparkSession, sf_dir: str):
    """Positional simple-analyzer index + its corpus, shared by the
    highlight/snippet aux-function entries."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_aux_") + "/idx"
    build_index(corpus, out, analyzer="simple", store_positions=True, n_buckets=8)
    return InvertedIndex(spark, out), corpus


def q_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 ``highlight()`` aux function (semantics pinned against real
    SQLite in tests/test_snippet_parity.py): top-10 docs for ``hash``
    with every instance wrapped. The oracle recomputes the ranking AND
    the wrapped text from the raw parquet."""
    from sparkgrep.operators.snippet import search_highlight

    idx, corpus = _aux_index(spark, sf_dir)
    res = search_highlight(
        idx, corpus, "hash", k=10, mark_start="[", mark_end="]"
    )
    return res.select(
        "rank", "doc_id", F.round("score", 4).alias("score"), "highlight"
    )


def q_snippet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 ``snippet()`` aux function: best 8-token window per FTS5's
    candidate algorithm (instance windows re-centered + clamped, the
    token-0 sentence candidate with its +120 bonus, 1000/1 aSeen
    scoring — all pinned against SQLite). The oracle reimplements the
    whole window algorithm in DuckDB SQL over the raw parquet."""
    from sparkgrep.operators.snippet import search_snippet

    idx, corpus = _aux_index(spark, sf_dir)
    res = search_snippet(
        idx, corpus, "hash", k=10, n_tokens=8,
        mark_start="[", mark_end="]", ellipsis="…",
    )
    return res.select(
        "rank", "doc_id", F.round("score", 4).alias("score"), "snippet"
    )


def q_delta_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(batch) tombstone delete (the reference's AFTER DELETE trigger,
    message_manager.py:113-137, replayed log-structured): build over the
    full corpus, delete the ``doc_id % 7 = 3`` slice by content batch
    (exactly the information the trigger's ``old.*`` carries), query —
    the oracle recomputes BM25 from scratch over the surviving docs, so
    masked postings, summed negative sidecar dfs, and the
    integer-corrected N/avgdl must all be exact."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.plans.manifest import delete_batch_delta

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_del_") + "/idx"
    build_index(corpus, out, analyzer="simple", n_buckets=8)
    delete_batch_delta(corpus.filter(_DEL_PRED), out, "d1")
    res = InvertedIndex(spark, out).search(FLAGSHIP_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_delta_purged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical physical delete (plans/purge.py — the FTS5
    'secure-delete' analogue; the installed SQLite 3.40 refuses the
    option itself, probed): same setup as ``delta_delete``, then
    ``purge_deleted`` rewrites ONLY the (term, shard) files holding the
    tombstoned ids (every other postings file stays byte-identical —
    tests/test_purge.py) and turns the reader's mask off. The oracle is
    delta_delete's from-scratch survivors BM25 — the physical rewrite
    must change nothing about the results."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.plans.manifest import delete_batch_delta
    from sparkgrep.plans.purge import purge_deleted

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_purge_") + "/idx"
    build_index(corpus, out, analyzer="simple", n_buckets=8)
    delete_batch_delta(corpus.filter(_DEL_PRED), out, "d1")
    purge_deleted(spark, out)
    idx = InvertedIndex(spark, out)
    assert idx._tomb_spec is None  # mask off: ids are physically gone
    res = idx.search(FLAGSHIP_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_delta_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE trigger semantics (delete old row + insert new on the SAME
    rowid): tombstone the old content, re-append the modified content as
    a delta layer on the same doc_ids — the tombstone masks only layers
    older than itself, so the re-inserted docs serve their new text. The
    oracle recomputes BM25 over the post-update corpus."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.plans.manifest import append_batch_delta, delete_batch_delta

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_upd_") + "/idx"
    build_index(corpus, out, analyzer="simple", n_buckets=8)
    old = corpus.filter(_DEL_PRED)
    new = old.withColumn(
        "content", F.concat(F.col("content"), F.lit(" window table"))
    )
    delete_batch_delta(old, out, "u1")
    append_batch_delta(new, out, "u1-new")
    res = InvertedIndex(spark, out).search(FLAGSHIP_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_delta_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental delta-layer merge (FTS5's 'merge'/'automerge'
    analogue, sqlite.org/fts5.html#the_merge_command): base over a third
    of the corpus, two delta appends for the rest, then
    ``merge_delta_layers`` folds the deltas into ONE layer WITHOUT
    touching the base (O(sum of deltas), not O(corpus) like
    compaction). Queries must be bit-identical to a from-scratch build
    over the whole corpus — the oracle is exactly the flagship BM25."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.plans.manifest import append_batch_delta, merge_delta_layers

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_dm_") + "/idx"
    build_index(corpus.filter("doc_id % 3 = 0"), out, analyzer="simple", n_buckets=8)
    append_batch_delta(corpus.filter("doc_id % 3 = 1"), out, "m1")
    append_batch_delta(corpus.filter("doc_id % 3 = 2"), out, "m2")
    meta = merge_delta_layers(spark, out)
    assert len(meta.layers) == 1  # two deltas folded into one layer
    res = InvertedIndex(spark, out).search(FLAGSHIP_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_delete_all_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 special commands 'delete-all' + 'rebuild' (sqlite.org/
    fts5.html#special_insert_commands; probed: delete-all is legal
    exactly on external-content tables — this engine's shape — and
    rebuild re-tokenizes the content under the table's own config):
    build, empty the index in place, re-index the corpus, query — the
    result must equal the flagship BM25 over the corpus exactly."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.plans.manifest import delete_all, rebuild

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_dar_") + "/idx"
    build_index(corpus, out, analyzer="simple", n_buckets=8)
    meta = delete_all(spark, out)
    assert meta.n_docs == 0
    rebuild(corpus, out)
    res = InvertedIndex(spark, out).search(FLAGSHIP_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_u61_separators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 unicode61 tokenizer OPTIONS (sqlite.org/fts5.html
    #unicode61_tokenizer), parity-pinned in tests/test_u61_options.py:
    the analyzer spec "unicode61 separators 'q'" — FTS5's default
    (unstemmed) tokenizer with 'q' declared a separator — threads
    through indexing and scoring. On the pure-[a-z0-9 ] corpus the
    oracle mirrors it exactly: split on space OR 'q' (so 'query'
    tokenizes to 'uery'), folds identity."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_u61_") + "/idx"
    build_index(corpus, out, analyzer="unicode61 separators 'q'", n_buckets=8)
    res = InvertedIndex(spark, out).search(FLAGSHIP_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5's ``integrity-check`` special command against external
    content (sqlite.org/fts5.html#the_integrity_check_command; the
    reference's FTS5 table ships the same command): build a positional
    prefix-indexed index over the corpus, recompute the expected
    relation through the independent declarative path, and report the
    audit summary — zero discrepancies, with the doc/term universe
    sizes oracle-checked against DuckDB's own tokenization."""
    from sparkgrep.functions.tokenizer import tokens_col
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.integrity import integrity_check

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_ic_") + "/idx"
    build_index(
        corpus, out, analyzer="simple", n_buckets=8,
        store_positions=True, prefix=[2],
    )
    n_bad = integrity_check(corpus, out, check_positions=True).count()
    ex = corpus.select(
        "doc_id",
        F.explode_outer(tokens_col(F.col("content"), "simple")).alias("term"),
    )
    return ex.agg(
        F.countDistinct("doc_id").cast("long").alias("docs_checked"),
        F.countDistinct("term").cast("long").alias("terms_checked"),
    ).withColumn("mismatches", F.lit(n_bad).cast("long"))


def q_trigram_cs_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 trigram ``case_sensitive 1`` option (fts5 docs §4.3.3;
    parity-pinned in tests/test_trigram_cs.py): raw 3-codepoint windows,
    case-sensitive MATCH. The corpus text is pure lowercase [a-z0-9 ]
    (TESTDATA invariant), so the case-sensitive index must reproduce the
    default trigram scoring bit-for-bit — same substring-occurrence
    oracle — while exercising the option through build + query + serve
    paths."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_tcs_") + "/idx"
    build_index(
        _corpus(spark, sf_dir), out, analyzer="trigram case_sensitive 1",
        n_buckets=8, store_positions=True,
    )
    res = InvertedIndex(spark, out).search_expr(TRIGRAM_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_trigram_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQLite fts5 trigram tokenizer family (public fts5 docs §4.3.3,
    parity-pinned in tests/test_trigram_parity.py): every bareword/quoted
    string is the PHRASE of its 3-codepoint windows, so a match is a
    substring occurrence. BM25 over the trigram index; the oracle computes
    the identical score from raw overlap-counted substring occurrences
    (1:1 fold — window i covers codepoints [i, i+3))."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_tri_") + "/idx"
    build_index(
        _corpus(spark, sf_dir), out, analyzer="trigram",
        n_buckets=8, store_positions=True,
    )
    res = InvertedIndex(spark, out).search_expr(TRIGRAM_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_trigram_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE acceleration from the trigram index (SQLite's stated purpose
    for the trigram tokenizer): pattern literal runs become trigram
    phrases -> candidate doc_ids from bucket-pruned posting decodes ->
    residual JVM-side LIKE makes it exact. Oracle: plain SQL LIKE."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.like import like_search
    from sparkgrep.operators.query import InvertedIndex

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_tril_") + "/idx"
    build_index(corpus, out, analyzer="trigram", n_buckets=8,
                store_positions=True)
    res = like_search(InvertedIndex(spark, out), corpus, LIKE_PATTERN)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"))


def q_bm25_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 phrase-with-prefix-tail unit: ``"hash jo"*`` is ONE atom
    whose instances are head-phrase positions with a stem-matching
    successor token (pinned vs SQLite in tests/test_phrase_prefix.py),
    OR-mixed with a plain term."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_pp_") + "/idx"
    build_index(_corpus(spark, sf_dir), out, analyzer="simple",
                n_buckets=8, store_positions=True)
    res = InvertedIndex(spark, out).search_expr(PP_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_bm25_star_internal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FTS5 phrase-INTERNAL prefix (``s* + scan``): one phrase atom
    whose slot 0 matches ANY index term starting with 's' (scan, slow,
    small, sort, spark, stream) followed by an exact 'scan' — pinned vs
    SQLite in tests/test_star_internal.py — OR-mixed with a plain
    term."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="sparkgrep_si_") + "/idx"
    build_index(_corpus(spark, sf_dir), out, analyzer="simple",
                n_buckets=8, store_positions=True)
    res = InvertedIndex(spark, out).search_expr(STAR_QUERY, k=10)
    return res.select("rank", "doc_id", F.round("score", 4).alias("score"))


def q_trigram_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOB acceleration from the trigram index (SQLite's trigram GLOB
    optimization): literal runs -> trigram-phrase candidates -> residual
    anchored (?s) regex. Oracle: the equivalent regex in plain SQL."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.like import glob_search
    from sparkgrep.operators.query import InvertedIndex

    corpus = _corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_trig_") + "/idx"
    build_index(corpus, out, analyzer="trigram", n_buckets=8,
                store_positions=True)
    res = glob_search(InvertedIndex(spark, out), corpus, GLOB_PATTERN)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_stats": q_corpus_stats,
    "doc_lengths": q_doc_lengths,
    "term_stats": q_term_stats,
    "top_terms": q_top_terms,
    "bm25_topk": q_bm25_topk,
    "bm25_indexed": q_bm25_indexed,
    "bm25_multi": q_bm25_multi,
    "bm25_serve_local": q_bm25_serve_local,
    "bm25_and": q_bm25_and,
    "bm25_phrase": q_bm25_phrase,
    "bm25_expr": q_bm25_expr,
    "bm25_phrase_and": q_bm25_phrase_and,
    "bm25_serve_expr": q_bm25_serve_expr,
    "bm25_not": q_bm25_not,
    "bm25_prefix": q_bm25_prefix,
    "bm25_prefix_indexed": q_bm25_prefix_indexed,
    "bm25_parens": q_bm25_parens,
    "bm25_near": q_bm25_near,
    "bm25_not_group": q_bm25_not_group,
    "bm25_caret": q_bm25_caret,
    "classify_cascade": q_classify_cascade,
    "classify_summary": q_classify_summary,
    "dedup_exact": q_dedup_exact,
    "minhash_lsh": q_minhash_lsh,
    "ngram_jaccard": q_ngram_jaccard,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "dedup_pipeline": q_dedup_pipeline,
    "cosine_topk": q_cosine_topk,
    "ann_indexed": q_ann_indexed,
    "ivf_indexed": q_ivf_indexed,
    "ivf2_indexed": q_ivf2_indexed,
    "token_counts": q_token_counts,
    "quality": q_quality,
    "lang_id": q_lang_id,
    "winnow": q_winnow,
    "events_summary": q_events_summary,
    "point_lookup": q_point_lookup,
    "recent_events": q_recent_events,
    "last_write_wins": q_last_write_wins,
    "percentile_sigmoid": q_percentile_sigmoid,
    "slugify": q_slugify,
    "distinct_users": q_distinct_users,
    "validate_rejects": q_validate_rejects,
    "non_purchasers": q_non_purchasers,
    "base64_roundtrip": q_base64_roundtrip,
    "truncate": q_truncate,
    "json_extract": q_json_extract,
    "html_clean": q_html_clean,
    "media_features": q_media_features,
    "compact_repr": q_compact_repr,
    "segment_metrics": q_segment_metrics,
    "bm25_pruned": q_bm25_pruned,
    "bm25_pruned_delta": q_bm25_pruned_delta,
    "bm25_cols": q_bm25_cols,
    "bm25_detail_none": q_bm25_detail_none,
    "bm25_detail_column": q_bm25_detail_column,
    "bm25_cols_weighted": q_bm25_cols_weighted,
    "bm25_pruned_weighted": q_bm25_pruned_weighted,
    "bm25_rank_config": q_bm25_rank_config,
    "bm25_serve_weighted": q_bm25_serve_weighted,
    "delta_delete": q_delta_delete,
    "delta_purged": q_delta_purged,
    "delta_update": q_delta_update,
    "delta_merged": q_delta_merged,
    "integrity_check": q_integrity_check,
    "bm25_u61_separators": q_bm25_u61_separators,
    "delete_all_rebuild": q_delete_all_rebuild,
    "vocab_col": q_vocab_col,
    "vocab_instance": q_vocab_instance,
    "vocab_row_lsm": q_vocab_row_lsm,
    "highlight": q_highlight,
    "snippet": q_snippet,
    "bm25_phrase_prefix": q_bm25_phrase_prefix,
    "bm25_star_internal": q_bm25_star_internal,
    "trigram_match": q_trigram_match,
    "trigram_cs_match": q_trigram_cs_match,
    "trigram_like": q_trigram_like,
    "trigram_glob": q_trigram_glob,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over sf0.001 and serve the
    flagship query through it, joined back to full rows (SURVEY §7.5)."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.operators.score import join_back
    from sparkgrep.sources.corpus import load_corpus

    sf_dir = "/root/testdata/sf0.001"
    corpus = load_corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sparkgrep_entry_") + "/idx"
    build_index(corpus, out, analyzer="simple", n_buckets=8)
    res = InvertedIndex(spark, out).search(FLAGSHIP_QUERY, k=10)
    return join_back(res, corpus).select(
        "rank", "doc_id", "score", "repo", "path", "lang", "content_sha256"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def _cascade_sql() -> tuple[str, str]:
    """(per-doc verdicts SQL, summary SQL) mirroring the 4-phase cascade:
    per-category raw BM25 top-50 → round(score, 3) rescore quantization
    (cross-engine float determinism for the discrete phase/verdict
    columns) → sigmoid+clip → quantile_cont 85/15 thresholds (exact
    linear interpolation, = numpy/Spark percentile) → phase partition →
    deterministic grey validation → FALSE defaults for non-candidates."""
    blocks = []
    for slug, text in CASCADE_CATEGORIES:
        terms = sorted(set(_tokenize(text)))
        tlist = ", ".join(f"('{t}')" for t in terms)
        blocks.append(f"""
  SELECT '{slug}' AS category, doc_id, score FROM (
    SELECT s.doc_id, s.score FROM (
      SELECT cb.doc_id, sum(cb.c ORDER BY cb.term) AS score FROM (
        SELECT tf.doc_id, tf.term,
               ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                 * (tf.tf * {BM25_K1 + 1.0})
                 / (tf.tf + ({BM25_K1} * ({1.0 - BM25_B} + (({BM25_B} * dl.dl) / stats.avgdl)))) AS c
        FROM tf
        JOIN (SELECT term, count(*) AS df FROM tf
              WHERE term IN (SELECT term FROM (VALUES {tlist}) q(term))
              GROUP BY term) dfq USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
      ) cb GROUP BY cb.doc_id
    ) s ORDER BY s.score DESC, s.doc_id ASC LIMIT 50
  )""")
    cand_union = "\n  UNION ALL\n".join(blocks)
    cat_values = ", ".join(f"('{slug}')" for slug, _ in CASCADE_CATEGORIES)
    core = f"""
WITH {_TOK_CTES},
cand AS (
{cand_union}
),
resc AS (SELECT category, doc_id, round(score, 3) AS score FROM cand),
probs AS (SELECT category, doc_id, score,
  1.0/(1.0 + exp(-greatest(-500.0, least(500.0, score)))) AS prob FROM resc),
thr AS (SELECT category, quantile_cont(prob, 0.85) AS hi,
               quantile_cont(prob, 0.15) AS lo FROM probs GROUP BY category),
parted AS (
  SELECT p.category, p.doc_id, p.score, p.prob,
         CASE WHEN p.prob >= t.hi THEN 'high_confidence'
              WHEN p.prob <= t.lo THEN 'low_confidence'
              ELSE 'grey_area' END AS phase
  FROM probs p JOIN thr t ON p.category = t.category),
verd AS (
  SELECT category, doc_id, phase, score, prob,
         CASE WHEN phase = 'high_confidence' THEN TRUE
              WHEN phase = 'low_confidence' THEN FALSE
              ELSE prob >= 0.5 END AS is_in
  FROM parted),
cats(category) AS (VALUES {cat_values}),
defaults AS (
  SELECT c.category, d.doc_id, 'default' AS phase,
         CAST(NULL AS DOUBLE) AS score, CAST(NULL AS DOUBLE) AS prob,
         FALSE AS is_in
  FROM documents d CROSS JOIN cats c
  LEFT JOIN verd v ON v.category = c.category AND v.doc_id = d.doc_id
  WHERE v.doc_id IS NULL),
results AS (
  SELECT category, doc_id, phase, score, prob, is_in FROM verd
  UNION ALL
  SELECT category, doc_id, phase, score, prob, is_in FROM defaults)
"""
    per_doc = core + """
SELECT category, doc_id, phase, round(score, 4) AS score,
       round(prob, 6) AS prob, is_in
FROM results
"""
    summary = core + """
SELECT category,
       CAST(count(*) AS BIGINT) AS total,
       CAST(sum(CASE WHEN is_in THEN 1 ELSE 0 END) AS BIGINT) AS in_category,
       CAST(sum(CASE WHEN NOT is_in THEN 1 ELSE 0 END) AS BIGINT) AS not_in_category,
       CAST(sum(CASE WHEN phase <> 'default' THEN 1 ELSE 0 END) AS BIGINT) AS candidates,
       CAST(sum(CASE WHEN phase = 'high_confidence' THEN 1 ELSE 0 END) AS BIGINT) AS high_confidence,
       CAST(sum(CASE WHEN phase = 'grey_area' THEN 1 ELSE 0 END) AS BIGINT) AS grey_area,
       CAST(sum(CASE WHEN phase = 'low_confidence' THEN 1 ELSE 0 END) AS BIGINT) AS low_confidence
FROM results GROUP BY category
"""
    return per_doc, summary


def oracle_sql() -> dict[str, str]:
    flagship_terms = _tokenize(FLAGSHIP_QUERY)
    multi_blocks = []
    for qid, text, k in MULTI_QUERIES:
        terms = _tokenize(text)
        if terms:
            multi_blocks.append(_bm25_sql(terms, k, with_qid=qid))
    multi_sql = " UNION ALL ".join(f"SELECT * FROM ({b})" for b in multi_blocks)

    lang_profiles_sql = {
        "de": "['der','die','das','und','ein','eine','ist','dass','für','in']",
        "en": "['the','a','of','and','to','in','is','that','for','it']",
        "es": "['el','la','de','y','un','una','es','que','por','en']",
        "fr": "['le','la','de','et','un','une','est','que','pour','dans']",
        "zh": "['的','是','在','了','和','有','我','不','人','这']",
    }
    lang_counts = ", ".join(
        f"len(list_filter(toks, x -> list_contains({arr}, x))) AS n_{lg}"
        for lg, arr in lang_profiles_sql.items()
    )
    stop_arr = (
        "['the','a','of','and','to','in','is','that','for','it',"
        "'on','as','at','by','an','be','this','with']"
    )

    out = {
        "corpus_stats": f"""
WITH {_TOK_CTES}
SELECT n AS n_docs, round(avgdl, 6) AS avgdl, tot AS total_tokens FROM stats
""",
        "doc_lengths": f"WITH {_TOK_CTES} SELECT doc_id, dl FROM dl",
        "term_stats": f"""
WITH {_TOK_CTES}
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term
""",
        "top_terms": f"""
WITH {_TOK_CTES}
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term
ORDER BY cf DESC, term ASC LIMIT 20
""",
        "bm25_topk": _bm25_sql(flagship_terms, 10),
        "bm25_indexed": _bm25_sql(flagship_terms, 10),
        "bm25_multi": multi_sql,
        "bm25_serve_local": _bm25_sql(flagship_terms, 10),
        "bm25_and": _bm25_sql(flagship_terms, 10, require_all=True),
        "bm25_phrase": _units_sql([("hash", "join")], [], 10),
        "bm25_expr": _units_sql([("hash", "join")], ["window"], 10),
        "bm25_phrase_and": _units_sql(
            [("hash", "join")], ["table"], 10,
            match_having="count(DISTINCT uid) = 2",
        ),
        "bm25_serve_expr": _units_sql([("hash", "join")], ["window"], 10),
        "bm25_not": _units_sql(
            [], ["hash"], 10, exclude_terms=["window"],
        ),
        "bm25_prefix": _units_sql(
            [], ["scan"], 10, prefix_units=["wind"],
            match_having="count(DISTINCT uid) = 2",
        ),
        # prefix= index is pure acceleration (probed): identical oracle
        "bm25_prefix_indexed": _units_sql(
            [], ["scan"], 10, prefix_units=["wind"],
            match_having="count(DISTINCT uid) = 2",
        ),
        "bm25_parens": _units_sql(
            [], ["hash", "window", "scan"], 10,
            match_having=(
                "(bool_or(uid = 't:hash') AND bool_or(uid = 't:scan'))"
                " OR (bool_or(uid = 't:window') AND bool_or(uid = 't:scan'))"
            ),
        ),
        "bm25_near": _units_sql(
            # CONSTRAINED member atoms only (n0:t:hash / n0:t:window) —
            # the engine's underlying term units are gated to 0 for a
            # pure-NEAR query, so they are omitted here
            [], [], 10,
            match_having="count(*) = 2",
            near2=("hash", "window", 4),
        ),
        "bm25_not_group": _units_sql(
            [], ["hash"], 10, exclude_group=["merge", "sort"],
        ),
        "bm25_caret": _units_sql(
            [], ["join"], 10, caret_units=["hash"],
            match_having="count(*) = 2",
        ),
        "classify_cascade": _cascade_sql()[0],
        "classify_summary": _cascade_sql()[1],
        "dedup_exact": """
SELECT md5(text) AS content_md5, count(*) AS n_dups, min(doc_id) AS keeper
FROM documents GROUP BY md5(text) HAVING count(*) > 1
""",
        "minhash_lsh": f"""
WITH {_TOK_CTES},
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS shingle
    FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE shingle IS NOT NULL
),
seeds AS (SELECT CAST(unnest(range(0, 16)) AS INTEGER) AS seed),
sig AS (
  SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS mh
  FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
),
band AS (
  SELECT doc_id, seed // 4 AS band,
         md5(string_agg(mh, ',' ORDER BY seed)) AS bsig
  FROM sig GROUP BY doc_id, seed // 4
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM band a JOIN band b ON a.band = b.band AND a.bsig = b.bsig
  WHERE a.doc_id < b.doc_id
)
SELECT p.doc_id_a, p.doc_id_b,
       round(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / 16.0, 6) AS est_jaccard
FROM pairs p
JOIN sig sa ON sa.doc_id = p.doc_id_a
JOIN sig sb ON sb.doc_id = p.doc_id_b AND sb.seed = sa.seed
GROUP BY p.doc_id_a, p.doc_id_b
""",
        "ngram_jaccard": f"""
WITH {_TOK_CTES},
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS shingle
    FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE shingle IS NOT NULL
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_id_a, doc_id_b,
       round(inter / (na.n_sh + nb.n_sh - inter), 6) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = inter.doc_id_a
JOIN sizes nb ON nb.doc_id = inter.doc_id_b
WHERE inter / (na.n_sh + nb.n_sh - inter) >= 0.2
""",
        "simhash": f"""
WITH {_TOK_CTES},
tfh AS (SELECT doc_id, term, count(*) AS tf, md5(term) AS h FROM pos GROUP BY doc_id, term),
bits AS (SELECT CAST(unnest(range(0, 32)) AS INTEGER) AS bit),
bv AS (
  SELECT doc_id, bit,
         sum(tf * (2 * ((strpos('0123456789abcdef', substr(h, (bit // 4) + 1, 1)) - 1
                         >> (3 - (bit % 4))) & 1) - 1)) AS v
  FROM tfh CROSS JOIN bits GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END)
            AS BIGINT) AS simhash
FROM bv GROUP BY doc_id
""",
        "simhash_pairs": f"""
WITH {_TOK_CTES},
tfh AS (SELECT doc_id, term, count(*) AS tf, md5(term) AS h FROM pos GROUP BY doc_id, term),
bits AS (SELECT CAST(unnest(range(0, 32)) AS INTEGER) AS bit),
bv AS (
  SELECT doc_id, bit,
         sum(tf * (2 * ((strpos('0123456789abcdef', substr(h, (bit // 4) + 1, 1)) - 1
                         >> (3 - (bit % 4))) & 1) - 1)) AS v
  FROM tfh CROSS JOIN bits GROUP BY doc_id, bit
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bv GROUP BY doc_id
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
        "dedup_pipeline": f"""
WITH {_TOK_CTES},
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS shingle
    FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE shingle IS NOT NULL
),
seeds AS (SELECT CAST(unnest(range(0, 16)) AS INTEGER) AS seed),
sig AS (
  SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS mh
  FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
),
band AS (
  SELECT doc_id, seed // 4 AS band,
         md5(string_agg(mh, ',' ORDER BY seed)) AS bsig
  FROM sig GROUP BY doc_id, seed // 4
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM band a JOIN band b ON a.band = b.band AND a.bsig = b.bsig
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_id_a, p.doc_id_b, count(*) AS inter
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_id_a
  JOIN sh b ON b.doc_id = p.doc_id_b AND b.shingle = a.shingle
  GROUP BY p.doc_id_a, p.doc_id_b
)
SELECT doc_id_a, doc_id_b,
       round(inter / (na.n_sh + nb.n_sh - inter), 6) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = inter.doc_id_a
JOIN sizes nb ON nb.doc_id = inter.doc_id_b
WHERE inter / (na.n_sh + nb.n_sh - inter) >= 0.2
""",
        "cosine_topk": """
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS i, CAST(unnest(embedding) AS DOUBLE) AS qv
  FROM embeddings WHERE vec_id = 0
),
e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS ev
  FROM embeddings
),
dots AS (
  SELECT vec_id, sum(ev * qv ORDER BY i) AS dot,
         sum(ev * ev ORDER BY i) AS na, sum(qv * qv ORDER BY i) AS nq
  FROM e JOIN q USING (i) GROUP BY vec_id
)
SELECT vec_id, round(dot / (sqrt(na) * sqrt(nq)), 4) AS cosine
FROM dots ORDER BY dot / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC LIMIT 10
""",
        "token_counts": r"""
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_ws,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe
FROM documents
""",
        "quality": f"""
WITH tok AS (
  SELECT doc_id, length(text) AS n_chars,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
),
feat AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         len(list_filter(toks, x -> list_contains({stop_arr}, x)))
           / greatest(len(toks), 1) AS stop_ratio,
         list_sum(list_transform(toks, x -> length(x))) / greatest(len(toks), 1) AS mean_tok_len
  FROM tok
)
SELECT doc_id, n_chars, n_tokens,
       round(stop_ratio, 6) AS stop_ratio,
       round(coalesce(mean_tok_len, 0), 6) AS mean_tok_len,
       round(least(n_tokens / 50.0, 1.0) * 0.4
             + least(stop_ratio * 5.0, 1.0) * 0.3
             + CASE WHEN mean_tok_len >= 3 AND mean_tok_len <= 10 THEN 0.3 ELSE 0.0 END,
             6) AS score
FROM feat
""",
        "lang_id": f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
),
counts AS (SELECT doc_id, {lang_counts} FROM tok)
SELECT doc_id,
       CASE greatest(n_de, n_en, n_es, n_fr, n_zh)
         WHEN n_de THEN 'de' WHEN n_en THEN 'en' WHEN n_es THEN 'es'
         WHEN n_fr THEN 'fr' ELSE 'zh' END AS pred_lang
FROM counts
""",
        "winnow": f"""
WITH {_TOK_CTES},
sh AS (
  SELECT doc_id, pos,
         term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS shingle
  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
hashed AS (
  SELECT doc_id, pos, md5(shingle) AS h,
         count(*) OVER (PARTITION BY doc_id) AS n_sh
  FROM sh WHERE shingle IS NOT NULL
)
SELECT DISTINCT doc_id,
       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
FROM hashed
QUALIFY pos <= n_sh - 3
""",
        "events_summary": """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""",
        "point_lookup": """
SELECT event_id, user_id, event_type FROM events
WHERE event_id IN (1, 5, 11, 99, 123)
""",
        "recent_events": """
SELECT event_id, user_id, event_type FROM events
ORDER BY ts DESC, event_id ASC LIMIT 15
""",
        "last_write_wins": """
SELECT user_id, event_id, event_type FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
        "percentile_sigmoid": """
WITH sig AS (
  SELECT 1.0 / (1.0 + exp(-greatest(-500.0, least(500.0, value / 100.0)))) AS s
  FROM events
)
SELECT round(quantile_cont(s, 0.85), 6) AS p85,
       round(quantile_cont(s, 0.15), 6) AS p15
FROM sig
""",
        "slugify": """
SELECT p_partkey AS partkey,
       regexp_replace(
         regexp_replace(
           regexp_replace(lower(p_name), '[ _]+', '-', 'g'),
           '[^a-z0-9-]', '', 'g'),
         '-+', '-', 'g') AS slug
FROM part
""",
        "distinct_users": "SELECT DISTINCT user_id FROM events ORDER BY user_id",
        "validate_rejects": """
SELECT doc_id FROM documents
WHERE lang IS NULL OR text IS NULL
   OR len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                      x -> x <> '')) < 5
""",
        "non_purchasers": """
SELECT DISTINCT user_id FROM events
WHERE user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'purchase')
ORDER BY user_id
""",
        "base64_roundtrip": """
SELECT doc_id, md5(base64(encode(text))) AS b64_md5,
       (decode(from_base64(base64(encode(text)))) = text) AS roundtrip_ok
FROM documents
""",
        "truncate": """
WITH t AS (
  SELECT doc_id, text, substr(text, 1, 80) AS trunc FROM documents
),
ls AS (
  SELECT doc_id, text, trunc,
         strpos(reverse(trunc), ' ') AS rsp,
         length(trunc) - strpos(reverse(trunc), ' ') + 1 AS last_space
  FROM t
)
SELECT doc_id,
       CASE WHEN length(text) <= 80 THEN text
            WHEN rsp > 0 AND last_space > 64
              THEN substr(trunc, 1, CAST(last_space - 1 AS INTEGER)) || '…'
            ELSE trunc || '…' END AS preview
FROM ls
""",
        "json_extract": """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
        "compact_repr": """
SELECT doc_id, printf('[%s] %s: %s', lang, source, substr(text, 1, 40)) AS repr
FROM documents
""",
        # expected text for the fixed HTML wrapper in q_html_clean:
        # script dropped; <p>text</p> → text + blank line; li → bullet;
        # link → 'text (href)'; spaces collapsed; ends trimmed
        "html_clean": """
SELECT doc_id,
       ltrim(regexp_replace(text, '[ \t]+', ' ', 'g'), ' ')
         || chr(10) || chr(10) || '• item' || chr(10)
         || 'link (http://example.com)' AS clean
FROM documents
""",
        "bm25_pruned": _bm25_sql(flagship_terms, 10, idf_variant="lucene"),
        "segment_metrics": _segment_metrics_sql(4),
        # tombstone delete/update: the oracle recomputes BM25 from
        # scratch over the post-mutation corpus (same predicate /
        # rewrite as the Spark-side _DEL_PRED entries)
        "delta_delete": _bm25_sql(
            flagship_terms, 10,
            ctes=_tok_ctes(
                f"(SELECT doc_id, text FROM documents WHERE NOT ({_DEL_PRED}))"
            ),
        ),
        # surgical physical delete: results must equal the tombstoned
        # index's (and therefore the same survivors oracle) exactly
        "delta_purged": _bm25_sql(
            flagship_terms, 10,
            ctes=_tok_ctes(
                f"(SELECT doc_id, text FROM documents WHERE NOT ({_DEL_PRED}))"
            ),
        ),
        # pruned serving over a layered (delta + tombstone) index: same
        # surviving-corpus oracle, lucene idf (pruning-sound variant)
        "bm25_pruned_delta": _bm25_sql(
            flagship_terms, 10, idf_variant="lucene",
            ctes=_tok_ctes(
                f"(SELECT doc_id, text FROM documents WHERE NOT ({_DEL_PRED}))"
            ),
        ),
        # multi-field (FTS5 multi-column) entries: the oracle derives the
        # same two fields (meta = lang + source, body = text), tokenizes
        # each, and mirrors the engine's exact float-op order — weighted
        # tf = (w0·tf_meta) + (w1·tf_body), colset-restricted dfs, dl =
        # the unweighted row total, uid-ordered contribution sum
        "bm25_cols": _MC_COLS_SQL,
        "bm25_detail_none": _MC_NONE_SQL,
        # detail=column keeps per-field tfs: weighted scoring identical
        "bm25_detail_column": _MC_WEIGHTED_SQL,
        "bm25_cols_weighted": _MC_WEIGHTED_SQL,
        "bm25_pruned_weighted": _MC_PRUNED_WEIGHTED_SQL,
        # the persisted rank config must equal the explicit weights
        "bm25_rank_config": _MC_WEIGHTED_SQL,
        "bm25_serve_weighted": _MC_WEIGHTED_SQL,
        # incremental delta merge is a PHYSICAL reorganization: results
        # must equal the flagship BM25 over the whole corpus bit-for-bit
        "delta_merged": _bm25_sql(flagship_terms, 10),
        # delete-all + rebuild: back to exactly the flagship index
        "delete_all_rebuild": _bm25_sql(flagship_terms, 10),
        # unicode61 tokenizer-option spec: the oracle tokenizes with 'q'
        # as an additional separator (the corpus is pure [a-z0-9 ], so
        # folds are identity and the spec is exactly a split change)
        "bm25_u61_separators": _bm25_sql(
            flagship_terms, 10,
            ctes=_TOK_CTES.replace("'[^a-z0-9]+'", "'([^a-z0-9]|q)+'"),
        ),
        # integrity-check audit summary: the doc/term universe must match
        # DuckDB's own tokenization; mismatches must be exactly zero
        "integrity_check": f"""
WITH {_TOK_CTES}
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS docs_checked,
       (SELECT CAST(count(DISTINCT term) AS BIGINT) FROM tf) AS terms_checked,
       CAST(0 AS BIGINT) AS mismatches
""",
        "delta_update": _bm25_sql(
            flagship_terms, 10,
            ctes=_tok_ctes(
                f"(SELECT doc_id, CASE WHEN {_DEL_PRED} THEN text || "
                "' window table' ELSE text END AS text FROM documents)"
            ),
        ),
        # fts5vocab 'col': per-(term, field) doc/instance recount from the
        # raw parquet, mirroring the engine's per-field tf streams
        "vocab_col": f"""
WITH {_MC_CTES}
SELECT term, 'meta' AS col, CAST(count(*) AS BIGINT) AS doc,
       CAST(sum(tf) AS BIGINT) AS cnt FROM mtf GROUP BY term
UNION ALL
SELECT term, 'body' AS col, CAST(count(*) AS BIGINT) AS doc,
       CAST(sum(tf) AS BIGINT) AS cnt FROM btf GROUP BY term
""",
        # fts5vocab 'instance': every stored token position for 3 terms
        # (DuckDB list_transform index is 1-based -> offset = pos - 1)
        "vocab_instance": f"""
WITH {_TOK_CTES}
SELECT term, doc_id, 'content' AS col, CAST(pos - 1 AS INT) AS offset
FROM pos WHERE term IN ('hash', 'join', 'scan')
""",
        # FTS5 highlight(): single-term top-10 + every instance wrapped.
        # Text is pure [a-z0-9 ] (checked), so \b-bounded regex wrapping
        # equals token-exact wrapping.
        "highlight": f"""
WITH {_TOK_CTES},
dfq AS (SELECT count(*) AS df FROM tf WHERE term = 'hash'),
scored AS (
  SELECT tf.doc_id,
         ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + (1.2 * (0.25 + ((0.75 * dl.dl) / stats.avgdl)))) AS score
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN dfq CROSS JOIN stats
  WHERE tf.term = 'hash'
),
res AS (
  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank,
         doc_id, round(score, 4) AS score
  FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT r.rank, r.doc_id, r.score,
       regexp_replace(d.text, '\\b(hash)\\b', '[\\1]', 'g') AS highlight
FROM res r JOIN documents d USING (doc_id)
""",
        # FTS5 snippet(): the full window algorithm in SQL — instance
        # candidates (1000 + repeats, re-centered, clamped) plus the
        # token-0 sentence candidate (+120, only when the doc is longer
        # than the window and some instance sits past token 0),
        # candidate order inst_1, sent, inst_2, ... with strict-greater
        # wins (row_number over (score DESC, ord ASC)).
        "snippet": f"""
WITH {_TOK_CTES},
dfq AS (SELECT count(*) AS df FROM tf WHERE term = 'hash'),
scored AS (
  SELECT tf.doc_id,
         ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + (1.2 * (0.25 + ((0.75 * dl.dl) / stats.avgdl)))) AS score
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN dfq CROSS JOIN stats
  WHERE tf.term = 'hash'
),
res AS (
  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank,
         doc_id, round(score, 4) AS score
  FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
),
doc AS (
  SELECT r.rank, r.doc_id, r.score, t.toks, CAST(len(t.toks) AS INT) AS ncol,
         list_filter(
           list_transform(t.toks, (x, i) -> CASE WHEN x = 'hash'
                                            THEN CAST(i - 1 AS INT) END),
           p -> p IS NOT NULL) AS ps
  FROM res r JOIN tok t USING (doc_id)
),
cands AS (
  SELECT rank, doc_id, score, toks, ncol, ps,
         u.io AS io, 2 * u.jj AS ord, FALSE AS is_sent
  FROM doc,
       unnest(list_transform(ps, (p, jj) ->
         struct_pack(io := p, jj := CAST(jj AS INT)))) AS c(u)
  UNION ALL
  SELECT rank, doc_id, score, toks, ncol, ps,
         0 AS io,
         2 * list_min(list_filter(
               list_transform(ps, (p, jj) -> CASE WHEN p > 0
                                             THEN CAST(jj AS INT) END),
               x -> x IS NOT NULL)) + 1 AS ord,
         TRUE AS is_sent
  FROM doc
  WHERE ncol > 8 AND len(list_filter(ps, p -> p > 0)) > 0
),
cscored AS (
  SELECT rank, doc_id, score, toks, ncol, ps, io, ord, is_sent,
         len(list_filter(ps, p -> p >= io AND p < io + 8)) AS cnt,
         list_max(list_filter(ps, p -> p >= io AND p < io + 8)) AS maxp
  FROM cands
),
cfinal AS (
  SELECT rank, doc_id, score, toks, ncol, ord,
         CASE WHEN is_sent
              THEN (CASE WHEN cnt > 0 THEN 999 + cnt ELSE 0 END) + 120
              ELSE 999 + cnt END AS sc,
         CASE WHEN is_sent THEN 0
              ELSE greatest(least(io - ((8 - (maxp + 1 - io)) // 2),
                                  ncol - 8), 0) END AS s
  FROM cscored
),
win AS (
  SELECT rank, doc_id, score, toks, ncol, s,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY sc DESC, ord ASC) AS rn
  FROM cfinal
)
SELECT rank, doc_id, score,
       (CASE WHEN s > 0 THEN '…' ELSE '' END)
       || array_to_string(
            list_transform(toks[s + 1 : least(s + 8, ncol)],
                           x -> CASE WHEN x = 'hash' THEN '[hash]' ELSE x END),
            ' ')
       || (CASE WHEN s + 8 < ncol THEN '…' ELSE '' END) AS snippet
FROM win WHERE rn = 1
""",
        # fts5vocab 'row' over the layered+tombstoned index == recount
        # over the surviving corpus
        "vocab_row_lsm": (
            "WITH "
            + _tok_ctes(
                f"(SELECT doc_id, text FROM documents WHERE NOT ({_DEL_PRED}))"
            ).lstrip()
            + """
SELECT term, CAST(count(*) AS BIGINT) AS doc,
       CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY term
"""
        ),
    }
    # the ANN index must reproduce brute-force top-10 exactly at this
    # scale (recall@10 = 1.0) — same oracle as the exact scan
    out["ann_indexed"] = out["cosine_topk"]
    # the IVF entry runs the exhaustive probe (nprobe = nlist), which is
    # provably brute force — same oracle; pruned probing is covered by
    # plan-asserted tests and the bench's recall field
    out["ivf_indexed"] = out["cosine_topk"]
    out["ivf2_indexed"] = out["cosine_topk"]
    # multimodal stub decode: first feature = little-endian uint32 of the
    # first 4 bytes of sha256(payload) / 2^32, cast to float32 — the
    # identical arithmetic the Arrow kernel runs (multimodal.py)
    hd = "strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1"
    byte = "((" + hd.format(pos="{i}*2+1") + ") * 16 + (" + hd.format(pos="{i}*2+2") + "))"
    b0, b1, b2, b3 = (byte.format(i=i) for i in range(4))
    out["media_features"] = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         sha256(text) AS h
  FROM documents
)
SELECT media_id, kind, n_bytes,
       round(CAST(CAST(CAST(
         ({b0}) + ({b1}) * 256 + ({b2}) * 65536 + ({b3}) * 16777216.0
         AS DOUBLE) / 4294967296.0 AS FLOAT4) AS DOUBLE), 6) AS f0
FROM m
"""
    out["bm25_phrase_prefix"] = _units_sql(
        [], ["window"], 10, pp_units=[("hash", "jo")]
    )
    out["bm25_star_internal"] = _units_sql(
        [], ["window"], 10, star_units=[(("s", "scan"), (0,))]
    )
    out["trigram_match"] = _substr_bm25_sql(["hash join", "slow scan"], 10)
    # case_sensitive 1 on the pure-lowercase corpus: same oracle
    out["trigram_cs_match"] = _substr_bm25_sql(["hash join", "slow scan"], 10)
    out["trigram_like"] = (
        f"SELECT doc_id FROM documents WHERE text LIKE '{LIKE_PATTERN}' "
        "ORDER BY doc_id"
    )
    # GLOB_PATTERN '*hash[ x]join*table*' as an anchored dotall regex
    out["trigram_glob"] = (
        "SELECT doc_id FROM documents "
        "WHERE regexp_matches(text, '(?s)^.*hash[ x]join.*table.*$') "
        "ORDER BY doc_id"
    )
    return out
