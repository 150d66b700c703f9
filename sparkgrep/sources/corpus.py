"""Corpus sources: the engine's ingest path.

Reference analogue: JSONL ingestion (``ingestion/ingestion.py:131-164``)
followed by ``save_messages`` (``message_manager.py:159-187``). The
engine's primary input is the Iceberg-shaped source-code table
(BASELINE.json input_hint):

    corpus(repo, path, commit, lang, content)

Ingest derives:

- ``doc_id``   — deterministic and dense. NEVER
  ``monotonically_increasing_id`` (partitioning-dependent → breaks
  rank-identity and the two-parallelism determinism gate). Either the
  fixture's preassigned id, or :func:`assign_doc_ids` — a hash-bucketed
  partition-offset scheme (parallel windows + driver offsets), never a
  global single-partition window.
- ``content_sha256`` — the per-row invariant asserted before indexing
  (input_hint; reference's closest analogue is PK identity,
  ``message_manager.py:89``).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw driver table: documents(doc_id, text, lang, source, n_chars)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def documents_as_corpus(docs: DataFrame) -> DataFrame:
    """Map the driver's documents table onto the corpus shape
    (FIXTURES.md §5: source→repo, text→content, doc_id preassigned,
    path/commit synthesized deterministically from doc_id)."""
    return docs.select(
        F.col("source").alias("repo"),
        F.format_string("src/file_%d.py", F.col("doc_id")).alias("path"),
        F.sha2(F.col("doc_id").cast("string"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )


def assign_doc_ids(
    corpus: DataFrame, n_buckets: int = 256, assert_unique: bool = False
) -> DataFrame:
    """Deterministic dense doc_id in [0, N) with NO global window.

    ``row_number() over (order by key)`` is a single-partition window —
    every row through one task, a scale-killer on a real corpus. Instead:

    1. bucket = ``pmod(xxhash64(repo, path, commit), n_buckets)`` — a
       pure hash of the key, so the assignment is identical under ANY
       input partitioning or parallelism;
    2. one tiny aggregate collects per-bucket counts; cumulative offsets
       are computed driver-side (n_buckets integers);
    3. rank within bucket via a window PARTITIONED by bucket (parallel,
       no single-partition exchange), ordered by the key;
       ``doc_id = offset[bucket] + rank - 1``.

    ids are dense and deterministic for a given key set; their order
    follows (bucket, key), not global key order — fine everywhere the
    engine needs ids (identity, joins, rank tie-breaks). Duplicate
    (repo, path, commit) keys get distinct ids with an unspecified
    relative order within the key (as with any rank over equal keys) —
    pass ``assert_unique=True`` to refuse duplicates instead when the
    two-parallelism determinism gate matters."""
    b = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(n_buckets)).cast("int")
    # persisted: the counts aggregate below and the downstream rank pass
    # would otherwise each evaluate the (potentially expensive, uncached)
    # corpus lineage; Spark evicts the blocks LRU once consumers finish
    withb = corpus.withColumn("_b", b).persist()
    aggs = [F.count("*").alias("n")]
    if assert_unique:
        aggs.append(
            F.countDistinct(F.struct("repo", "path", "commit")).alias("nd")
        )
    rows = withb.groupBy("_b").agg(*aggs).collect()
    if assert_unique:
        dups = sum(r["n"] - r["nd"] for r in rows)
        if dups:
            raise ValueError(
                f"assign_doc_ids: {dups} duplicate (repo, path, commit) keys — "
                "duplicate keys get nondeterministic relative ids, which breaks "
                "parallelism-invariant determinism; dedupe the corpus first"
            )
    counts = {r["_b"]: r["n"] for r in rows}
    if not counts:  # empty corpus: map() would be VOID-typed
        return corpus.withColumn("doc_id", F.lit(0).cast("long"))
    offsets, acc = {}, 0
    for bk in sorted(counts):
        offsets[bk] = acc
        acc += counts[bk]
    omap = F.create_map(
        *[F.lit(x) for bk_off in sorted(offsets.items()) for x in bk_off]
    )
    w = Window.partitionBy("_b").orderBy("repo", "path", "commit")
    return (
        withb.withColumn(
            "doc_id",
            (omap[F.col("_b")] + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_b")
    )


def with_ingest_columns(corpus: DataFrame) -> DataFrame:
    """Derive doc_id (if absent) and content_sha256.

    sha256 is `F.sha2` — JVM-side, no UDF (SURVEY F11)."""
    out = corpus
    if "doc_id" not in out.columns:
        out = assign_doc_ids(out)
    return out.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def assert_content_hashes(ingested: DataFrame, expected: DataFrame) -> None:
    """The input_hint's per-row invariant: content sha256 equality against
    the reference corpus, asserted BEFORE indexing. `expected` carries
    (doc_id, content_sha256). FULL OUTER join + null-safe inequality: an
    inner join would silently pass a corpus MISSING reference docs (or
    carrying extras), and a plain ``!=`` filter drops NULL hashes —
    precisely the corrupted rows the invariant exists to catch."""
    mismatches = (
        ingested.select("doc_id", "content_sha256")
        .join(
            expected.withColumnRenamed("content_sha256", "expected_sha256"),
            "doc_id",
            "full_outer",
        )
        .filter(
            ~F.col("content_sha256").eqNullSafe(F.col("expected_sha256"))
        )
        .limit(1)
        .count()
    )
    if mismatches:
        raise AssertionError("corpus content sha256 mismatch vs reference hashes")


def load_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → ingested corpus with doc_id + sha256."""
    return with_ingest_columns(documents_as_corpus(load_documents(spark, sf_dir)))


# ---------------------------------------------------------------------------
# Deterministic synthetic source-code corpus (FIXTURES.md §1) — used by
# unit tests and by bench scale-up. Seeded, no external data.

_KEYWORDS = ["def", "import", "return", "class", "self", "for", "if", "in"]
_IDENT_STEMS = [
    "parse", "config", "hash", "join", "build", "side", "index", "merge",
    "token", "stream", "buffer", "cache", "query", "plan", "shard", "batch",
    "row", "column", "scan", "filter", "sort", "spill", "codec", "varint",
]
_LANGS = ["python", "java", "go", "js", "rust"]


def _lcg(seed: int):
    state = seed & 0xFFFFFFFFFFFF
    while True:
        state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        yield state >> 16


def synth_corpus_pdf(n_docs: int, seed: int = 42, words_per_doc: int = 120) -> pd.DataFrame:
    """Deterministic synthetic code corpus: Zipf-hot keywords (def/import
    dominate → exercises the salted merge), camelCase + snake_case
    identifiers, per-doc language."""
    rng = _lcg(seed)
    rows = []
    for i in range(n_docs):
        lang = _LANGS[next(rng) % len(_LANGS)]
        n = words_per_doc // 2 + next(rng) % words_per_doc
        words = []
        for _ in range(n):
            r = next(rng) % 100
            if r < 35:  # Zipf head: keywords are ~35% of tokens
                words.append(_KEYWORDS[next(rng) % len(_KEYWORDS)])
            elif r < 60:  # snake_case identifier
                a, b = _IDENT_STEMS[next(rng) % 24], _IDENT_STEMS[next(rng) % 24]
                words.append(f"{a}_{b}")
            elif r < 85:  # camelCase identifier
                a, b = _IDENT_STEMS[next(rng) % 24], _IDENT_STEMS[next(rng) % 24]
                words.append(a + b.capitalize())
            else:
                words.append(_IDENT_STEMS[next(rng) % 24])
        content = " ".join(words)
        rows.append(
            {
                "repo": f"org{i % 7}/proj{i % 13}",
                "path": f"src/module_{i % 31}/file_{i}.{lang[:2]}",
                "commit": hashlib.sha1(str(i).encode()).hexdigest(),
                "lang": lang,
                "content": content,
                "doc_id": i,
            }
        )
    return pd.DataFrame(rows)


def synth_corpus(spark: SparkSession, n_docs: int, seed: int = 42, **kw) -> DataFrame:
    pdf = synth_corpus_pdf(n_docs, seed, **kw)
    return with_ingest_columns(spark.createDataFrame(pdf))


def synth_code_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    words_per_doc: int = 150,
    n_stems: int = 40,
    suffix_cardinality: int = 1000,
) -> DataFrame:
    """Distributed deterministic code-corpus generator (bench scale).

    Unlike :func:`synth_corpus` (driver-side, small fixtures), this
    generates on executors via ``mapInPandas`` with a per-doc-seeded
    numpy PCG64 — identical content for a given (seed, doc_id) under any
    partitioning. The vocabulary is realistic for source code:

    - a Zipf head of hot keywords (``def``/``import``/…, ~30% of tokens)
      — the salted-merge skew case,
    - hot identifier stems and a long tail of suffixed identifiers
      (``cache_buffer123``) giving tens of thousands of distinct terms,
      so the global merge actually fans out (a 31-term vocabulary caps
      merge parallelism at 31 tasks — the scaling killer).

    Note: the stems cycle with period lcm(3, 24) = 24, so ``n_stems``
    beyond 24 repeats earlier entries (the default 40 yields 24 distinct
    stems, the first 16 sampled twice as often). The distinct-term
    fan-out still comes from stems × ``suffix_cardinality`` (~24k terms
    at the defaults). Deliberately NOT changed: every recorded bench and
    scaling number is pinned to this generator's byte-exact output.
    """
    import numpy as np
    from typing import Iterator

    keywords = np.array(_KEYWORDS, dtype=object)
    stems = np.array(
        [f"{a}{i}" if i else a for i, a in
         ((j % 3, _IDENT_STEMS[j % len(_IDENT_STEMS)]) for j in range(n_stems))],
        dtype=object,
    )
    langs = np.array(_LANGS, dtype=object)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                rng = np.random.Generator(np.random.PCG64(seed * (1 << 33) + int(doc_id)))
                n = words_per_doc // 2 + int(rng.integers(0, words_per_doc))
                kind = rng.random(n)
                a = stems[rng.integers(0, len(stems), n)]
                b = stems[rng.integers(0, len(stems), n)]
                # zipf-ish suffix tail: cube-skewed toward low ids
                suf = (rng.random(n) ** 3 * suffix_cardinality).astype(int).astype(str)
                words = np.where(
                    kind < 0.30,
                    keywords[rng.integers(0, len(keywords), n)],
                    np.where(
                        kind < 0.55,
                        a + "_" + b,                     # snake_case, hot-ish
                        np.where(
                            kind < 0.80,
                            a + "_" + b + suf,           # long-tail identifier
                            a,                           # bare hot stem
                        ),
                    ),
                )
                lang = langs[int(doc_id) % len(langs)]
                rows.append(
                    {
                        "repo": f"org{int(doc_id) % 7}/proj{int(doc_id) % 13}",
                        "path": f"src/m{int(doc_id) % 97}/f_{int(doc_id)}.{lang[:2]}",
                        "commit": hashlib.sha1(str(int(doc_id)).encode()).hexdigest(),
                        "lang": lang,
                        "content": " ".join(words.tolist()),
                        "doc_id": int(doc_id),
                    }
                )
            yield pd.DataFrame(rows)

    base = spark.range(n_docs)
    out = base.mapInPandas(
        gen,
        "repo string, path string, commit string, lang string, content string, doc_id long",
    )
    return with_ingest_columns(out)
