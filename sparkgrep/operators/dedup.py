"""Deduplication operators for large-scale training-data pipelines.

All variants operate on a documents DataFrame ``(doc_id, text)`` and are
expressed with native Spark SQL functions wherever possible so Catalyst
keeps them JVM-side; hash primitives are md5/sha2 **string** digests so
the DuckDB correctness oracle can reproduce every value bit-for-bit
(engine-neutral, unlike xxhash64).

- exact:        hash-groupBy on the full text digest
- minhash+LSH:  token-shingle → per-seed min(md5(seed:shingle)) signature
                → banded LSH bucket join → candidate pairs
- simhash:      32-bit md5-derived simhash + hamming-distance pairs
- n-gram Jaccard: exact shingle-set Jaccard via shingle self-join

Scale notes (100 TB): every op here is shuffle-bounded by design —
exact dedup shuffles one 32-byte digest per doc; minhash shuffles
n_hashes values per doc and joins on (band, signature) buckets whose
expected size is tiny under any real corpus; the exact-Jaccard join is
quadratic per shingle bucket and is the *verification* tool for pairs
already proposed by LSH, not a corpus-wide sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkgrep.functions.tokenizer import simple_tokens_col


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical docs: (content_md5, n_dups, keeper).
    keeper = min doc_id (deterministic last-write-wins analogue of the
    reference's INSERT OR REPLACE dedup, message_manager.py:180)."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (min doc_id wins)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def token_positions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, term), pos 1-based — shared basis for shingling."""
    toks = docs.select("doc_id", simple_tokens_col(F.col(text_col)).alias("toks"))
    return toks.select(
        "doc_id", F.posexplode("toks").alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")


def shingles(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, shingle): k-token shingles via lead() windows — the
    same construction the DuckDB oracle uses, so values match exactly."""
    pos = token_positions(docs, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("term")] + [F.lead("term", i).over(w) for i in range(1, k)]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.concat(joined, F.lit(" "), p)
    return pos.select("doc_id", "pos", joined.alias("shingle")).filter(
        F.col("shingle").isNotNull()
    )


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 16, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, seed, mh): per-seed minhash where the 'hash' is the md5
    hex digest of 'seed:shingle' and min is the lexicographic string min
    — deterministic and engine-neutral."""
    sh = shingles(docs, k, text_col).select("doc_id", "shingle").distinct()
    seeds = docs.sparkSession.range(n_hashes).select(F.col("id").cast("int").alias("seed"))
    return (
        sh.crossJoin(F.broadcast(seeds))
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """(doc_id_a, doc_id_b, est_jaccard): pairs sharing ≥1 LSH band,
    with the estimated Jaccard = fraction of matching minhashes.

    Band signature = md5 of the band's minhashes joined in seed order;
    the bucket join is an equi-join on (band, sig) — broadcast-free,
    shuffle keyed on the band signature.

    SKEW WARNING: M near-identical docs share band signatures and
    produce O(M²) pairs inside one bucket — and huge boilerplate
    clusters are the COMMON case in code corpora, not the edge. Two
    defenses: (1) collapse exact duplicates to one representative
    upstream (what :func:`dedup_pipeline` does — byte-identical copies
    are the worst offenders and are already handled by the cheap exact
    pass); (2) ``max_bucket`` drops (band, sig) buckets larger than the
    cap before pairing — each dropped bucket is itself a
    near-duplicate cluster report, so recall is lost only WITHIN
    already-flagged clusters (audit them via the returned
    ``exact_dup_groups``-style grouping on the band signature)."""
    if bands < 1 or bands > n_hashes or n_hashes % bands != 0:
        # bands > n_hashes made rows_per_band 0 → every band id NULL →
        # the self-join matched nothing and the function SILENTLY
        # returned zero candidates; a non-divisor silently changed the
        # banding scheme (an extra narrow band floods candidates)
        raise ValueError(
            f"bands={bands} must be a divisor of n_hashes={n_hashes} "
            "with 1 <= bands <= n_hashes"
        )
    rows_per_band = n_hashes // bands
    # sigs feeds three branches (band buckets + both sides of the
    # estimate join) — persist to avoid recomputing the shingle/md5 tree.
    # The cache lives until the app clears it: the returned relation is
    # LAZY over sigs, so there is no sound unpersist point inside this
    # function; long-lived callers can spark.catalog.clearCache() after
    # materializing.
    sigs = minhash_signatures(docs, n_hashes, k, text_col).persist()
    band_sigs = (
        sigs.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                        lambda s: s["mh"],
                    ),
                    ",",
                )
            ).alias("sig")
        )
    )
    if max_bucket is not None:
        w = Window.partitionBy("band", "sig")
        band_sigs = (
            band_sigs.withColumn("_n", F.count("*").over(w))
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a, b2 = band_sigs.alias("a"), band_sigs.alias("b")
    pairs = (
        a.join(b2, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )
    # estimated jaccard from full signatures for the candidate pairs
    sa = sigs.select(F.col("doc_id").alias("doc_id_a"), "seed", F.col("mh").alias("mh_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_id_b"), "seed", F.col("mh").alias("mh_b"))
    return (
        pairs.join(sa, "doc_id_a")
        .join(sb, ["doc_id_b", "seed"])
        .groupBy("doc_id_a", "doc_id_b")
        .agg(
            (F.sum(F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0)) / F.lit(n_hashes))
            .alias("est_jaccard")
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct k-token shingle sets:
    (doc_id_a, doc_id_b, jaccard ≥ threshold).

    ``candidates`` (doc_id_a, doc_id_b) restricts the computation to a
    proposed pair set — at corpus scale ALWAYS pass the LSH candidates
    (:func:`lsh_candidate_pairs` → this, see :func:`dedup_pipeline`): the
    candidate-driven plan joins each pair's shingle sets directly and is
    linear in Σ pair shingles. Without candidates the fallback is an
    inverted self-join on the shingle — quadratic per shingle bucket, a
    corpus-wide sweep only suitable for small/test corpora."""
    sh = shingles(docs, k, text_col).select("doc_id", "shingle").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if candidates is not None:
        # dedupe defensively: a repeated candidate pair would double-count
        # every shingle intersection (cheap vs the shingle joins below)
        pairs = candidates.select("doc_id_a", "doc_id_b").distinct()
        sa = sh.select(F.col("doc_id").alias("doc_id_a"), "shingle")
        sb = sh.select(F.col("doc_id").alias("doc_id_b"), "shingle")
        inter = (
            pairs.join(sa, "doc_id_a")
            .join(sb, ["doc_id_b", "shingle"])
            .groupBy("doc_id_a", "doc_id_b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        a = sh.select(F.col("doc_id").alias("doc_id_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("doc_id_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("doc_id_a") < F.col("doc_id_b"))
            .groupBy("doc_id_a", "doc_id_b")
            .agg(F.count("*").alias("inter"))
        )
    na = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(na, "doc_id_a")
        .join(nb, "doc_id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


def dedup_pipeline(
    docs: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """The scale-correct near-dup pipeline: exact dedup collapses
    byte-identical clusters to one representative (min doc_id), LSH
    proposes candidate pairs among representatives (banded minhash
    equi-join, never all-pairs), exact n-gram Jaccard verifies them.
    Returns (doc_id_a, doc_id_b, jaccard ≥ threshold) over
    representatives.

    The upstream exact pass is what makes this safe on real corpora: M
    byte-identical copies of a boilerplate file would otherwise share
    every band signature and emit M²/2 candidate pairs from one bucket
    (the common case at 100 TB of code, not the edge). After collapse
    the cluster contributes ONE member; its internal membership is the
    cheap hash-groupBy (:func:`exact_dup_groups` — join the keeper
    column back to expand a representative pair to its cluster).
    ``max_bucket`` additionally caps residual near-identical (not
    byte-identical) buckets; see :func:`lsh_candidate_pairs`."""
    reps = dedup_exact(docs, text_col)
    cands = lsh_candidate_pairs(
        reps, n_hashes, bands, k, text_col, max_bucket=max_bucket
    )
    return ngram_jaccard_pairs(
        reps, k=k, threshold=threshold, text_col=text_col, candidates=cands
    )


def _hex_digit_val(c):
    return F.instr(F.lit("0123456789abcdef"), c) - 1


def simhash32(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 32-bit simhash over tokens, bits drawn from the
    first 8 hex digits of md5(term), weighted by tf. Engine-neutral: the
    identical arithmetic runs in the DuckDB oracle."""
    tf = (
        token_positions(docs, text_col)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.md5("term"))
    )
    # 32× bit fan-out via explode(sequence) — stays a narrow projection,
    # no join in the plan
    bitvals = (
        tf.withColumn("bit", F.explode(F.sequence(F.lit(0), F.lit(31))))
        .withColumn("digit", _hex_digit_val(F.expr("substring(h, cast(bit / 4 as int) + 1, 1)")))
        .withColumn("bitval", F.expr("shiftright(digit, 3 - cast(bit % 4 as int)) & 1"))
        .withColumn("w", F.col("tf") * (F.col("bitval") * 2 - 1))
    )
    return (
        bitvals.groupBy("doc_id", "bit")
        .agg(F.sum("w").alias("v"))
        .withColumn("on", (F.col("v") > 0).cast("long"))
        .groupBy("doc_id")
        .agg(F.sum(F.expr("`on` * shiftleft(cast(1 as bigint), bit)")).alias("simhash"))
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id_a, doc_id_b, hamming ≤ max_hamming), banded — NO crossJoin.

    Pigeonhole blocking: split the 32-bit simhash into ``n_bands ≥
    max_hamming + 1`` equal-width chunks; any pair within ``max_hamming``
    differs in at most ``max_hamming`` chunks, so at least one chunk is
    IDENTICAL — an equi-join on (band, chunk value) finds every such pair
    (recall 1.0), and only same-chunk pairs are ever compared. Band width
    must divide 32, so n_bands rounds up to the next divisor."""
    if max_hamming > 31:
        # 32 one-bit bands is the finest split a 32-bit simhash allows;
        # radii ≥ 32 cannot be pigeonhole-guaranteed (and ≥ 32 means "any
        # pair" anyway) — refuse rather than silently lose recall
        raise ValueError(f"max_hamming must be ≤ 31 for a 32-bit simhash, got {max_hamming}")
    for n_bands in (1, 2, 4, 8, 16, 32):
        if n_bands >= max_hamming + 1:
            break
    width = 32 // n_bands
    mask = (1 << width) - 1
    s = simhash32(docs, text_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("bval"),
            )
            for i in range(n_bands)
        ]
    )
    banded = s.select(
        "doc_id", "simhash", F.explode(chunks).alias("c")
    ).select("doc_id", "simhash", "c.band", "c.bval")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair can match in several bands
    )
    return pairs
