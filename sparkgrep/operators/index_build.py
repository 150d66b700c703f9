"""Inverted-index construction: SPIMI per partition → salted global merge
→ term-partitioned, varint-compressed postings table.

Reference analogue: FTS5 builds its inverted index row-at-a-time behind
INSERT triggers (``message_manager.py:113-137``), single-writer B-tree.
The engine instead treats the index as a *derived dataset* built by one
Spark job (SURVEY S6/R2/R4):

1. **SPIMI pass** (`mapInPandas`, narrow): tokenize each doc batch and
   emit per-(doc, term) frequencies locally — tf is intra-document, so
   no shuffle is needed to compute it. Doc length rides along.
2. **Stats + df pass**: one `groupBy(term)` with map-side partial
   aggregation (a count per term per task, so hot terms like
   ``def``/``import`` cost one row per task, not one per posting).
3. **Salted merge**: join tf↔df (AQE skew-join splits hot partitions),
   then shard each term's postings by ``xxhash64(doc_id) % n_shards``
   where ``n_shards = ceil(df / postings_per_shard)``. This bounds every
   merge group — and every output row — to ~postings_per_shard entries,
   which is what actually survives 10^12 docs: a hot term's postings
   can never concentrate on one task or one row.
4. **Encode** (`applyInPandas` per (term, shard)): sort by doc_id,
   gap+varint docIDs, varint tfs/dls (numpy kernels,
   :mod:`sparkgrep.functions.varint`), and precompute per-block
   (BLOCK_SIZE postings) BM25 upper bounds for block-max WAND.

Layout on disk::

    <out>/postings/bucket=<b>/*.parquet   # bucket = xxhash64(term) % n_buckets
    <out>/doc_lens/*.parquet
    <out>/stats.json                      # N, avgdl, analyzer, codec params

Everything is deterministic under any parallelism: shard assignment is
a pure hash, postings are sorted by doc_id before encoding, and doc_ids
are ingest-assigned (SURVEY §7.4).
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import asdict, dataclass, replace
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkgrep import BM25_B, BM25_K1
from sparkgrep.functions.tokenizer import tokenize_series
from sparkgrep.functions.varint import (
    blocked_gap_encode,
    delta_encode_segments,
    segment_byte_offsets,
    varint_encode,
)
from sparkgrep.schema import TERM_FREQ_POS_SCHEMA, TERM_FREQ_SCHEMA

BLOCK_SIZE = 128
XXHASH_SEED = 42  # F.xxhash64's fixed seed


@dataclass(frozen=True)
class IndexMeta:
    n_docs: int
    avgdl: float
    total_tokens: int
    analyzer: str
    n_buckets: int
    postings_per_shard: int
    block_size: int
    k1: float
    b: float
    idf_variant: str
    version: int = 2  # v2: block-addressable postings (gap reset + offsets)
    has_positions: bool = False
    # vocabulary size, for the driver-side decision to load the whole
    # term_ubs sidecar (-1 = sidecar absent / pre-sidecar index). On a
    # layered index this is an upper bound (Σ per-layer vocabularies).
    n_terms: int = -1
    # log-structured DELTA layers (relative subdirs, append order): the
    # reader serves base + deltas with exact global stats; compaction
    # folds them back (plans/manifest.py: append_batch_delta /
    # compact_index)
    layers: tuple = ()
    # TOMBSTONE layers (relative subdirs, delete order): each holds the
    # deleted doc_ids plus a term_ubs sidecar with NEGATED dfs (the
    # reader's cross-layer df summation subtracts them); tombstone_cuts
    # records, per tombstone, how many postings layers existed at delete
    # time — the mask applies only to layers OLDER than the tombstone,
    # so re-appending a deleted doc_id (an UPDATE) serves the new
    # version (plans/manifest.py: delete_batch_delta)
    tombstones: tuple = ()
    tombstone_cuts: tuple = ()
    # per-POSTINGS-layer build-time stats, aligned with [base] + layers:
    # (n_docs, avgdl) as they were when that layer's block_max / term_ubs
    # values were computed. A layer's sidecar ub is idf_layer·tfcomp_layer;
    # these snapshots let the reader rescale it into a GLOBAL-sound
    # MaxScore bound (query.py term_ubs): ub_g = ub_L · idf_g/idf_L ·
    # max(1, avgdl_g/avgdl_L) — the tf component is monotone in avgdl
    # with supremum ratio avgdl_g/avgdl_L. Empty = unknown (pre-upgrade
    # layered index): pruning then routes to the exact path as before.
    layer_stats: tuple = ()
    # MULTI-FIELD index (FTS5 multi-column analogue — the reference's
    # FTS5 table indexes subject/body_text/sender,
    # message_manager.py:101-110): the ordered names of the indexed
    # corpus columns. Empty = classic single-content index (every legacy
    # code path and byte layout unchanged). Multi-field postings carry
    # per-field tf streams (tfs_cols) and field-relative position
    # streams (poss_cols) so column filters (``col:``), per-column BM25
    # weights, '^' field anchors, and within-field phrases/NEAR follow
    # SQLite FTS5 exactly (tests/test_multicol_parity.py).
    fields: tuple = ()


# v2 postings are BLOCK-ADDRESSABLE: doc_ids gap encoding resets at every
# block boundary and per-block byte offsets for all three streams are
# stored alongside per-block first-doc_ids (block_min) — so pruned
# serving can decode ONLY the blocks whose doc-range intersects its
# candidate set (true block skipping), and block_max stays the BM25
# upper bound per block.
POSTINGS_OUT_SCHEMA = (
    "bucket int, term string, shard int, df long, cf long, n int, "
    "doc_ids binary, tfs binary, dls binary, block_max array<float>, "
    "block_min array<long>, offs_ids array<int>, offs_tfs array<int>, "
    "offs_dls array<int>"
)
# positions-enabled index: poss = per-doc token-position lists (0-based),
# delta+varint encoded, concatenated in doc order; segment lengths == tfs
POSTINGS_OUT_SCHEMA_POS = POSTINGS_OUT_SCHEMA + ", poss binary"
# multi-field index: tfs_cols[c] = varint stream of the term's tf WITHIN
# field c, aligned with doc_ids (zeros included — every stream has n
# entries); the top-level tfs stream stays the per-doc TOTAL, so the
# default full-colset scoring path decodes exactly like a single-field
# index. poss_cols[c] = field-relative positions, segment lengths =
# the per-doc values of tfs_cols[c].
POSTINGS_OUT_SCHEMA_MC = POSTINGS_OUT_SCHEMA + ", tfs_cols array<binary>"
POSTINGS_OUT_SCHEMA_MC_POS = POSTINGS_OUT_SCHEMA_MC + ", poss_cols array<binary>"

# per-term sidecar: (a) MaxScore planning (operators/wand.py) reads the
# global df + BM25 upper bound; (b) it doubles as the sorted TERM
# DICTIONARY for prefix-query pruning — bucket tells the reader which
# hash-bucket partitions hold a resolved term, so `stem*` never sweeps
# the whole postings table (query.py:prefix_terms). Written
# range-partitioned and sorted by term: parquet row-group min/max stats
# prune a StartsWith pushdown to the matching files
TERM_UBS_SCHEMA = "term string, df long, ub double, bucket int"


def postings_schema(meta: "IndexMeta") -> str:
    """The postings DDL string matching an index's meta — shared by the
    writer and every reader (explicit schemas keep empty dirs readable)."""
    if meta.fields:
        return (
            POSTINGS_OUT_SCHEMA_MC_POS
            if meta.has_positions
            else POSTINGS_OUT_SCHEMA_MC
        )
    return POSTINGS_OUT_SCHEMA_POS if meta.has_positions else POSTINGS_OUT_SCHEMA


def spimi_term_freqs(
    corpus: DataFrame,
    analyzer: str = "simple",
    use_lang: bool = False,
    positions: bool = False,
) -> DataFrame:
    """SPIMI local runs: (term, doc_id, tf, dl) with NO shuffle — term
    frequency is an intra-document statistic, computed per Arrow batch
    with a pandas groupby (the in-memory 'single-pass in-memory
    indexing' run; the global merge is the later groupBy).

    EVERY doc emits one sentinel run row ``(term='', tf=0, dl)``: the
    merge derives the doc_lengths table by FILTERING these rows — a
    narrow scan instead of a groupBy(doc_id) shuffle over the whole
    (term, doc) relation, which would otherwise be the build's
    largest-volume exchange. This also makes zero-token docs (null or
    punctuation-only content) count in N/avgdl — matching the exact
    path, the DuckDB oracle, and FTS5. The sentinel term '' can never
    collide with a real token (no analyzer emits empty strings) and is
    filtered out of df/postings in the merge."""
    cols = ["doc_id", "content"] + (["lang"] if use_lang and "lang" in corpus.columns else [])
    narrow = corpus.select(*cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            toks = tokenize_series(
                pdf["content"], analyzer, pdf["lang"] if "lang" in pdf else None
            )
            dls = toks.map(len).astype("int32")
            frames = []
            sent = pd.DataFrame(
                {
                    "term": np.full(len(pdf), "", dtype=object),
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "tf": np.zeros(len(pdf), dtype=np.int32),
                    "dl": dls.to_numpy(),
                }
            )
            if positions:
                sent["positions"] = [[] for _ in range(len(pdf))]
            frames.append(sent)
            lens = dls.to_numpy()
            exploded = pd.DataFrame(
                {
                    "term": np.concatenate([np.asarray(t, dtype=object) for t in toks])
                    if len(toks)
                    else np.empty(0, dtype=object),
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), lens),
                    "dl": np.repeat(lens, lens),
                }
            )
            if positions and not exploded.empty:
                # 0-based token position within each doc, vectorized
                offs = np.repeat(np.cumsum(lens) - lens, lens)
                exploded["pos"] = (
                    np.arange(int(lens.sum()), dtype=np.int64) - offs
                ).astype(np.int32)
            if not exploded.empty:
                aggs = {"tf": ("dl", "size"), "dl": ("dl", "first")}
                if positions:
                    aggs["positions"] = ("pos", list)
                run = (
                    exploded.groupby(["term", "doc_id"], sort=False)
                    .agg(**aggs)
                    .reset_index()
                )
                run["tf"] = run["tf"].astype("int32")
                run["dl"] = run["dl"].astype("int32")
                cols = ["term", "doc_id", "tf", "dl"] + (["positions"] if positions else [])
                frames.append(run[cols])
            if frames:
                yield pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]

    schema = TERM_FREQ_POS_SCHEMA if positions else TERM_FREQ_SCHEMA
    return narrow.mapInPandas(gen, schema)


def spimi_term_freqs_mc(
    corpus: DataFrame,
    fields: list[str],
    analyzer: str = "simple",
    use_lang: bool = False,
    positions: bool = False,
) -> DataFrame:
    """Multi-field SPIMI runs: one (term, doc_id, col, tf, dl) row per
    (doc, term, FIELD), still with no shuffle. ``dl`` is the doc's TOTAL
    token count over all indexed fields (FTS5's bm25 document length —
    the unweighted row total, pinned against SQLite); positions are
    FIELD-RELATIVE (reset at each field start), so '^' anchors to a
    field's first token and phrases/NEAR never span fields. One sentinel
    row per doc (term='', col=0) carries dl for the doc_lengths filter,
    exactly like the single-field pass."""
    from sparkgrep.schema import TERM_FREQ_MC_POS_SCHEMA, TERM_FREQ_MC_SCHEMA

    cols = ["doc_id"] + list(fields) + (
        ["lang"] if use_lang and "lang" in corpus.columns else []
    )
    narrow = corpus.select(*cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            langs = pdf["lang"] if "lang" in pdf else None
            toks_f = [tokenize_series(pdf[f], analyzer, langs) for f in fields]
            lens_f = [t.map(len).to_numpy() for t in toks_f]
            dls = np.sum(lens_f, axis=0).astype("int32")  # row totals
            frames = [
                pd.DataFrame(
                    {
                        "term": np.full(len(pdf), "", dtype=object),
                        "doc_id": pdf["doc_id"].to_numpy(),
                        "col": np.zeros(len(pdf), dtype=np.int32),
                        "tf": np.zeros(len(pdf), dtype=np.int32),
                        "dl": dls,
                    }
                )
            ]
            if positions:
                frames[0]["positions"] = [[] for _ in range(len(pdf))]
            for ci, (toks, lens) in enumerate(zip(toks_f, lens_f)):
                if not lens.sum():
                    continue
                exploded = pd.DataFrame(
                    {
                        "term": np.concatenate(
                            [np.asarray(t, dtype=object) for t in toks]
                        ),
                        "doc_id": np.repeat(pdf["doc_id"].to_numpy(), lens),
                        "dl": np.repeat(dls, lens),
                    }
                )
                if positions:
                    offs = np.repeat(np.cumsum(lens) - lens, lens)
                    exploded["pos"] = (
                        np.arange(int(lens.sum()), dtype=np.int64) - offs
                    ).astype(np.int32)
                aggs = {"tf": ("dl", "size"), "dl": ("dl", "first")}
                if positions:
                    aggs["positions"] = ("pos", list)
                run = (
                    exploded.groupby(["term", "doc_id"], sort=False)
                    .agg(**aggs)
                    .reset_index()
                )
                run["tf"] = run["tf"].astype("int32")
                run["dl"] = run["dl"].astype("int32")
                run.insert(2, "col", np.full(len(run), ci, dtype=np.int32))
                keep = ["term", "doc_id", "col", "tf", "dl"] + (
                    ["positions"] if positions else []
                )
                frames.append(run[keep])
            yield pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]

    schema = TERM_FREQ_MC_POS_SCHEMA if positions else TERM_FREQ_MC_SCHEMA
    return narrow.mapInPandas(gen, schema)


def _encode_groups_frame(meta: IndexMeta, pdf: pd.DataFrame, starts, ends) -> pd.DataFrame:
    """Encode the groups delimited by (starts, ends) in a sorted frame
    into one columnar output frame (no per-group dict/DataFrame churn).
    Input must be sorted by (term, shard, doc_id)."""
    from sparkgrep.operators.score import idf as idf_fn

    k1, b, avgdl, block = meta.k1, meta.b, meta.avgdl, meta.block_size
    terms = pdf["term"].to_numpy()
    shards = pdf["shard"].to_numpy()
    buckets = pdf["bucket"].to_numpy()
    # df/cf are only pre-joined (broadcast) for HOT terms; cold groups —
    # whole posting lists — count themselves here. float64 carries the
    # nulls; counts are exact well past 2^32.
    dfs_in = pdf["df"].to_numpy(dtype=np.float64, na_value=np.nan)
    cfs_in = pdf["cf"].to_numpy(dtype=np.float64, na_value=np.nan)
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    # per-posting contributions for block_max, vectorized over the whole
    # frame at once (idf multiplied in per group below)
    tf_norm = (tfs * (k1 + 1.0)) / (tfs + (k1 * ((1.0 - b) + ((b * dls) / avgdl))))

    has_pos = "positions" in pdf.columns
    poscol = pdf["positions"].to_numpy() if has_pos else None

    starts_a = np.asarray(starts, dtype=np.int64)
    ends_a = np.asarray(ends, dtype=np.int64)
    glen = ends_a - starts_a
    # per-group Σtf via prefix sums (reduceat would swallow carry rows)
    ctf = np.cumsum(tfs)
    gsum = ctf[ends_a - 1] - np.where(starts_a > 0, ctf[starts_a - 1], 0)
    d0, c0 = dfs_in[starts_a], cfs_in[starts_a]
    dfs_ = np.where(np.isnan(d0), glen, d0).astype(np.int64)
    cfs = np.where(np.isnan(c0), gsum, c0).astype(np.int64)

    n = len(starts)
    out = {
        "bucket": buckets[starts].astype("int32"),
        "term": terms[starts],
        "shard": shards[starts].astype("int32"),
        "df": dfs_,
        "cf": cfs,
        "n": glen.astype("int32"),
        "doc_ids": [None] * n,
        "tfs": [None] * n,
        "dls": [None] * n,
        "block_max": [None] * n,
    }
    out["block_min"] = [None] * n
    out["offs_ids"] = [None] * n
    out["offs_tfs"] = [None] * n
    out["offs_dls"] = [None] * n
    if has_pos:
        out["poss"] = [None] * n
    n_docs, variant = meta.n_docs, meta.idf_variant
    for gi, (s, e) in enumerate(zip(starts, ends)):
        g_ids = ids[s:e]
        g_tfs = tfs[s:e].astype(np.uint64)
        g_dls = dls[s:e].astype(np.uint64)
        nb = (len(g_ids) + block - 1) // block
        counts = np.full(nb, block, dtype=np.int64)
        counts[-1] = len(g_ids) - block * (nb - 1)
        out["doc_ids"][gi], offs_ids = blocked_gap_encode(g_ids, block)
        out["tfs"][gi] = varint_encode(g_tfs)
        out["dls"][gi] = varint_encode(g_dls)
        out["block_min"][gi] = g_ids[::block].astype(np.int64)
        out["offs_ids"][gi] = offs_ids.astype(np.int32)
        out["offs_tfs"][gi] = segment_byte_offsets(g_tfs, counts).astype(np.int32)
        out["offs_dls"][gi] = segment_byte_offsets(g_dls, counts).astype(np.int32)
        if has_pos:
            flat = (
                np.concatenate([np.asarray(p, dtype=np.int64) for p in poscol[s:e]])
                if e > s
                else np.empty(0, dtype=np.int64)
            )
            out["poss"][gi] = delta_encode_segments(flat, tfs[s:e])
        idf = idf_fn(n_docs, int(dfs_[gi]), variant)
        contrib = idf * tf_norm[s:e]
        nblocks = (len(g_ids) + block - 1) // block
        pad = nblocks * block - len(g_ids)
        bm = np.pad(contrib, (0, pad), constant_values=-np.inf).reshape(nblocks, block)
        # round UP to the next float32: block_max is consumed as an exact
        # upper bound by MaxScore pruning (wand.py), and a down-rounding
        # float64→float32 cast would make it unsound at score boundaries
        bm64 = bm.max(axis=1)
        bm32 = bm64.astype(np.float32)
        low = bm32.astype(np.float64) < bm64
        bm32[low] = np.nextafter(bm32[low], np.float32(np.inf))
        out["block_max"][gi] = bm32
    return pd.DataFrame(out)


def _encode_groups_frame_mc(
    meta: IndexMeta, pdf: pd.DataFrame, starts, ends
) -> pd.DataFrame:
    """Multi-field sibling of :func:`_encode_groups_frame`: input rows
    are per (doc, FIELD) — sorted by (term, shard, doc_id, col) — and
    each output row collapses them to per-doc streams: the total-tf
    stream (identical layout to a single-field index, so the default
    full-colset scoring path is unchanged) plus one per-field tf stream
    and, with positions, one field-relative position stream per field.
    df counts UNIQUE docs (a doc's several field rows are one posting);
    block_max bounds the total-tf (weight-1 full-colset) contribution —
    weighted/filtered queries route to the exact path."""
    from sparkgrep.operators.score import idf as idf_fn

    n_fields = len(meta.fields)
    k1, b, avgdl, block = meta.k1, meta.b, meta.avgdl, meta.block_size
    terms = pdf["term"].to_numpy()
    shards = pdf["shard"].to_numpy()
    buckets = pdf["bucket"].to_numpy()
    dfs_in = pdf["df"].to_numpy(dtype=np.float64, na_value=np.nan)
    cfs_in = pdf["cf"].to_numpy(dtype=np.float64, na_value=np.nan)
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    fcols = pdf["col"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    has_pos = "positions" in pdf.columns
    poscol = pdf["positions"].to_numpy() if has_pos else None

    n = len(starts)
    out = {
        "bucket": buckets[np.asarray(starts, dtype=np.int64)].astype("int32"),
        "term": terms[np.asarray(starts, dtype=np.int64)],
        "shard": shards[np.asarray(starts, dtype=np.int64)].astype("int32"),
        "df": np.zeros(n, dtype=np.int64),
        "cf": np.zeros(n, dtype=np.int64),
        "n": np.zeros(n, dtype=np.int32),
        "doc_ids": [None] * n,
        "tfs": [None] * n,
        "dls": [None] * n,
        "block_max": [None] * n,
        "block_min": [None] * n,
        "offs_ids": [None] * n,
        "offs_tfs": [None] * n,
        "offs_dls": [None] * n,
        "tfs_cols": [None] * n,
    }
    if has_pos:
        out["poss_cols"] = [None] * n
    n_docs, variant = meta.n_docs, meta.idf_variant
    for gi, (s, e) in enumerate(zip(starts, ends)):
        g_ids_all = ids[s:e]
        g_cols = fcols[s:e]
        g_tfs_all = tfs[s:e]
        # collapse (doc, field) rows to unique docs (input doc-sorted)
        change = np.flatnonzero(g_ids_all[1:] != g_ids_all[:-1]) + 1
        doc_starts = np.concatenate(([0], change))
        counts_per_doc = np.diff(np.concatenate((doc_starts, [e - s])))
        doc_idx = np.repeat(
            np.arange(len(doc_starts), dtype=np.int64), counts_per_doc
        )
        g_ids = g_ids_all[doc_starts]
        g_dls = dls[s:e][doc_starts].astype(np.uint64)
        tfc = np.zeros((len(g_ids), n_fields), dtype=np.int64)
        tfc[doc_idx, g_cols] = g_tfs_all
        tf_tot = tfc.sum(axis=1)
        d0, c0 = dfs_in[s], cfs_in[s]
        df_g = int(d0) if not np.isnan(d0) else len(g_ids)
        cf_g = int(c0) if not np.isnan(c0) else int(tf_tot.sum())
        out["df"][gi], out["cf"][gi], out["n"][gi] = df_g, cf_g, len(g_ids)
        nb = (len(g_ids) + block - 1) // block
        counts = np.full(nb, block, dtype=np.int64)
        counts[-1] = len(g_ids) - block * (nb - 1)
        out["doc_ids"][gi], offs_ids = blocked_gap_encode(g_ids, block)
        out["tfs"][gi] = varint_encode(tf_tot.astype(np.uint64))
        out["dls"][gi] = varint_encode(g_dls)
        out["block_min"][gi] = g_ids[::block].astype(np.int64)
        out["offs_ids"][gi] = offs_ids.astype(np.int32)
        out["offs_tfs"][gi] = segment_byte_offsets(
            tf_tot.astype(np.uint64), counts
        ).astype(np.int32)
        out["offs_dls"][gi] = segment_byte_offsets(g_dls, counts).astype(np.int32)
        out["tfs_cols"][gi] = [
            varint_encode(tfc[:, c].astype(np.uint64)) for c in range(n_fields)
        ]
        if has_pos:
            streams = []
            for c in range(n_fields):
                sel = np.flatnonzero(g_cols == c)  # doc-ordered already
                flat = (
                    np.concatenate(
                        [np.asarray(poscol[s + j], dtype=np.int64) for j in sel]
                    )
                    if sel.size
                    else np.empty(0, dtype=np.int64)
                )
                streams.append(delta_encode_segments(flat, tfc[:, c]))
            out["poss_cols"][gi] = streams
        idf = idf_fn(n_docs, df_g, variant)
        tf_norm = (tf_tot * (k1 + 1.0)) / (
            tf_tot + (k1 * ((1.0 - b) + ((b * g_dls.astype(np.float64)) / avgdl)))
        )
        contrib = idf * tf_norm
        pad = nb * block - len(g_ids)
        bm = np.pad(contrib, (0, pad), constant_values=-np.inf).reshape(nb, block)
        bm64 = bm.max(axis=1)
        bm32 = bm64.astype(np.float32)
        low = bm32.astype(np.float64) < bm64
        bm32[low] = np.nextafter(bm32[low], np.float32(np.inf))
        out["block_max"][gi] = bm32
    return pd.DataFrame(out)


def _make_partition_encoder(meta: IndexMeta):
    """Streaming partition encoder for ``mapInPandas`` over input
    repartitioned by (term, shard) and sorted within partitions by
    (term, shard, doc_id).

    Encodes MANY groups per Arrow batch (numpy boundary detection) —
    unlike per-group applyInPandas, whose per-group invocation overhead
    dominates when the vocabulary is large (hundreds of thousands of
    tiny posting lists). A group can straddle Arrow batches, so each
    batch's final (possibly incomplete) group is carried into the next
    batch; the last group flushes at end of partition.
    """
    frame_fn = _encode_groups_frame_mc if meta.fields else _encode_groups_frame

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            terms = pdf["term"].to_numpy()
            shards = pdf["shard"].to_numpy()
            change = np.flatnonzero(
                (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
            ) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(pdf)]))
            # hold back the final group — it may continue in the next batch
            if len(starts) == 1:
                carry = pdf
                continue
            carry = pdf.iloc[starts[-1]:]
            yield frame_fn(meta, pdf, starts[:-1], ends[:-1])
        if carry is not None and not carry.empty:
            yield frame_fn(meta, carry.reset_index(drop=True), [0], [len(carry)])

    return encode


def merge_and_write(
    tf: DataFrame,
    out_dir: str,
    analyzer: str,
    n_buckets: int = 64,
    postings_per_shard: int = 1 << 20,
    block_size: int = BLOCK_SIZE,
    k1: float = BM25_K1,
    b: float = BM25_B,
    idf_variant: str = "okapi",
    mode: str = "overwrite",
    t0: float | None = None,
    merge_partitions: int | None = None,
    fields: tuple | list = (),
) -> IndexMeta:
    """Global merge phase over term-frequency runs (from a live SPIMI
    pass or from checkpointed segments): stats, df, sharded salted merge,
    varint encode, partitioned write. Three wide stages total.

    ``fields`` (multi-field runs from :func:`spimi_term_freqs_mc`): the
    tf relation then has one row per (doc, term, FIELD) and df counts
    DISTINCT docs; the encoder collapses field rows into per-doc streams
    (:func:`_encode_groups_frame_mc`)."""
    t0 = t0 or time.time()
    has_positions = "positions" in tf.columns
    mc = bool(fields)
    # doc_lens: every doc has exactly one sentinel row (term='') in the
    # SPIMI runs, so the doc-length table is a narrow FILTER — zero
    # shuffle — rather than a groupBy(doc_id) over the widest relation.
    # Written first (this is also the action that materializes a
    # persisted tf); global stats then come from the written (tiny)
    # parquet.
    doc_lens = tf.filter(F.col("term") == "").select("doc_id", "dl")
    doc_lens.write.mode(mode).parquet(f"{out_dir}/doc_lens")
    spark = tf.sparkSession
    row = (
        # explicit schema: an empty corpus writes a schema-less dir
        spark.read.schema("doc_id long, dl int").parquet(f"{out_dir}/doc_lens")
        .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"), F.sum("dl").alias("tot"))
        .collect()[0]
    )
    meta = IndexMeta(
        n_docs=int(row["n"]),
        avgdl=float(row["avgdl"] or 0.0),
        total_tokens=int(row["tot"] or 0),
        analyzer=analyzer,
        n_buckets=n_buckets,
        postings_per_shard=postings_per_shard,
        block_size=block_size,
        k1=k1,
        b=b,
        idf_variant=idf_variant,
        has_positions=has_positions,
        fields=tuple(fields),
    )

    # sentinel rows (term='') carry doc lengths above but never become
    # postings
    real = tf.filter(F.col("term") != "")
    # Global term stats are only REQUIRED ahead of the merge for HOT
    # terms (df > postings_per_shard): they must shard, and their merge
    # groups see only a slice so they can't count df locally. Cold terms
    # (the overwhelming majority of any vocabulary) land whole in one
    # merge group, where df/cf = the group itself. So: one map-side-
    # combined aggregate whose reduce output is tiny, a driver filter to
    # the few hot terms, and a BROADCAST left join — the big relation is
    # never shuffled for a join. Net: the build's only full-width
    # exchange is the merge repartition itself.
    dfs = real.groupBy("term").agg(
        # multi-field runs carry one row per (doc, term, FIELD): df is
        # DISTINCT docs there (two-phase partial distinct aggregation —
        # still map-side combined, output still one tiny row per term)
        (F.countDistinct("doc_id") if mc else F.count("*")).alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    hot = dfs.filter(F.col("df") > postings_per_shard)
    joined = (
        real.join(F.broadcast(hot), "term", "left")
        .withColumn(
            "n_shards",
            F.greatest(
                F.lit(1),
                F.ceil(F.coalesce(F.col("df"), F.lit(1)) / F.lit(postings_per_shard)).cast("int"),
            ),
        )
        .withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.col("n_shards")).cast("int"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
        .drop("n_shards")  # shave shuffle bytes: only shard/bucket ride on
    )
    # sorted-partition streaming merge: one shuffle keyed on (term, shard)
    # + in-partition sort, then a single mapInPandas that encodes many
    # groups per Arrow batch (see _make_partition_encoder). The partition
    # count is EXPLICIT: a column-only repartition lets AQE coalesce the
    # exchange down to a handful of tasks (compressed-size heuristic),
    # silently capping the encode stage's parallelism.
    n_merge_parts = merge_partitions or spark.sparkContext.defaultParallelism * 2
    out_schema = postings_schema(meta)
    sort_keys = ["term", "shard", "doc_id"] + (["col"] if mc else [])
    postings = (
        joined.repartition(n_merge_parts, "term", "shard")
        .sortWithinPartitions(*sort_keys)
        .mapInPandas(_make_partition_encoder(meta), out_schema)
    )
    # encoded postings are ~2 bytes/posting — a cheap extra shuffle keyed
    # on bucket turns tasks×buckets tiny files into one file per bucket
    # (faster writes now, fewer files to list/scan at query time)
    postings.repartition(n_buckets, "bucket").write.partitionBy("bucket").mode(
        mode
    ).parquet(f"{out_dir}/postings")

    # term_ubs sidecar: one (df, BM25 upper bound) row per term, read
    # back from the written postings with column pruning (term/df/
    # block_max only — the varint payloads never leave the scan). The
    # pruned serving path (operators/wand.py) memoizes this driver-side
    # so planning a MaxScore query schedules no metadata job.
    ubs = (
        spark.read.schema(out_schema).parquet(f"{out_dir}/postings")
        .groupBy("term")
        .agg(
            F.first("df").alias("df"),  # df is global, same on every shard
            F.max(F.array_max("block_max")).cast("double").alias("ub"),
            F.first("bucket").alias("bucket"),  # pure hash of term
        )
    )
    # ALWAYS overwrite: the sidecar is a full snapshot recomputed from the
    # complete postings — honoring a caller's mode='append' here would
    # stack snapshots, leaving duplicate rows per term (stale smaller ubs
    # could then understate the MaxScore bound → unsound pruning).
    # Range-partitioned + sorted by term so a prefix StartsWith pushdown
    # prunes to the matching files/row-groups (term-dictionary role).
    ubs.repartitionByRange(8, "term").sortWithinPartitions("term").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/term_ubs")
    n_terms = (
        spark.read.schema(TERM_UBS_SCHEMA).parquet(f"{out_dir}/term_ubs").count()
    )
    meta = replace(meta, n_terms=int(n_terms))

    # metadata through the Hadoop FS API (sources/fsio.py) — same
    # filesystem resolution as the parquet writers above, so hdfs://- or
    # s3a://-style out_dirs work end to end
    from sparkgrep.sources import fsio

    payload = asdict(meta) | {"build_wall_sec": round(time.time() - t0, 3)}
    fsio.write_text(f"{out_dir}/stats.json", json.dumps(payload, indent=2))
    return meta


def build_index(
    corpus: DataFrame,
    out_dir: str,
    analyzer: str = "simple",
    use_lang: bool = False,
    store_positions: bool = False,
    fields: list[str] | None = None,
    **merge_kw,
) -> IndexMeta:
    """One-shot index build: SPIMI pass + global merge.

    ``store_positions=True`` adds a per-posting token-position payload
    (``poss``) enabling phrase queries (reference supports quoted-phrase
    MATCH, test_message_manager.py:417-435); costs ~1 varint per token.

    ``fields`` indexes SEVERAL corpus columns as one FTS5-style
    multi-column index (the reference's FTS5 table shape —
    subject/body_text/sender, message_manager.py:101-110): queries gain
    column filters (``path:tok``) and per-column BM25 weights, with
    phrases/NEAR/'^' confined to a field exactly like SQLite. None keeps
    the classic single-'content' index, byte-for-byte."""
    t0 = time.time()
    if fields:
        tf = spimi_term_freqs_mc(
            corpus, list(fields), analyzer, use_lang, positions=store_positions
        )
    else:
        tf = spimi_term_freqs(corpus, analyzer, use_lang, positions=store_positions)
    # Re-deriving tf twice (doc_lens + merge) would re-run the tokenizer;
    # persist the SPIMI runs for the duration of the build.
    tf.persist()
    try:
        return merge_and_write(
            tf, out_dir, analyzer, t0=t0, fields=tuple(fields or ()), **merge_kw
        )
    finally:
        tf.unpersist()


def load_meta(index_dir: str) -> IndexMeta:
    from sparkgrep.sources import fsio

    d = json.loads(fsio.read_text(f"{index_dir}/stats.json"))
    d.pop("build_wall_sec", None)
    # v1 postings (no block-reset gaps / offsets) would decode silently
    # wrong under the v2 reader — refuse instead of filling defaults
    if int(d.get("version", 1)) < 2:
        raise ValueError(
            f"index at {index_dir!r} uses postings format "
            f"v{d.get('version', 1)}; this reader needs v2 — rebuild the "
            "index with build_index()"
        )
    return IndexMeta(**d)
