"""Pruned top-k serving: a MaxScore-style two-pass over the block-max
metadata stored in the index (north star's block-max WAND serving path;
doc-granularity pruning in v1, block-aligned skipping is future work —
blocks are position-aligned per shard, not docID-aligned across terms).

Soundness requires non-negative per-term contributions (idf variants
``fts5``/``lucene``; raw ``okapi`` can go negative, where the algorithm
transparently falls back to exact scoring):

1. Split query terms into **essential** E (highest upper bound first)
   and the rest R, where UB_t = max over shards of max(block_max) —
   the build-time per-block BM25 maxima.
2. Pass 1: exact scoring over E only; its kth score θ is a valid lower
   bound of the final kth score (contributions are ≥ 0, so adding R
   terms only raises scores).
3. If Σ_{t∈R} UB_t < θ, no doc outside pass 1's match set can reach the
   top-k. Candidates = pass-1 docs with s_E(doc) + Σ_R UB_t ≥ θ.
4. Pass 2: full scoring with the decode UDF filtering postings to the
   candidate set (broadcast numpy membership test inside the Arrow
   batch), then the standard fold + top-k.

Results are rank- and score-identical to the exact path by construction
(pass 2 recomputes true scores; pruning only removes docs provably
below θ) — pinned by tests/test_wand.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkgrep.functions.tokenizer import tokenize_py
from sparkgrep.functions.varint import varint_decode
from sparkgrep.operators.query import InvertedIndex
from sparkgrep.operators.score import idf as idf_fn


def _filtered_decode_gen(meta, candidates: np.ndarray):
    """Pass-2 decoder with TRUE block skipping: the v2 postings format
    stores per-block first-doc_ids (block_min) and byte offsets for all
    three varint streams, so only blocks whose doc-id range intersects
    the candidate set are decoded at all — pass-2 work is proportional
    to candidate-touching blocks, not to posting-list length."""
    k1, b, avgdl, n_docs = meta.k1, meta.b, meta.avgdl, meta.n_docs
    variant = meta.idf_variant
    cand = np.sort(candidates)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for r in pdf.itertuples():
                bmin = np.asarray(r.block_min, dtype=np.int64)
                # block holding each candidate (blocks partition the
                # sorted doc space: block i covers [bmin[i], bmin[i+1]))
                bi = np.searchsorted(bmin, cand, side="right") - 1
                sel = np.unique(bi[bi >= 0])
                if sel.size == 0:
                    continue
                o_ids = np.asarray(r.offs_ids, dtype=np.int64)
                o_tfs = np.asarray(r.offs_tfs, dtype=np.int64)
                o_dls = np.asarray(r.offs_dls, dtype=np.int64)
                buf_ids, buf_tfs, buf_dls = r.doc_ids, r.tfs, r.dls
                id_parts, tf_parts, dl_parts = [], [], []
                for i in sel:
                    # each block is independently decodable: gaps reset
                    # at the block head (first value absolute)
                    id_parts.append(
                        np.cumsum(
                            varint_decode(buf_ids[o_ids[i]:o_ids[i + 1]]).astype(np.int64)
                        )
                    )
                    tf_parts.append(varint_decode(buf_tfs[o_tfs[i]:o_tfs[i + 1]]))
                    dl_parts.append(varint_decode(buf_dls[o_dls[i]:o_dls[i + 1]]))
                ids = np.concatenate(id_parts)
                keep = np.searchsorted(cand, ids)
                keep = (keep < len(cand)) & (cand[np.clip(keep, 0, len(cand) - 1)] == ids)
                if not keep.any():
                    continue
                tfs = np.concatenate(tf_parts).astype(np.int64)[keep]
                dls = np.concatenate(dl_parts).astype(np.int64)[keep]
                ids = ids[keep]
                idf = idf_fn(n_docs, r.df, variant)
                contrib = idf * (tfs * (k1 + 1.0)) / (
                    tfs + (k1 * ((1.0 - b) + ((b * dls) / avgdl)))
                )
                outs.append(pd.DataFrame({"term": r.term, "doc_id": ids, "contrib": contrib}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return gen


def search_pruned(index: InvertedIndex, query_text: str, k: int = 10) -> DataFrame:
    """Top-k with MaxScore pruning; exact-path fallback when pruning is
    unsound (okapi idf) or unhelpful (Σ UB(rest) ≥ θ)."""
    spark = index.spark
    meta = index.meta
    terms = sorted(set(tokenize_py(query_text, meta.analyzer)))
    empty = spark.createDataFrame([], "rank int, doc_id long, score double")
    if not terms:
        return empty
    if meta.idf_variant == "okapi":
        return index.search(query_text, k)  # negative contribs → unsound

    # per-term upper bounds from block-max metadata (tiny collect:
    # one row per (term, shard))
    ub_rows = (
        index._matched(terms)
        .select("term", F.array_max("block_max").alias("ub"))
        .groupBy("term")
        .agg(F.max("ub").alias("ub"))
        .collect()
    )
    if not ub_rows:
        return empty
    ubs = sorted(((r["term"], float(r["ub"])) for r in ub_rows), key=lambda x: -x[1])
    if len(ubs) == 1:
        return index.search(query_text, k)

    # essential = top half by UB (simple, effective split)
    n_ess = max(1, (len(ubs) + 1) // 2)
    essential = sorted(t for t, _ in ubs[:n_ess])
    rest = sorted(t for t, _ in ubs[n_ess:])
    rest_ub = sum(u for _, u in ubs[n_ess:])

    # pass 1: exact partial scores over essential terms
    s1 = index._fold_scores(index._contribs(essential), essential)
    top1 = s1.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    if len(top1) < k or (top1 and rest_ub >= top1[-1]["score"]):
        # not enough matches to bound, or rest terms alone could beat θ
        return index.search(query_text, k)
    theta = top1[-1]["score"]

    # candidates: pass-1 docs whose best possible final score reaches θ
    cand_ids = np.array(
        [r["doc_id"] for r in s1.filter(F.col("score") + F.lit(rest_ub) >= theta).collect()],
        dtype=np.int64,
    )

    # pass 2: true scores over candidates only (filtered decode)
    matched = index._matched(terms)
    contribs = matched.mapInPandas(
        _filtered_decode_gen(meta, cand_ids), "term string, doc_id long, contrib double"
    )
    scored = index._fold_scores(contribs, terms)
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "doc_id", "score"
    )
