"""Low-latency serving tier: resident postings, no Spark job per query.

The distributed query path (`operators/query.py`) pays one Spark job per
search (~0.8-1 s of scheduling in local mode) — the right trade at
10^12 docs where a query must fan out across executors, but wrong for an
interactive serving tier. The reference answers in ~ms because SQLite
holds the whole index in one process (`message_manager.py:225-264`,
BASELINE.md ~50 ms DB ops).

:class:`LocalServer` is the engine's analogue of a serving NODE: it
pulls the postings rows for a query's terms out of the index ONCE
(bucket-pruned Spark fetch on first touch, cached thereafter) and scores
in numpy. On a cluster this is exactly what a serving shard does — hold
its resident term partitions in memory, answer from them. Results are
rank- and score-identical to ``InvertedIndex.search`` by construction:
identical per-term contributions, summed in the same sorted-term
left-associated order (``wand.seq_fold``, one strictly sequential add
per term — NOT reduceat/np.sum, whose pairwise summation diverges from
the Spark fold by 1 ulp), same (score desc, doc_id asc) tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sparkgrep.functions.tokenizer import tokenize_py
from sparkgrep.functions.varint import blocked_gap_decode, varint_decode
from sparkgrep.operators.query import InvertedIndex
from sparkgrep.operators.score import idf as idf_fn


class LocalServer:
    """Driver-resident serving handle over a built index."""

    def __init__(self, index: InvertedIndex):
        self.index = index
        self.meta = index.meta
        # term -> list of decoded shards [(df, doc_ids, tfs, dls)];
        # terms with no postings cache an empty list (negative cache)
        self._cache: dict[str, list[tuple[int, np.ndarray, np.ndarray, np.ndarray]]] = {}

    def _fetch(self, terms: list[str]) -> None:
        missing = [t for t in terms if t not in self._cache]
        if not missing:
            return
        rows = (
            self.index._matched(missing)
            .select("term", "df", "n", "doc_ids", "tfs", "dls")
            .collect()
        )
        for t in missing:
            self._cache[t] = []
        for r in rows:
            self._cache[r["term"]].append(
                (
                    int(r["df"]),
                    blocked_gap_decode(
                        r["doc_ids"], int(r["n"]), self.meta.block_size
                    ).astype(np.int64),
                    varint_decode(r["tfs"]).astype(np.int64),
                    varint_decode(r["dls"]).astype(np.int64),
                )
            )

    def warm(self, queries: list[str]) -> "LocalServer":
        """Prefetch postings for a query workload in one Spark job."""
        terms = sorted({t for q in queries for t in tokenize_py(q, self.meta.analyzer)})
        self._fetch(terms)
        return self

    def search(self, query_text: str, k: int = 10) -> pd.DataFrame:
        """(rank, doc_id, score) — numpy only after the postings are
        resident; bitwise-equal to ``InvertedIndex.search``."""
        meta = self.meta
        terms = sorted(set(tokenize_py(query_text, meta.analyzer)))
        empty = pd.DataFrame({"rank": pd.Series(dtype="int32"),
                              "doc_id": pd.Series(dtype="int64"),
                              "score": pd.Series(dtype="float64")})
        if not terms:
            return empty
        self._fetch(terms)
        k1, b, avgdl, n_docs = meta.k1, meta.b, meta.avgdl, meta.n_docs
        ids_parts, tix_parts, contrib_parts = [], [], []
        for ti, t in enumerate(terms):
            shards = self._cache[t]
            if not shards:
                continue
            # df in the payload is the GLOBAL document frequency (same on
            # every shard row) — no aggregation needed
            idf = idf_fn(n_docs, shards[0][0], meta.idf_variant)
            for _, ids, tfs, dls in shards:
                contrib = idf * (tfs * (k1 + 1.0)) / (
                    tfs + (k1 * ((1.0 - b) + ((b * dls) / avgdl)))
                )
                ids_parts.append(ids)
                tix_parts.append(np.full(len(ids), ti, dtype=np.int32))
                contrib_parts.append(contrib)
        if not ids_parts:
            return empty
        from sparkgrep.operators.wand import seq_fold

        ids = np.concatenate(ids_parts)
        tix = np.concatenate(tix_parts)
        contribs = np.concatenate(contrib_parts)
        # strictly sequential per-doc adds in term order — identical
        # float addition order to the distributed fold (1-ulp-exact)
        docs, scores = seq_fold(ids, tix, contribs, len(terms))
        # top-k: score desc, doc_id asc
        sel = np.lexsort((docs, -scores))[:k]
        out = pd.DataFrame(
            {
                "rank": np.arange(1, len(sel) + 1, dtype=np.int32),
                "doc_id": docs[sel],
                "score": scores[sel],
            }
        )
        return out
