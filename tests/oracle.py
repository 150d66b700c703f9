"""Slow, obviously-correct pure-pandas BM25 oracle (SURVEY §5.2).

Same tokenizer functions as the engine (tokenize_py), Okapi BM25
k1=1.2 b=0.75, contributions summed in sorted term order, ties broken by
ascending doc_id. The Spark engine must match docIDs exactly
(rank-identical) and scores to 1e-9.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from sparkgrep import BM25_B, BM25_K1
from sparkgrep.functions.tokenizer import tokenize_py


def bm25_oracle(
    docs: pd.DataFrame,  # columns: doc_id, content
    query_text: str,
    k: int = 10,
    analyzer: str = "simple",
    k1: float = BM25_K1,
    b: float = BM25_B,
    idf_variant: str = "okapi",
) -> pd.DataFrame:
    toks = {int(r.doc_id): tokenize_py(r.content, analyzer) for r in docs.itertuples()}
    dls = {d: len(t) for d, t in toks.items()}
    n = len(toks)
    avgdl = sum(dls.values()) / n if n else 0.0
    tfs = {d: Counter(t) for d, t in toks.items()}

    qterms = sorted(set(tokenize_py(query_text, analyzer)))
    dfs = {t: sum(1 for c in tfs.values() if t in c) for t in qterms}

    def idf(df_):
        x = (n - df_ + 0.5) / (df_ + 0.5)
        if idf_variant == "okapi":
            return math.log(x)
        if idf_variant == "fts5":
            v = math.log(x)
            return v if v > 0.0 else 1e-6
        return math.log1p(x)

    rows = []
    for d, c in tfs.items():
        score = 0.0
        matched = False
        for t in qterms:  # sorted term order == engine's array_sort fold
            tf = c.get(t, 0)
            if tf == 0 or dfs[t] == 0:
                continue
            matched = True
            denom = tf + k1 * (1 - b + b * dls[d] / avgdl)
            score += idf(dfs[t]) * tf * (k1 + 1) / denom
        if matched:
            rows.append((d, score))
    rows.sort(key=lambda r: (-r[1], r[0]))
    out = pd.DataFrame(rows[:k], columns=["doc_id", "score"])
    out.insert(0, "rank", range(1, len(out) + 1))
    return out


def bm25_expr_oracle(
    docs: pd.DataFrame,  # columns: doc_id, content
    query_text: str,
    k: int = 10,
    analyzer: str = "simple",
    k1: float = BM25_K1,
    b: float = BM25_B,
    idf_variant: str = "okapi",
) -> pd.DataFrame:
    """Pure-pandas oracle for the query language (OR-of-AND over
    term/phrase units, FTS5 unit-scoring model) — mirrors
    InvertedIndex._search_parsed float-op order exactly."""
    from sparkgrep.functions.querylang import parse_query

    pq = parse_query(query_text, analyzer)
    toks = {int(r.doc_id): tokenize_py(r.content, analyzer) for r in docs.itertuples()}
    dls = {d: len(t) for d, t in toks.items()}
    n = len(toks)
    avgdl = sum(dls.values()) / n if n else 0.0

    from sparkgrep.functions.querylang import star_slots

    def _starts(doc_toks, unit):
        # one instance evaluator for every slot mix: starred slots
        # (single-stem prefix, '"a b"*' tail, 'a* + b' internal)
        # prefix-match their token, plain slots match exactly
        L = len(unit.terms)
        star = set(star_slots(unit))
        return [
            i
            for i in range(len(doc_toks) - L + 1)
            if all(
                doc_toks[i + j].startswith(t) if j in star else doc_toks[i + j] == t
                for j, t in enumerate(unit.terms)
            )
        ]

    def unit_tf(doc_toks, unit) -> int:
        if unit.anchored:
            # FTS5 '^': only instances at token position 0 count → tf∈{0,1}
            return int(0 in _starts(doc_toks, unit))
        return len(_starts(doc_toks, unit))

    units = pq.units()
    utf = {u.uid: {d: unit_tf(t, u) for d, t in toks.items()} for u in units}
    utf = {uid: {d: c for d, c in m.items() if c > 0} for uid, m in utf.items()}
    dfs = {uid: len(m) for uid, m in utf.items() if m}

    from sparkgrep.functions.querylang import near_ok, near_supported

    def unit_starts(doc_toks, unit):
        return _starts(doc_toks, unit)

    # NEAR groups → constrained member atoms (rows only for satisfying
    # docs, tf = supported instances, df = member's full presence)
    near_groups = pq.near_groups()
    near_uids = {}
    for gid, grp in enumerate(near_groups):
        uids_g = [f"n{gid}:{u.uid}" for u in grp.phrases]
        near_uids[gid] = uids_g
        lens = [len(u.terms) for u in grp.phrases]
        maps = [dict() for _ in grp.phrases]
        any_sat = False
        for d, t in toks.items():
            sup = near_supported(
                [unit_starts(t, u) for u in grp.phrases], lens, grp.n
            )
            if sup is None:
                continue
            any_sat = True
            for i, cnt in enumerate(sup):
                maps[i][d] = cnt
        if any_sat:
            for i, (u, nuid) in enumerate(zip(grp.phrases, uids_g)):
                utf[nuid] = maps[i]
                dfs[nuid] = dfs[u.uid]  # FULL presence df (SQLite-pinned)

    def idf(df_):
        x = (n - df_ + 0.5) / (df_ + 0.5)
        if idf_variant == "okapi":
            return math.log(x)
        if idf_variant == "fts5":
            v = math.log(x)
            return v if v > 0.0 else 1e-6
        return math.log1p(x)

    def conj_sat(d, conj) -> bool:
        if not conj.includes and not conj.nears:
            return False  # bare-NOT conjunct matches nothing
        return (
            all(u.uid in dfs and d in utf[u.uid] for u in conj.includes)
            and all(
                near_uids[near_groups.index(grp)][0] in utf
                and d in utf[near_uids[near_groups.index(grp)][0]]
                for grp in conj.nears
            )
            and not any(u.uid in dfs and d in utf[u.uid] for u in conj.excludes)
            and not any(
                any(conj_sat(d, c) for c in e) for e in conj.exclude_exprs
            )
        )

    scoring_uids = []  # per top-level conjunct: the atoms it scores
    for conj in pq.disjuncts:
        s = {u.uid for u in conj.includes}
        for grp in conj.nears:
            s.update(near_uids[near_groups.index(grp)])
        scoring_uids.append(s)

    rows = []
    for d in toks:
        matched = any(conj_sat(d, conj) for conj in pq.disjuncts)
        if not matched:
            continue
        score = 0.0
        for uid in sorted(dfs):  # uid-sorted fold order, engine-identical
            tf = utf[uid].get(d, 0)
            # FTS5 gating: an atom contributes only when some disjunct
            # scoring it matches this doc
            gated = any(
                uid in s and conj_sat(d, conj)
                for conj, s in zip(pq.disjuncts, scoring_uids)
            )
            if tf == 0 or not gated:
                score += 0.0
                continue
            denom = tf + (k1 * ((1.0 - b) + ((b * dls[d]) / avgdl)))
            score += idf(dfs[uid]) * (tf * (k1 + 1.0)) / denom
        rows.append((d, score))
    rows.sort(key=lambda r: (-r[1], r[0]))
    out = pd.DataFrame(rows[:k], columns=["doc_id", "score"])
    out.insert(0, "rank", range(1, len(out) + 1))
    return out
