"""Query language (AND / OR / quoted phrase) + positional index tests.

Reference spec: FTS5 MATCH semantics as pinned by the reference's own
tests (test_message_manager.py:417-435 — implicit AND, explicit AND/OR,
quoted phrases; :599-610 — empty MATCH raises)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkgrep.functions.querylang import Conjunct, Unit, parse_query
from sparkgrep.functions.varint import delta_decode_segments, delta_encode_segments
from sparkgrep.operators.index_build import build_index
from sparkgrep.operators.query import InvertedIndex

from tests.oracle import bm25_expr_oracle, bm25_oracle


# ---------------------------------------------------------------------------
# parser


def test_parse_implicit_and():
    pq = parse_query("foo bar")
    assert pq.disjuncts == (Conjunct((Unit(("foo",)), Unit(("bar",)))),)


def test_parse_explicit_and_or():
    pq = parse_query("foo AND bar OR baz")
    assert pq.disjuncts == (
        Conjunct((Unit(("foo",)), Unit(("bar",)))),
        Conjunct((Unit(("baz",)),)),
    )


def test_parse_phrase():
    pq = parse_query('"big data" spark')
    assert pq.disjuncts == (Conjunct((Unit(("big", "data")), Unit(("spark",)))),)
    assert pq.has_phrase()


def test_parse_single_word_phrase_degrades_to_term():
    pq = parse_query('"spark"')
    assert pq.disjuncts == (Conjunct((Unit(("spark",)),)),)
    assert not pq.has_phrase()


def test_parse_not():
    pq = parse_query("foo NOT bar")
    assert pq.disjuncts == (Conjunct((Unit(("foo",)),), (Unit(("bar",)),)),)
    # NOT binds the next unit only (FTS5 highest precedence)
    pq = parse_query("foo NOT bar baz")
    assert pq.disjuncts == (
        Conjunct((Unit(("foo",)), Unit(("baz",))), (Unit(("bar",)),)),
    )
    # chained NOTs, and NOT of a phrase
    pq = parse_query('foo NOT bar NOT "big data"')
    assert pq.disjuncts == (
        Conjunct((Unit(("foo",)),), (Unit(("bar",)), Unit(("big", "data")))),
    )
    # per-disjunct scope
    pq = parse_query("foo NOT bar OR baz")
    assert pq.disjuncts == (
        Conjunct((Unit(("foo",)),), (Unit(("bar",)),)),
        Conjunct((Unit(("baz",)),)),
    )
    # exclude units participate in units() (their match sets are needed)
    assert [u.uid for u in parse_query("foo NOT bar").units()] == ["t:bar", "t:foo"]


def test_parse_empty_and_garbage():
    assert parse_query("").disjuncts == ()
    assert parse_query("  !!! ").disjuncts == ()
    assert parse_query('""').disjuncts == ()


def test_units_dedup_and_order():
    # the repeated phrase is a second textual occurrence — a distinct
    # atom (FTS5 scores each occurrence separately); units() stays
    # uid-sorted and identity-deduped
    pq = parse_query('"a b" c OR "a b" d')
    uids = [u.uid for u in pq.units()]
    assert uids == sorted(uids)
    assert uids == ["p:a b", "p:a b~1", "t:c", "t:d"]


# ---------------------------------------------------------------------------
# positions codec


def test_delta_segments_roundtrip():
    vals = np.array([0, 3, 9, 1, 2, 5, 7, 4], dtype=np.int64)
    counts = np.array([3, 4, 1], dtype=np.int64)
    buf = delta_encode_segments(vals, counts)
    out = delta_decode_segments(buf, counts)
    assert (out == vals).all()


def test_delta_segments_empty():
    assert delta_decode_segments(b"", np.array([], dtype=np.int64)).size == 0


# ---------------------------------------------------------------------------
# index-backed AND / phrase / expr


@pytest.fixture(scope="module")
def pos_index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("posidx") / "idx")
    build_index(corpus, out, analyzer="simple", n_buckets=8, store_positions=True)
    return InvertedIndex(spark, out)


@pytest.fixture(scope="module")
def docs_pdf(corpus):
    return (
        corpus.select("doc_id", F.col("content").alias("content"))
        .toPandas()
        .sort_values("doc_id")
    )


EXPR_QUERIES = [
    "hash join",                 # implicit AND
    "hash AND join AND table",   # explicit AND
    "hash OR window",            # OR
    '"hash join"',               # phrase
    '"hash join" OR window',     # phrase OR term
    '"the window" scan',         # phrase AND term
    "hash NOT window",           # NOT term
    'hash NOT "the window"',     # NOT phrase
    "hash NOT window OR scan NOT table",  # NOT per disjunct
    "wind*",                     # prefix
    "ha* scan",                  # prefix AND term
    '"hash join" OR wind*',      # phrase OR prefix
    "scan NOT wind*",            # NOT prefix
    "(hash OR window) scan",     # parens → DNF
    '("hash join" OR window) NOT table',  # parens + phrase + NOT
    "(hash OR wind*) (scan OR table)",    # product of groups
    "NEAR(hash window, 4)",      # proximity
    "NEAR(hash window)",         # default N=10
    'NEAR("hash join" table, 6)',  # phrase member
    "NEAR(hash wind*, 5)",       # prefix member
    "NEAR(hash window, 3) OR scan",  # NEAR in a disjunction
    "NEAR(hash window, 8) NOT table",  # NEAR + NOT
    # duplicated atoms: each textual occurrence scores separately (FTS5)
    "hash hash",
    "hash OR hash",
    '"hash join" OR "hash join"',
    "(hash OR window) (hash OR window)",
    "NEAR(hash hash, 3)",            # duplicate members within a group
    "NEAR(hash window, 4) OR NEAR(hash window, 4)",
]


@pytest.mark.parametrize("q", EXPR_QUERIES)
def test_expr_matches_pandas_oracle(pos_index, docs_pdf, q):
    got = pos_index.search_expr(q, k=10).toPandas()
    want = bm25_expr_oracle(docs_pdf, q, k=10)
    assert got["doc_id"].tolist() == want["doc_id"].tolist(), q
    assert np.allclose(got["score"], want["score"], rtol=0, atol=1e-9)


def test_and_mode_equals_single_conjunct_expr(pos_index):
    a = pos_index.search("hash join table", k=10, mode="and").toPandas()
    b = pos_index.search_expr("hash AND join AND table", k=10).toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert (a["score"].to_numpy() == b["score"].to_numpy()).all()


def test_and_is_subset_of_or_with_full_match(pos_index, docs_pdf):
    anded = pos_index.search("hash join", k=1000, mode="and").toPandas()
    assert len(anded) > 0
    toks = {
        int(r.doc_id): set(str(r.content).lower().split())
        for r in docs_pdf.itertuples()
    }
    for d in anded["doc_id"]:
        assert {"hash", "join"} <= toks[int(d)]


def test_phrase_requires_adjacency(pos_index, docs_pdf):
    res = pos_index.search_expr('"hash join"', k=1000).toPandas()
    assert len(res) > 0
    texts = {int(r.doc_id): str(r.content).lower() for r in docs_pdf.itertuples()}
    for d in res["doc_id"]:
        assert "hash join" in texts[int(d)]


def test_phrase_needs_positional_index(spark, corpus, tmp_path):
    out = str(tmp_path / "nopos")
    build_index(corpus.limit(50), out, analyzer="simple", n_buckets=4)
    idx = InvertedIndex(spark, out)
    with pytest.raises(ValueError, match="store_positions"):
        idx.search_expr('"hash join"', k=5).collect()


def test_strict_empty_raises(pos_index):
    with pytest.raises(ValueError, match="empty"):
        pos_index.search("   ", k=5, strict=True)
    with pytest.raises(ValueError, match="empty"):
        pos_index.search_expr("", k=5, strict=True)
    assert pos_index.search("   ", k=5).count() == 0


def test_or_mode_unchanged_by_positions(pos_index, docs_pdf):
    """An index with positions serves plain OR queries identically to the
    oracle (the extra poss column must not perturb the OR path)."""
    a = pos_index.search("hash join table", k=10).toPandas()
    want = bm25_oracle(docs_pdf, "hash join table", k=10)
    assert a["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(a["score"], want["score"], rtol=0, atol=1e-9)


# parser robustness: never crash on arbitrary input (hypothesis)
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_parse_query_never_crashes(s):
    try:
        pq = parse_query(s)
    except ValueError:
        return  # documented: DNF complexity ceiling
    for conj in pq.disjuncts:
        assert conj.includes or conj.excludes  # no empty conjuncts
        for u in conj.includes + conj.excludes:
            assert u.terms  # no empty units


def test_serve_expr_matches_distributed(pos_index):
    """LocalServer.search_expr must be rank- AND score-identical (bitwise)
    to the distributed search_expr for the full query language."""
    from sparkgrep.operators.serve import LocalServer

    srv = LocalServer(pos_index).warm(EXPR_QUERIES)
    for q in EXPR_QUERIES + ["zqzqzq", "NOT hash", '"zq zq" OR hash']:
        got = srv.search_expr(q, k=10)
        want = pos_index.search_expr(q, k=10).toPandas()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), q
        assert (got["score"].to_numpy() == want["score"].to_numpy()).all(), q


def test_serve_expr_strict_and_latency(pos_index):
    import os
    import time

    from sparkgrep.operators.serve import LocalServer

    srv = LocalServer(pos_index).warm(EXPR_QUERIES)
    with pytest.raises(ValueError, match="empty"):
        srv.search_expr("", k=5, strict=True)
    srv.search_expr(EXPR_QUERIES[0], k=10)
    t0 = time.time()
    for q in EXPR_QUERIES:
        srv.search_expr(q, k=10)
    per_q = (time.time() - t0) / len(EXPR_QUERIES)
    # wall-clock bound only under an explicit opt-in: this box is
    # co-tenant (observed +60% timing inflation under concurrent load)
    # and latency belongs to the bench, not the correctness suite
    if os.environ.get("SPARKGREP_ASSERT_LATENCY"):
        assert per_q < 0.25, f"warm expr serve took {per_q:.3f}s/query"


def test_parse_duplicate_occurrences():
    """FTS5 scores each textual occurrence of an atom separately
    (probed: 'alpha alpha' = 'alpha OR alpha' = 2× alpha): the lexer
    numbers repeats into distinct atoms; the first occurrence keeps its
    plain uid so duplicate-free queries are completely unchanged."""
    from sparkgrep.functions.querylang import parse_query

    (c,) = parse_query("alpha alpha").disjuncts
    assert [u.uid for u in c.includes] == ["t:alpha", "t:alpha~1"]
    pq = parse_query("alpha OR alpha")
    assert [d.includes[0].uid for d in pq.disjuncts] == ["t:alpha", "t:alpha~1"]
    # DNF distribution SHARES one occurrence across disjuncts
    pq = parse_query("(foo OR bar) baz")
    assert {u.uid for u in pq.units()} == {"t:foo", "t:bar", "t:baz"}
    pq = parse_query("(a OR b) AND (a OR b)")
    assert sorted(u.uid for u in pq.units()) == ["t:a", "t:a~1", "t:b", "t:b~1"]
    # duplicated NEAR groups stay distinct atom sets
    gs = parse_query("NEAR(a b, 2) NEAR(a b, 2)").near_groups()
    assert len(gs) == 2 and (gs[0].occ, gs[1].occ) == (0, 1)
    # duplicate members WITHIN a group get local occurrence suffixes
    (g,) = parse_query("NEAR(a a, 1)").near_groups()
    assert [u.uid for u in g.phrases] == ["t:a", "t:a~1"]


def test_parse_parens():
    # (a OR b) c → DNF: (a c) OR (b c)
    pq = parse_query("(foo OR bar) baz")
    assert pq.disjuncts == (
        Conjunct((Unit(("foo",)), Unit(("baz",)))),
        Conjunct((Unit(("bar",)), Unit(("baz",)))),
    )
    # nesting + phrases
    pq = parse_query('("big data" OR spark) AND (fast OR slow)')
    assert len(pq.disjuncts) == 4
    assert all(len(c.includes) == 2 for c in pq.disjuncts)
    # NOT of an OR-group of units: exact unit-level exclusion
    pq = parse_query("foo NOT (bar OR baz)")
    assert pq.disjuncts == (
        Conjunct((Unit(("foo",)),), (Unit(("bar",)), Unit(("baz",)))),
    )
    # unbalanced parens recover, never raise
    assert parse_query("(foo bar").disjuncts == (
        Conjunct((Unit(("foo",)), Unit(("bar",)))),
    )
    assert parse_query("foo) (bar").disjuncts == (
        Conjunct((Unit(("foo",)),)),
        Conjunct((Unit(("bar",)),)),
    )
    # a repeated atom inside a group is a second textual occurrence
    # (FTS5 scores it separately): distribution yields two disjuncts
    # whose foo atoms differ only in occurrence; bar is the SAME
    # occurrence shared across both (scored once via gating)
    pq = parse_query("(foo OR foo) bar")
    assert pq.disjuncts == (
        Conjunct((Unit(("foo",)), Unit(("bar",)))),
        Conjunct((Unit(("foo",), occ=1), Unit(("bar",)))),
    )
    # complexity ceiling is a documented error
    blowup = " ".join(["(a OR b OR c OR d)"] * 4)  # 4^4 = 256 conjuncts
    with pytest.raises(ValueError, match="too complex"):
        parse_query(blowup)


def test_parse_near_and_near_ok():
    from sparkgrep.functions.querylang import NearGroup, near_ok

    pq = parse_query("NEAR(foo bar, 4)")
    (conj,) = pq.disjuncts
    # members live in the group only — they score as CONSTRAINED atoms
    # (supported instances), not as plain includes
    assert conj.includes == ()
    assert conj.nears == (NearGroup((Unit(("foo",)), Unit(("bar",))), 4),)
    # default N, phrase member, degenerate single member
    assert parse_query('NEAR("a b" c)').disjuncts[0].nears[0].n == 10
    assert parse_query("NEAR(foo, 3)").disjuncts == (
        Conjunct((Unit(("foo",)),)),
    )
    # the FTS5 sliding test: between-token count, best selection
    assert near_ok([[0], [4]], [1, 1], 3) and not near_ok([[0], [4]], [1, 1], 2)
    assert near_ok([[0, 9], [4]], [1, 1], 3)     # second 'a' irrelevant
    assert near_ok([[1], [4]], [2, 1], 1)        # phrase end participates
    assert not near_ok([[], [4]], [1, 1], 99)    # absent member
    assert near_ok([[0], [2], [4]], [1, 1, 1], 3)
    assert not near_ok([[0], [2], [4]], [1, 1, 1], 2)


def test_near_matches_pandas_oracle_matchset(pos_index, docs_pdf):
    """NEAR restricts the match set to proximity-satisfying docs; member
    atoms score with CONSTRAINED tf (supported instances only — FTS5
    semantics), which equals the plain AND score exactly when every
    instance is supported."""
    near = pos_index.search_expr("NEAR(hash window, 3)", k=1000).toPandas()
    anded = pos_index.search_expr("hash window", k=1000).toPandas()
    assert set(near["doc_id"]) <= set(anded["doc_id"])
    # exact scores pinned by the pandas oracle (which is itself pinned
    # against real SQLite FTS5 in test_fts5_parity); no inequality vs the
    # plain AND — okapi idf can be negative, flipping the direction
    oracle = bm25_expr_oracle(docs_pdf, "NEAR(hash window, 3)", k=1000)
    assert near["doc_id"].tolist() == oracle["doc_id"].tolist()
    assert np.allclose(near["score"], oracle["score"], rtol=0, atol=1e-9)
    # positions honestly checked against raw text
    toks = {
        int(r.doc_id): str(r.content).lower().split()
        for r in docs_pdf.itertuples()
    }
    from sparkgrep.functions.querylang import near_ok

    for d, ts in toks.items():
        hp = [i for i, t in enumerate(ts) if t == "hash"]
        wp = [i for i, t in enumerate(ts) if t == "window"]
        expect = bool(hp and wp and near_ok([hp, wp], [1, 1], 3))
        assert (d in set(near["doc_id"])) == expect, d


def test_parse_prefix():
    pq = parse_query("wind* scan")
    assert pq.disjuncts == (
        Conjunct((Unit(("wind",), prefix=True), Unit(("scan",)))),
    )
    assert [u.uid for u in pq.units()] == ["t:scan", "x:wind"]
    # '*' inside quotes is literal (tokenizer strips it): plain phrase
    assert not any(
        u.prefix for c in parse_query('"wind* scan"').disjuncts for u in c.includes
    )
    # bare '*' vanishes
    assert parse_query("*").disjuncts == ()


def test_prefix_matches_term_expansion(pos_index, docs_pdf):
    """wind* must score each doc with tf = Σ tf(term startswith wind)."""
    res = pos_index.search_expr("wind*", k=1000).toPandas()
    toks = {
        int(r.doc_id): [t for t in str(r.content).lower().split()]
        for r in docs_pdf.itertuples()
    }
    want = {d for d, ts in toks.items() if any(t.startswith("wind") for t in ts)}
    assert set(res["doc_id"]) == want and len(want) > 0


def test_bare_not_matches_nothing(pos_index):
    # FTS5 errors on leading NOT; the relational reading is "no includes
    # → unsatisfiable conjunct"
    assert pos_index.search_expr("NOT hash", k=10).count() == 0


def test_not_excludes_docs(pos_index, docs_pdf):
    res = pos_index.search_expr("hash NOT window", k=1000).toPandas()
    assert len(res) > 0
    toks = {
        int(r.doc_id): set(str(r.content).lower().split())
        for r in docs_pdf.itertuples()
    }
    for d in res["doc_id"]:
        assert "hash" in toks[int(d)] and "window" not in toks[int(d)]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(["foo", "bar", '"a b"', "OR", "AND", "NOT", "!!",
                                 "run*", "*", "(", ")"]),
                max_size=8))
def test_parse_query_grammar_tokens(parts):
    pq = parse_query(" ".join(parts))
    uids = [u.uid for u in pq.units()]
    assert uids == sorted(set(uids))
