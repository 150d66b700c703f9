"""FTS5 MULTI-COLUMN parity against real SQLite.

The reference's FTS5 table indexes three columns —
``(subject, body_text, sender)``, ``message_manager.py:101-110`` — and
its bm25() supports per-column weights. Rounds 1-3 generalized this to a
single concatenated content column (exact for default weights); this
suite pins the engine's native multi-field indexes against SQLite on the
reference's OWN 80-email corpus in its REAL column shape:

- column filters: ``subject:tok``, ``{subject sender}:tok``,
  ``-subject:tok``, ``col:"phrase"``, ``col:stem*``, ``col:^anchor``,
  ``col:NEAR(...)``, ``col:(...)`` distribution, NOT of filtered groups;
- per-column bm25 weights (``bm25(t, w0, w1, w2)``), including zero and
  missing trailing weights;
- the pinned multi-column scoring model: tf = Σ_c w_c·tf_c over the
  colset, dl = the UNWEIGHTED row token total, df (per atom) = the
  colset-restricted matching-doc count, phrases/NEAR/'^' confined to a
  single column (field-relative positions).

Scores must agree ≤1e-9 and ranks exactly (engine positive-is-better =
negated FTS5)."""

from __future__ import annotations

import base64
import json
import sqlite3

import pandas as pd
import pytest

from sparkgrep.operators.index_build import build_index
from sparkgrep.operators.query import InvertedIndex

SAMPLE = "/root/reference/sample-messages.jsonl"
FIELDS = ["subject", "body_text", "sender"]

# (match expression, weights or None) — weights in FIELDS order
MC_QUERIES = [
    ("receipt", None),
    ("subject:receipt", None),
    ("{subject sender}:amazon", None),
    ("-subject:order", None),
    ('subject:"order confirmation"', None),
    ("sender:amazon*", None),
    ("subject:^your", None),
    ("^receipt", None),
    ("subject:NEAR(order shipped, 5)", None),
    ("NEAR(order confirmation, 3)", None),
    ("receipt NOT subject:order", None),
    ("shipping NOT subject:(order tracking)", None),
    ("subject:(receipt OR invoice) AND payment", None),
    ("receipt", (10.0, 1.0, 0.5)),
    ("order shipping", (0.0, 2.0, 1.0)),
    ('subject:order OR body_text:"your order"', (3.0, 1.0, 1.0)),
    ("subject:receipt subject:receipt", None),   # duplicated filtered atom
    ("amazon OR sender:amazon", None),           # same term, two colsets
    ("{subject body_text sender}:order", None),  # explicit full colset
    ("zqzqzq", None),
]


@pytest.fixture(scope="module")
def emails() -> pd.DataFrame:
    rows = []
    with open(SAMPLE) as f:
        for i, line in enumerate(f):
            if not line.strip():
                continue
            m = json.loads(line)
            body = base64.b64decode(m["body"]).decode("utf-8", errors="replace")
            rows.append(
                {
                    "doc_id": i,
                    "subject": m["subject"],
                    "body_text": body,
                    "sender": m["from"],
                }
            )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def fts5_mc(emails):
    db = sqlite3.connect(":memory:")
    db.execute(
        "CREATE VIRTUAL TABLE msgs USING fts5"
        "(subject, body_text, sender, tokenize='porter')"
    )
    db.executemany(
        "INSERT INTO msgs(rowid, subject, body_text, sender) VALUES (?,?,?,?)",
        list(emails.itertuples(index=False, name=None)),
    )
    return db


@pytest.fixture(scope="module")
def mc_index(spark, emails, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mc_idx") / "idx")
    build_index(
        spark.createDataFrame(emails),
        out,
        analyzer="fts5",
        store_positions=True,
        fields=FIELDS,
        idf_variant="fts5",
        n_buckets=8,
    )
    return InvertedIndex(spark, out)


def _ref_rows(db, match: str, weights, k: int):
    sel = (
        "bm25(msgs)"
        if weights is None
        else f"bm25(msgs, {weights[0]}, {weights[1]}, {weights[2]})"
    )
    return db.execute(
        f"SELECT rowid, {sel} FROM msgs WHERE msgs MATCH ? "
        f"ORDER BY {sel} ASC, rowid ASC LIMIT ?",
        (match, k),
    ).fetchall()


@pytest.mark.parametrize("query,weights", MC_QUERIES)
def test_multicol_expr_matches_sqlite(fts5_mc, mc_index, query, weights):
    k = 15
    ref = _ref_rows(fts5_mc, query, weights, k)
    got = mc_index.search_expr(
        query, k=k, weights=list(weights) if weights else None
    ).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in ref], query
    for (_, fs), gs in zip(ref, got["score"]):
        assert abs(-fs - gs) <= 1e-9, (query, fs, gs)


def test_multicol_or_mode_matches_sqlite(fts5_mc, mc_index):
    """Bag-of-words fast path on a multi-field index: stored total-tf
    stream + stored any-column df reproduce FTS5's default weights."""
    terms = "receipt order shipping"
    ref = _ref_rows(fts5_mc, " OR ".join(terms.split()), None, 20)
    got = mc_index.search(terms, k=20, mode="or").toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in ref]
    for (_, fs), gs in zip(ref, got["score"]):
        assert abs(-fs - gs) <= 1e-9


def test_multicol_missing_weights_default_to_one(fts5_mc, mc_index):
    """FTS5 pads missing trailing bm25() args with 1.0 (pinned)."""
    ref = _ref_rows(fts5_mc, "receipt", (2.0, 1.0, 1.0), 15)
    got = mc_index.search_expr("receipt", k=15, weights=[2.0]).toPandas()
    assert got["doc_id"].tolist() == [r[0] for r in ref]
    for (_, fs), gs in zip(ref, got["score"]):
        assert abs(-fs - gs) <= 1e-9


def test_unknown_column_raises(mc_index):
    with pytest.raises(ValueError, match="no such column"):
        mc_index.search_expr("nope:receipt", k=5)


def test_weights_on_single_field_index_raise(spark, tmp_path, emails):
    out = str(tmp_path / "sf")
    corpus = spark.createDataFrame(
        emails.assign(content=emails.subject)[["doc_id", "content"]]
    )
    build_index(corpus, out, analyzer="fts5", n_buckets=4)
    idx = InvertedIndex(spark, out)
    with pytest.raises(ValueError, match="multi-field"):
        idx.search("receipt", k=5, weights=[2.0])


@pytest.fixture(scope="module")
def mc_server(mc_index):
    from sparkgrep.operators.serve import LocalServer

    return LocalServer(mc_index)


@pytest.mark.parametrize("query,weights", MC_QUERIES)
def test_serving_tier_multicol_bitwise(mc_server, mc_index, query, weights):
    """The in-process multi-field mirror (per-field resident streams,
    fixed-order weight fold) is BITWISE-identical to the distributed
    expr path for every query class."""
    w = list(weights) if weights else None
    got = mc_server.search_expr(query, k=15, weights=w)
    ref = mc_index.search_expr(query, k=15, weights=w).toPandas()
    assert got["doc_id"].tolist() == ref["doc_id"].tolist(), query
    assert (got["score"].to_numpy() == ref["score"].to_numpy()).all(), query


def test_serving_tier_multicol_residency_fallback(mc_index):
    """A cap below every df forces the distributed fallback — results
    must stay identical (weights ride through the delegation)."""
    from sparkgrep.operators.serve import LocalServer

    capped = LocalServer(mc_index, max_resident_df=0)
    got = capped.search_expr("subject:receipt OR amazon", k=10, weights=[2.0])
    ref = mc_index.search_expr(
        "subject:receipt OR amazon", k=10, weights=[2.0]
    ).toPandas()
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert (got["score"].to_numpy() == ref["score"].to_numpy()).all()
