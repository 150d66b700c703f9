"""spark-submit-able CLI: the full index lifecycle as subcommands.

Usage (local or on a cluster via ``spark-submit --py-files sparkgrep.zip``):

    python -m sparkgrep.cli build --input /root/testdata/sf0.01 --out /tmp/idx
    python -m sparkgrep.cli build --input ... --out ... --segments 16   # resumable
    python -m sparkgrep.cli build --input ... --out ... --fields repo,path,content
    python -m sparkgrep.cli query --index /tmp/idx --query "hash join" -k 10
    python -m sparkgrep.cli query --index /tmp/idx --mode expr \
        --query 'hash AND ("join order" OR merge*)' --pruned
    python -m sparkgrep.cli serve --index /tmp/idx --query "hash join"   # in-process
    python -m sparkgrep.cli append  --index /tmp/idx --batch b1 --input new_rows/
    python -m sparkgrep.cli delete  --index /tmp/idx --batch b2 --input old_rows/
    python -m sparkgrep.cli compact --index /tmp/idx
    python -m sparkgrep.cli metrics --index /tmp/idx

Reference analogue: the ingestion entry point (`python -m
src.email_categorizer.ingestion.ingestion inbox.jsonl`, Instructions.md),
the interactive search CLI (cli.py option flows), and the FTS5
INSERT/DELETE/UPDATE triggers (message_manager.py:113-137) — here the
O(batch) ``append``/``delete`` delta layers plus ``compact``.

``append``/``delete`` read a parquet of CORPUS-SHAPED rows (the columns
the index was built over, plus ``doc_id``): append requires ingest-
assigned doc_ids distinct from every prior batch; delete carries the
docs' ORIGINAL content (what the reference trigger's ``old.*`` holds).
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_weights(s: str | None):
    """``--weights 2.0,1.0,0.5`` (field order) or ``path=2,content=1``."""
    if not s:
        return None
    if "=" in s:
        return {
            k.strip(): float(v)
            for k, v in (part.split("=", 1) for part in s.split(","))
        }
    return [float(x) for x in s.split(",")]


def _print_hits(rows) -> None:
    for r in rows:
        print(f"{int(r['rank']):>3}  doc={int(r['doc_id']):<10}  score={r['score']:.6f}")


def _read_batch(spark, path: str, require: tuple[str, ...] = ("doc_id", "content")):
    df = spark.read.parquet(path)
    missing = [c for c in require if c not in df.columns]
    if missing:
        raise SystemExit(
            f"batch parquet {path!r} lacks column(s) {missing}: append/delete "
            "take corpus-shaped rows (ingest-assigned doc_id + the indexed "
            "columns; delete rows carry the docs' original content)"
        )
    return df


def main(argv: list[str] | None = None, spark=None) -> int:
    """Entry point. ``spark`` is injectable for in-process tests; when
    None a session is created (and stopped) here — under spark-submit
    the submitted ``--master`` is honored (see session.get_spark)."""
    p = argparse.ArgumentParser(prog="sparkgrep")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--input", required=True, help="sf dir containing documents.parquet")
    b.add_argument("--out", required=True)
    b.add_argument("--analyzer", default="simple",
                   help="simple | fts5 | code | trigram | unicode61; the "
                        "unicode61 family takes FTS5 tokenizer options, "
                        "e.g. \"fts5 remove_diacritics 2 tokenchars '-_'\"")
    b.add_argument("--buckets", type=int, default=64)
    b.add_argument("--postings-per-shard", type=int, default=1 << 20)
    b.add_argument("--idf", default="okapi", choices=["okapi", "fts5", "lucene"])
    b.add_argument("--segments", type=int, default=0,
                   help=">0: checkpointed resumable build with N segments")
    b.add_argument("--positions", action="store_true",
                   help="store token positions (enables phrase/NEAR queries)")
    b.add_argument("--fields", default=None,
                   help="comma-separated corpus columns for an FTS5-style "
                        "multi-column index (enables col: filters + per-"
                        "column bm25 weights)")
    b.add_argument("--prefix", default=None,
                   help="FTS5 prefix-index lengths, e.g. '2 3' — extra "
                        "aggregated posting lists so matching stem* "
                        "queries are single-term lookups")
    b.add_argument("--detail", default=None, choices=["full", "column", "none"],
                   help="FTS5 storage level: full=positions, column=per-"
                        "field tfs only, none=total streams only (colset "
                        "queries raise, FTS5 parity)")

    q = sub.add_parser("query", help="top-k BM25 search against a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--mode", default="or", choices=["or", "and", "expr"],
                   help="or: bag-of-words; and: conjunctive; expr: full "
                        "FTS5 grammar (AND/OR/NOT, \"phrases\", tok*, "
                        "parens, NEAR, col: filters)")
    q.add_argument("--pruned", action="store_true",
                   help="MaxScore dynamic pruning (bag-of-words queries; "
                        "exact-path fallback whenever pruning is unsound "
                        "or would not pay)")
    q.add_argument("--weights", default=None,
                   help="per-field bm25 weights on a multi-column index: "
                        "'2.0,1.0,...' (field order) or 'path=2,content=1'")

    sv = sub.add_parser(
        "serve",
        help="one-shot query on the in-process serving tier (ms latency; "
             "rank/score-identical to the distributed path)",
    )
    sv.add_argument("--index", required=True)
    sv.add_argument("--query", required=True)
    sv.add_argument("-k", type=int, default=10)
    sv.add_argument("--weights", default=None)
    sv.add_argument("--max-resident-df", type=int, default=None,
                    help="residency cap: terms with df above this are "
                         "answered by delegating to the distributed path")

    for name, hlp in (
        ("append", "O(batch) incremental append: the batch becomes a delta "
                    "layer; the base index is never read or rewritten"),
        ("delete", "O(batch) delete: rows carry the docs' ORIGINAL content "
                    "(the FTS5 delete-command model); creates a tombstone "
                    "layer"),
    ):
        d = sub.add_parser(name, help=hlp)
        d.add_argument("--index", required=True)
        d.add_argument("--input", required=True,
                       help="parquet of corpus-shaped rows (doc_id + indexed "
                            "columns)")
        d.add_argument("--batch", required=True,
                       help="idempotency key: replaying a batch id is a no-op")

    for name, hlp in (
        ("like", "SQL LIKE substring search accelerated by a trigram "
                  "index (candidates from the index, residual verify)"),
        ("glob", "SQLite GLOB search accelerated by a trigram index"),
    ):
        g = sub.add_parser(name, help=hlp)
        g.add_argument("--index", required=True,
                       help="index built with --analyzer trigram --positions")
        g.add_argument("--input", required=True, help="sf dir (the corpus)")
        g.add_argument("--pattern", required=True)
        g.add_argument("--case-insensitive", action="store_true")

    c = sub.add_parser(
        "compact",
        aliases=["optimize"],
        help="fold delta + tombstone layers back into one base layer "
             "(queries byte-identical before/after; re-enables MaxScore "
             "pruning)",
    )
    c.add_argument("--index", required=True)
    c.add_argument("--merge-partitions", type=int, default=None)

    mg = sub.add_parser(
        "merge",
        help="incrementally fold runs of delta layers together (FTS5's "
             "'merge'/'automerge' analogue: O(sum of deltas), base layer "
             "untouched, queries byte-identical before/after)",
    )
    mg.add_argument("--index", required=True)
    mg.add_argument("--merge-partitions", type=int, default=None)

    pg = sub.add_parser(
        "purge",
        help="surgical physical delete (FTS5 secure-delete analogue): "
             "remove tombstoned doc_ids from only the (term, shard) files "
             "that contain them — O(affected files), base mass untouched, "
             "queries byte-identical before/after",
    )
    pg.add_argument("--index", required=True)

    m = sub.add_parser("metrics", help="print per-segment lineage manifest")
    m.add_argument("--index", required=True)

    da = sub.add_parser(
        "delete-all",
        help="FTS5's 'delete-all' special command: empty the index in "
             "place, keeping its configuration (external-content shape: "
             "the corpus is untouched)",
    )
    da.add_argument("--index", required=True)

    rb = sub.add_parser(
        "rebuild",
        help="FTS5's 'rebuild' special command: re-index the corpus "
             "under the index's own configuration",
    )
    rb.add_argument("--index", required=True)
    rb.add_argument("--input", required=True, help="sf dir (the corpus)")

    sr = sub.add_parser(
        "set-rank",
        help="FTS5's 'rank' configuration option: persist a default "
             "rank function, e.g. --rank 'bm25(10.0, 5.0)' (per-field "
             "weights applied when a query passes none)",
    )
    sr.add_argument("--index", required=True)
    sr.add_argument("--rank", required=True)

    ic = sub.add_parser(
        "integrity-check",
        help="FTS5's integrity-check against external content: recompute "
             "the expected index relation from the corpus and report every "
             "discrepancy (empty output = consistent)",
    )
    ic.add_argument("--index", required=True)
    ic.add_argument("--input", required=True, help="sf dir (the corpus)")
    ic.add_argument("--positions", action="store_true",
                    help="also verify stored position lists")
    ic.add_argument("--use-lang", action="store_true")

    ab = sub.add_parser("ann-build", help="build the persisted ANN index")
    ab.add_argument("--input", required=True, help="sf dir containing embeddings.parquet")
    ab.add_argument("--out", required=True)
    ab.add_argument("--planes", type=int, default=4)
    ab.add_argument("--tables", type=int, default=16)

    aq = sub.add_parser("ann-query", help="top-k cosine search against the ANN index")
    aq.add_argument("--index", required=True)
    aq.add_argument("--vec-id", type=int, required=True,
                    help="query by an indexed vector's id")
    aq.add_argument("--input", required=True, help="sf dir (to fetch the query vector)")
    aq.add_argument("-k", type=int, default=10)
    aq.add_argument("--probe", type=int, default=1, help="multiprobe hamming radius")

    args = p.parse_args(argv)

    owns_session = spark is None
    if owns_session:
        from sparkgrep.session import get_spark

        spark = get_spark(f"sparkgrep-{args.cmd}")
    try:
        if args.cmd == "build":
            from sparkgrep.operators.index_build import build_index
            from sparkgrep.plans.manifest import build_index_checkpointed
            from sparkgrep.sources.corpus import load_corpus

            corpus = load_corpus(spark, args.input)
            kw = dict(
                analyzer=args.analyzer,
                n_buckets=args.buckets,
                postings_per_shard=args.postings_per_shard,
                idf_variant=args.idf,
                prefix=args.prefix,
            )
            if args.segments > 0:
                if args.fields:
                    raise SystemExit(
                        "--segments and --fields are mutually exclusive "
                        "(checkpointed multi-column builds: use one-shot)"
                    )
                if args.positions or args.detail:
                    # previously these flags were silently DISCARDED on
                    # the checkpointed path (the build succeeded without
                    # positions and phrase queries failed later with no
                    # hint why)
                    raise SystemExit(
                        "--segments does not support --positions/--detail "
                        "(the checkpointed SPIMI pass builds plain "
                        "positionless runs) — use a one-shot build"
                    )
                meta = build_index_checkpointed(
                    corpus, args.out, n_segments=args.segments, **kw
                )
            else:
                meta = build_index(
                    corpus,
                    args.out,
                    store_positions=args.positions,
                    fields=args.fields.split(",") if args.fields else None,
                    detail=args.detail,
                    **kw,
                )
            print(json.dumps(meta.__dict__, default=list))
        elif args.cmd == "query":
            from sparkgrep.operators.query import InvertedIndex

            idx = InvertedIndex(spark, args.index)
            if args.pruned:
                from sparkgrep.operators.wand import search_pruned

                if args.mode != "or" or args.weights:
                    raise SystemExit(
                        "--pruned applies to bag-of-words (--mode or, "
                        "default weights) queries"
                    )
                hits = search_pruned(idx, args.query, args.k)
            else:
                hits = idx.search(
                    args.query, args.k, mode=args.mode,
                    weights=_parse_weights(args.weights),
                )
            _print_hits(hits.collect())
        elif args.cmd == "serve":
            from sparkgrep.operators.query import InvertedIndex
            from sparkgrep.operators.serve import LocalServer

            srv = LocalServer(
                InvertedIndex(spark, args.index),
                max_resident_df=args.max_resident_df,
            )
            hits = srv.search_expr(
                args.query, args.k, weights=_parse_weights(args.weights)
            )
            _print_hits(hits.to_dict("records"))
        elif args.cmd in ("like", "glob"):
            from sparkgrep.operators.like import glob_search, like_search
            from sparkgrep.operators.query import InvertedIndex
            from sparkgrep.sources.corpus import load_corpus

            idx = InvertedIndex(spark, args.index)
            corpus = load_corpus(spark, args.input)
            if args.cmd == "like":
                res = like_search(
                    idx, corpus, args.pattern,
                    case_insensitive=args.case_insensitive,
                )
            else:
                if args.case_insensitive:
                    raise SystemExit("GLOB is case-sensitive (SQLite semantics)")
                res = glob_search(idx, corpus, args.pattern)
            for r in res.collect():
                print(int(r["doc_id"]))
        elif args.cmd == "append":
            from sparkgrep.plans.manifest import append_batch_delta

            meta = append_batch_delta(
                _read_batch(spark, args.input), args.index, args.batch
            )
            print(json.dumps(meta.__dict__, default=list))
        elif args.cmd == "delete":
            from sparkgrep.plans.manifest import delete_batch_delta

            meta = delete_batch_delta(
                _read_batch(spark, args.input), args.index, args.batch
            )
            print(json.dumps(meta.__dict__, default=list))
        elif args.cmd in ("compact", "optimize"):
            from sparkgrep.plans.manifest import compact_index

            meta = compact_index(
                spark, args.index, merge_partitions=args.merge_partitions
            )
            print(json.dumps(meta.__dict__, default=list))
        elif args.cmd == "merge":
            from sparkgrep.plans.manifest import merge_delta_layers

            meta = merge_delta_layers(
                spark, args.index, merge_partitions=args.merge_partitions
            )
            print(json.dumps(meta.__dict__, default=list))
        elif args.cmd == "purge":
            from sparkgrep.plans.purge import purge_deleted

            print(json.dumps(purge_deleted(spark, args.index)))
        elif args.cmd == "metrics":
            from sparkgrep.plans.manifest import read_manifest

            for row in read_manifest(args.index):
                print(json.dumps(row))
        elif args.cmd == "delete-all":
            from sparkgrep.plans.manifest import delete_all

            meta = delete_all(spark, args.index)
            print(json.dumps(meta.__dict__, default=list))
        elif args.cmd == "rebuild":
            from sparkgrep.plans.manifest import rebuild
            from sparkgrep.sources.corpus import load_corpus

            meta = rebuild(load_corpus(spark, args.input), args.index)
            print(json.dumps(meta.__dict__, default=list))
        elif args.cmd == "set-rank":
            from sparkgrep.plans.manifest import set_rank

            meta = set_rank(args.index, args.rank)
            print(json.dumps(meta.__dict__, default=list))
        elif args.cmd == "integrity-check":
            from sparkgrep.operators.integrity import integrity_check
            from sparkgrep.sources.corpus import load_corpus

            bad = integrity_check(
                load_corpus(spark, args.input), args.index,
                use_lang=args.use_lang, check_positions=args.positions,
            ).limit(101).collect()
            for r in bad[:100]:
                print(json.dumps(r.asDict()))
            print(json.dumps({
                "ok": not bad,
                "discrepancies_shown": min(len(bad), 100),
                "truncated": len(bad) > 100,
            }))
            if bad:
                raise SystemExit(2)
        elif args.cmd == "ann-build":
            from sparkgrep.operators.ann_index import build_ann_index

            emb = spark.read.parquet(f"{args.input}/embeddings.parquet")
            meta = build_ann_index(
                emb, args.out, n_planes=args.planes, n_tables=args.tables
            )
            print(json.dumps(meta.__dict__))
        elif args.cmd == "ann-query":
            from sparkgrep.operators.ann_index import AnnIndex

            emb = spark.read.parquet(f"{args.input}/embeddings.parquet")
            row = emb.filter(f"vec_id = {args.vec_id}").first()
            if row is None:
                print(f"vec_id {args.vec_id} not found", file=sys.stderr)
                return 1
            qvec = [float(x) for x in row["embedding"]]
            idx = AnnIndex(spark, args.index)
            for r in idx.search(qvec, args.k, probe_hamming=args.probe).collect():
                print(f"vec={r['vec_id']:<10}  cosine={r['cosine']:.6f}")
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
