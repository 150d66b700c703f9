"""spark-submit-able CLI: build / query / metrics subcommands.

Usage (local or on a cluster via ``spark-submit --py-files sparkgrep.zip``):

    python -m sparkgrep.cli build --input /root/testdata/sf0.01 --out /tmp/idx
    python -m sparkgrep.cli build --input ... --out ... --segments 16   # resumable
    python -m sparkgrep.cli query --index /tmp/idx --query "hash join" -k 10
    python -m sparkgrep.cli metrics --index /tmp/idx

Reference analogue: the ingestion entry point (`python -m
src.email_categorizer.ingestion.ingestion inbox.jsonl`, Instructions.md)
and the interactive search CLI (cli.py option flows).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sparkgrep")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--input", required=True, help="sf dir containing documents.parquet")
    b.add_argument("--out", required=True)
    b.add_argument("--analyzer", default="simple", choices=["simple", "fts5", "code"])
    b.add_argument("--buckets", type=int, default=64)
    b.add_argument("--postings-per-shard", type=int, default=1 << 20)
    b.add_argument("--idf", default="okapi", choices=["okapi", "fts5", "lucene"])
    b.add_argument("--segments", type=int, default=0,
                   help=">0: checkpointed resumable build with N segments")
    b.add_argument("--positions", action="store_true",
                   help="store token positions (enables phrase queries)")

    q = sub.add_parser("query", help="top-k BM25 search against a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--mode", default="or", choices=["or", "and", "expr"],
                   help="or: bag-of-words; and: conjunctive; expr: full "
                        'query language (AND/OR/"quoted phrases")')

    m = sub.add_parser("metrics", help="print per-segment lineage manifest")
    m.add_argument("--index", required=True)

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
            )
            if args.segments > 0:
                meta = build_index_checkpointed(
                    corpus, args.out, n_segments=args.segments, **kw
                )
            else:
                meta = build_index(
                    corpus, args.out, store_positions=args.positions, **kw
                )
            print(json.dumps(meta.__dict__))
        elif args.cmd == "query":
            from sparkgrep.operators.query import InvertedIndex

            idx = InvertedIndex(spark, args.index)
            for r in idx.search(args.query, args.k, mode=args.mode).collect():
                print(f"{r['rank']:>3}  doc={r['doc_id']:<10}  score={r['score']:.6f}")
        elif args.cmd == "metrics":
            from sparkgrep.plans.manifest import read_manifest

            for row in read_manifest(args.index):
                print(json.dumps(row))
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
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
