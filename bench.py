"""sparkgrep benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-phase seconds...}, "sf": ...,
   "index_build_docs_per_sec": ..., "scaling": {...}}

Phases (on $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1):
- index_build      — full SPIMI → sharded merge → varint postings build
                     over the documents corpus replicated ×MULT
                     (deterministic doc_id offsets; no external data)
- bm25_p95         — p95 single-query latency over QUERY_SET against the
                     built index (serving path)
- bm25_batch       — all queries in one batched scan
- minhash_lsh      — LSH candidate-pair job
- simhash          — corpus simhash job

Scaling evidence (north rule's N vs 4N clusters, sandbox substitution
per driver instruction): the SAME index-build job runs in two
subprocesses at local[8] and local[32]; we report docs/sec at both and
efficiency = (T8 / T32) / 4.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
SPARKGREP_BENCH_MULT (corpus replication, default 10),
SPARKGREP_SKIP_SCALING=1 to skip the subprocess runs.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MULT = int(os.environ.get("SPARKGREP_BENCH_MULT", "10"))

# Shuffle/spill scratch on tmpfs: this sandbox's /tmp is slow virtio ext4
# and disk writeback (D-state kworkers) otherwise dominates and distorts
# measurements. Subprocess scaling runs inherit this via the environment.
if os.path.isdir("/dev/shm") and "SPARKGREP_LOCAL_DIR" not in os.environ:
    os.environ["SPARKGREP_LOCAL_DIR"] = "/dev/shm/sparkgrep_scratch"


def _load1() -> float:
    try:
        return float(open("/proc/loadavg").read().split()[0])
    except OSError:
        return -1.0

QUERY_SET = [
    "hash join table window",
    "spark query filter sort",
    "the fast scan",
    "merge batch stream",
    "customer order line part",
    "group window agg",
    "slow small value",
    "data row column key",
]


def scaled_corpus(spark, sf_dir: str, mult: int):
    """documents.parquet replicated ×mult with deterministic doc_id
    offsets — same text distribution, mult× the rows."""
    from pyspark.sql import functions as F

    from sparkgrep.sources.corpus import documents_as_corpus, load_documents, with_ingest_columns

    docs = load_documents(spark, sf_dir)
    n = docs.count()
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    big = (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n)
        .drop("rep")
    )
    return with_ingest_columns(documents_as_corpus(big)), n * mult


def prepare_input(spark, tmp_dir: str) -> tuple[str, int]:
    """Materialize the scaled corpus to parquet ONCE (outside any timed
    region) — the measured job is then a pure read→index build, like a
    real pipeline reading from storage."""
    corpus, n_docs = scaled_corpus(spark, SF_DIR, MULT)
    path = f"{tmp_dir}/corpus"
    corpus.repartition(64).write.mode("overwrite").parquet(path)
    return path, n_docs


def run_build(cpus: int, out_dir: str, corpus_path: str | None = None) -> dict:
    """One measured index build at local[cpus]. JVM startup and input
    materialization excluded."""
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.session import get_spark

    spark = get_spark(f"sparkgrep-bench-{cpus}", master=f"local[{cpus}]")
    if corpus_path is None:
        corpus_path, n_docs = prepare_input(spark, tempfile.mkdtemp(prefix="sparkgrep_in_"))
    else:
        n_docs = spark.read.parquet(corpus_path).count()
    corpus = spark.read.parquet(corpus_path)
    load_before = _load1()
    t0 = time.time()
    build_index(corpus, out_dir, analyzer="simple", n_buckets=32)
    dt = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "n_docs": n_docs, "sec": round(dt, 3),
            "docs_per_sec": round(n_docs / dt, 1),
            "loadavg_before": load_before, "loadavg_after": _load1()}


def main() -> None:
    if "--build-only" in sys.argv:  # subprocess mode for scaling runs
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        cpath = (
            sys.argv[sys.argv.index("--corpus") + 1] if "--corpus" in sys.argv else None
        )
        out = tempfile.mkdtemp(prefix=f"sparkgrep_bench_{cpus}_") + "/idx"
        print("RESULT " + json.dumps(run_build(cpus, out, cpath)))
        return

    from sparkgrep.operators.dedup import lsh_candidate_pairs, simhash32
    from sparkgrep.operators.query import InvertedIndex
    from sparkgrep.session import get_spark

    t_start = time.time()
    timings: dict[str, float] = {}

    # --- index build at SPARK_GRAFT_CPUS
    out = tempfile.mkdtemp(prefix="sparkgrep_bench_") + "/idx"
    build = run_build(CPUS, out)
    timings["index_build"] = build["sec"]

    spark = get_spark("sparkgrep-bench", master=f"local[{CPUS}]")

    # --- query latency (serving path, one query at a time)
    idx = InvertedIndex(spark, out)
    lat = []
    for q in QUERY_SET:
        t0 = time.time()
        idx.search(q, k=10).collect()
        lat.append(time.time() - t0)
    lat_sorted = sorted(lat)
    timings["bm25_p50"] = round(statistics.median(lat), 3)
    timings["bm25_p95"] = round(lat_sorted[max(0, int(len(lat) * 0.95) - 1)], 3)

    # --- batched serving
    t0 = time.time()
    idx.search_batch([(f"q{i}", q, 10) for i, q in enumerate(QUERY_SET)]).collect()
    timings["bm25_batch"] = round(time.time() - t0, 3)

    # --- code-analyzer build (north-star workload: identifier splitting,
    # lang stoplists, hot-token sharding) on the deterministic synthetic
    # code corpus
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.sources.corpus import synth_corpus

    code_n = 20000
    code_corpus = synth_corpus(spark, code_n, seed=3).repartition(CPUS * 2).cache()
    code_corpus.count()  # materialize outside the timed window
    t0 = time.time()
    build_index(
        code_corpus,
        tempfile.mkdtemp(prefix="sparkgrep_code_") + "/idx",
        analyzer="code",
        idf_variant="lucene",
        n_buckets=32,
        postings_per_shard=4096,
    )
    dt = time.time() - t0
    timings["code_index_build"] = round(dt, 3)
    code_docs_per_sec = round(code_n / dt, 1)
    code_corpus.unpersist()

    # --- pipeline ops on raw sf documents
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.time()
    lsh_candidate_pairs(docs, n_hashes=16, bands=4).count()
    timings["minhash_lsh"] = round(time.time() - t0, 3)
    t0 = time.time()
    simhash32(docs).count()
    timings["simhash"] = round(time.time() - t0, 3)
    spark.stop()

    # --- scaling runs: same build at local[8] and local[32].
    # This sandbox carries unrelated background load (loadavg ~8-17 at
    # idle), so single runs are noisy; take the MINIMUM over reps per
    # level (least-interference sample) before computing efficiency.
    scaling = {}
    if os.environ.get("SPARKGREP_SKIP_SCALING") != "1":
        reps = int(os.environ.get("SPARKGREP_SCALING_REPS", "3"))
        runs: dict[int, dict] = {}
        # materialize the input once; share across all scaling subprocesses
        from sparkgrep.session import get_spark

        prep = get_spark("sparkgrep-bench-prep", master=f"local[{CPUS}]")
        shared_path, _ = prepare_input(prep, tempfile.mkdtemp(prefix="sparkgrep_in_"))
        prep.stop()
        # INTERLEAVE the two levels so slow-varying external load hits
        # both roughly equally, then take the per-level minimum
        for _ in range(reps):
            for cpus in (8, 32):
                proc = subprocess.run(
                    [sys.executable, __file__, "--build-only", "--cpus", str(cpus),
                     "--corpus", shared_path],
                    capture_output=True, text=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
                for line in proc.stdout.splitlines():
                    if line.startswith("RESULT "):
                        r = json.loads(line[len("RESULT "):])
                        if cpus not in runs or r["sec"] < runs[cpus]["sec"]:
                            runs[cpus] = r
        if 8 in runs and 32 in runs:
            eff = (runs[8]["sec"] / runs[32]["sec"]) / 4.0
            scaling = {
                "local8": runs[8],
                "local32": runs[32],
                "reps": reps,
                "efficiency_8_to_32": round(eff, 3),
            }

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "sparkgrep index-build + BM25 serving + pipeline ops",
        "value": round(time.time() - t_start, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "index_build_docs": build["n_docs"],
        "index_build_docs_per_sec": build["docs_per_sec"],
        "code_index_build_docs": code_n,
        "code_index_build_docs_per_sec": code_docs_per_sec,
        "scaling": scaling,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
