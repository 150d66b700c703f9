"""Streaming ingest: micro-batch index maintenance must converge to the
same index a one-shot batch build produces (SURVEY §2.10 rationale in
sparkgrep/streaming/__init__.py)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from sparkgrep.operators import score as S
from sparkgrep.operators import stats as ST
from sparkgrep.operators.query import InvertedIndex
from sparkgrep.plans.manifest import read_manifest
from sparkgrep.streaming import index_stream


def test_stream_index_equals_batch_build(spark, corpus, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "stream_idx")
    full = corpus.limit(120).cache()
    # two file "arrivals" in the landing zone
    full.filter(F.col("doc_id") < 60).coalesce(1).write.mode("overwrite").parquet(src)
    full.filter(F.col("doc_id") >= 60).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src)
    )
    q = index_stream(stream, out, analyzer="simple", n_buckets=4)
    q.awaitTermination(120)
    time.sleep(0.5)

    rows = read_manifest(out)
    assert len(rows) >= 2  # one manifest segment per micro-batch
    assert sum(m["n_docs"] for m in rows) == 120
    assert all(str(m["segment_id"]).startswith("stream-") for m in rows)

    idx = InvertedIndex(spark, out)
    assert idx.meta.n_docs == 120
    got = idx.search("hash join table", k=10).toPandas()
    tf = ST.term_freqs(full, "simple")
    stats = ST.corpus_stats(ST.doc_lengths(full, "simple"))
    want = S.search(tf, stats, "hash join table", k=10).toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert (got["score"].to_numpy() == want["score"].to_numpy()).all()
