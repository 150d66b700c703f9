"""Structured Streaming ingest → incremental index maintenance.

The reference has no streaming surface: its index freshness comes from
per-row SQLite triggers on INSERT (``message_manager.py:113-137``), i.e.
synchronous maintenance inside the write path (SURVEY §2.10 declared
streaming out of the reference's scope). The engine's analogue at
cluster scale is micro-batch maintenance: a streaming corpus source
(files landing on object storage, Kafka, ...) drives
``foreachBatch`` → :func:`sparkgrep.plans.manifest.append_batch`, which
SPIMI-processes the new docs into their own manifest segment and
re-runs the cheap stateless global merge — results after each batch are
byte-identical to a from-scratch build over everything seen so far
(pinned by tests/test_checkpoint.py + tests/test_streaming.py).

Exactly-once: Structured Streaming may replay a micro-batch after a
failure; ``append_batch`` is idempotent per batch id (completed segments
are recorded in the lineage manifest and skipped on replay), so replays
do not double-index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def index_stream(
    corpus_stream: DataFrame,
    out_dir: str,
    analyzer: str = "simple",
    use_lang: bool = False,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    **merge_kw,
) -> StreamingQuery:
    """Start a streaming query that maintains the inverted index at
    ``out_dir`` from a STREAMING corpus DataFrame (must carry the ingest
    columns: doc_id, content[, lang]; doc_ids across batches must be
    distinct, as for any append).

    ``available_now=True`` drains everything currently available and
    stops (backfill / test mode); False runs continuously with the
    source's default trigger.
    """
    from sparkgrep.plans.manifest import append_batch

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_batch(
            batch_df,
            out_dir,
            batch_id=f"stream-{batch_id}",
            analyzer=analyzer,
            use_lang=use_lang,
            **merge_kw,
        )

    writer = (
        corpus_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir or f"{out_dir}/_stream_checkpoint")
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
