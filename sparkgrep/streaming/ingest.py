"""Structured Streaming ingest → incremental index maintenance.

The reference has no streaming surface: its index freshness comes from
per-row SQLite triggers on INSERT (``message_manager.py:113-137``), i.e.
synchronous maintenance inside the write path (SURVEY §2.10 declared
streaming out of the reference's scope). The engine's analogue at
cluster scale is micro-batch maintenance: a streaming corpus source
(files landing on object storage, Kafka, ...) drives ``foreachBatch`` →
:func:`sparkgrep.plans.manifest.append_batch_delta`: each batch becomes
an O(batch) log-structured delta layer (the base index is never
re-merged per batch — round 3's cost-proportionality finding), served
alongside the base with exact global statistics; ``compact_every``
bounds the layer count via periodic compaction. Results after each
batch are bit-identical to a from-scratch build over everything seen so
far (pinned by tests/test_streaming.py + tests/test_delta_append.py).

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
    delta: bool = True,
    compact_every: int | None = None,
    merge_every: int | None = None,
    op_col: str | None = None,
    **merge_kw,
) -> StreamingQuery:
    """Start a streaming query that maintains the inverted index at
    ``out_dir`` from a STREAMING corpus DataFrame (must carry the ingest
    columns: doc_id, content[, lang]; doc_ids across batches must be
    distinct, as for any append).

    ``delta=True`` (default) makes each micro-batch an O(batch)
    log-structured delta layer (``manifest.append_batch_delta``) — the
    freshness cost is proportional to the BATCH, never the corpus —
    with ``compact_every`` bounding the layer count (after that many
    unmerged delta + tombstone layers, one compaction folds them back so
    MaxScore pruning re-engages). ``merge_every`` is FTS5's 'automerge'
    analogue at the layer level: after that many delta layers, fold
    mergeable delta RUNS together (``manifest.merge_delta_layers`` —
    O(sum of deltas), base untouched) so read fan-out stays bounded at a
    fraction of compaction's O(corpus) price; combine both knobs with
    ``merge_every`` small and ``compact_every`` large for the LSM-tier
    cadence a big deployment runs. ``delta=False`` keeps the round-2
    behavior (full re-merge per batch: simplest, but O(corpus) freshness
    cost; inserts only).

    ``op_col`` turns the stream into a CDC feed — the full trigger set
    the reference mirrors into its FTS table
    (``message_manager.py:113-137``): each row carries 'insert' or
    'delete' in that column; a delete row carries the doc's ORIGINAL
    content (what the AFTER DELETE trigger's ``old.*`` holds), and an
    UPDATE is the trigger's pair — a 'delete' row with the old content
    plus an 'insert' row with the new content on the same doc_id.
    Deletes apply FIRST within a micro-batch (tombstone layer), then
    inserts (delta layer, newer than the tombstone), so same-batch
    delete+insert serves the new version. A micro-batch is an UNORDERED
    set (DataFrames carry no row order): delete-then-insert per doc_id
    is the one intra-batch sequence with defined semantics — at most one
    insert row per doc_id per batch (validated), and a feed that needs
    finer event ordering (e.g. insert then delete of the same doc within
    one batch) must split those events across batches. Requires
    ``delta=True``.

    ``available_now=True`` drains everything currently available and
    stops (backfill / test mode); False runs continuously with the
    source's default trigger.
    """
    from pyspark.sql import functions as F

    from sparkgrep.plans.manifest import (
        append_batch,
        append_batch_delta,
        compact_index,
        delete_batch_delta,
        merge_delta_layers,
    )

    if op_col and not delta:
        raise ValueError("op_col (CDC deletes) requires delta=True")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if delta:
            meta = None
            if op_col:
                # ops are validated eagerly: NULL or unknown values were
                # previously dropped (NULL: three-valued logic fails both
                # filters) or silently treated as inserts — silent data
                # loss either way
                bad = batch_df.filter(
                    F.col(op_col).isNull()
                    | ~F.col(op_col).isin("insert", "delete")
                )
                if not bad.isEmpty():
                    vals = [
                        r[0]
                        for r in bad.select(op_col).distinct().limit(5).collect()
                    ]
                    raise ValueError(
                        f"CDC op column {op_col!r} must be 'insert' or "
                        f"'delete'; batch {batch_id} carries {vals!r}"
                    )
                dels = batch_df.filter(F.col(op_col) == "delete").drop(op_col)
                if not dels.isEmpty():
                    meta = delete_batch_delta(
                        dels,
                        out_dir,
                        batch_id=f"stream-{batch_id}",
                        use_lang=use_lang,
                    )
                ins = batch_df.filter(F.col(op_col) == "insert").drop(op_col)
                dup = ins.groupBy("doc_id").count().filter("count > 1")
                if not dup.isEmpty():
                    ids = [
                        r[0] for r in dup.select("doc_id").limit(5).collect()
                    ]
                    raise ValueError(
                        f"batch {batch_id}: multiple insert rows share "
                        f"doc_id(s) {ids!r} — a micro-batch is an "
                        "unordered set serving one final version per "
                        "doc; split multi-update sequences across batches"
                    )
            else:
                ins = batch_df
            if not ins.isEmpty():
                meta = append_batch_delta(
                    ins,
                    out_dir,
                    batch_id=f"stream-{batch_id}",
                    analyzer=analyzer,
                    use_lang=use_lang,
                    **merge_kw,
                )
            if (
                compact_every
                and meta is not None
                and len(meta.layers or ()) + len(meta.tombstones or ())
                >= compact_every
            ):
                compact_index(batch_df.sparkSession, out_dir)
            elif (
                merge_every
                and meta is not None
                and len(meta.layers or ()) >= merge_every
            ):
                merge_delta_layers(batch_df.sparkSession, out_dir)
        else:
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
