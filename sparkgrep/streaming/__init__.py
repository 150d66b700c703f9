"""Streaming surface of the engine.

The reference itself is batch-only (SQLite triggers keep its FTS index
fresh inside the INSERT path — no stream processor exists to mirror;
SURVEY §2.10). What a 100 TB deployment actually needs is continuous
index maintenance from a landing stream, provided here by
:func:`sparkgrep.streaming.ingest.index_stream` (Structured Streaming
``foreachBatch`` → segment append → stateless re-merge).
"""

from sparkgrep.streaming.ingest import index_stream

__all__ = ["index_stream"]
