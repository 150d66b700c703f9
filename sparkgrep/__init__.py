"""sparkgrep — a PySpark-native inverted-index + BM25 full-text engine.

Re-derives the lexical retrieval tier of hsiung-bf/gmailcat-takehome
(SQLite FTS5 + porter + bm25(), reference
``src/email_categorizer/data_managers/message_manager.py:101-264``) as an
idiomatic Spark DataFrame system:

- code-aware tokenization in vectorized Arrow/pandas UDFs
  (:mod:`sparkgrep.functions.tokenizer`)
- single-pass corpus statistics (:mod:`sparkgrep.operators.stats`)
- SPIMI posting-list construction with docID gap + varint compression and
  a salted two-phase merge (:mod:`sparkgrep.operators.index_build`)
- exact Okapi BM25 top-k scoring, k1=1.2 b=0.75
  (:mod:`sparkgrep.operators.score`) and an index-backed serving path
  (:mod:`sparkgrep.operators.query`)
- training-data pipeline operators: dedup, similarity search, text
  analysis, multimodal plumbing (:mod:`sparkgrep.operators`)

Nothing here ports the reference's execution machinery; the reference
defines *what* is computed (see SURVEY.md), Spark defines *how*.
"""

__version__ = "0.1.0"

BM25_K1 = 1.2  # reference default: SQLite FTS5 bm25() (message_manager.py:246)
BM25_B = 0.75
