from sparkgrep.functions.porter import porter_stem
from sparkgrep.functions.tokenizer import (
    ANALYZERS,
    CODE_STOPLISTS,
    SIMPLE_SPLIT_RE,
    simple_tokens_col,
    tokenize_py,
    tokenize_series,
    tokens_col,
)

__all__ = [
    "ANALYZERS",
    "CODE_STOPLISTS",
    "SIMPLE_SPLIT_RE",
    "porter_stem",
    "simple_tokens_col",
    "tokenize_py",
    "tokenize_series",
    "tokens_col",
]
