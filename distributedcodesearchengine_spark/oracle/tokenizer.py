"""Pure-Python reference tokenizer — THE semantic contract.

Faithful transcription of the reference tokenizer
(``codesearch/storage/bm25_index.py:42-72``). Order matters: the two
camelCase splits run BEFORE lowercasing (bm25_index.py:53-57); then
separators ``[_\\-./\\\\]`` -> space, non-``[a-z0-9\\s]`` -> space,
whitespace split, and a minimum token length of 2 (bm25_index.py:70).

This module is the oracle; the vectorized Spark-side equivalent lives in
``functions/udfs.py`` and is asserted list-identical in tests.
"""

from __future__ import annotations

import re
from typing import List

# parseJSON -> parse JSON            (bm25_index.py:55)
_CAMEL1 = re.compile(r"([a-z])([A-Z])")
# JSONData -> JSON Data              (bm25_index.py:57)
_CAMEL2 = re.compile(r"([A-Z]+)([A-Z][a-z])")
# snake_case and path separators     (bm25_index.py:63)
_SEP = re.compile(r"[_\-./\\]")
# keep alphanumeric only             (bm25_index.py:66)
_NONALNUM = re.compile(r"[^a-z0-9\s]")

MIN_TOKEN_LEN = 2  # bm25_index.py:70


def tokenize(text: str) -> List[str]:
    """Tokenize text exactly like the reference BM25 index does."""
    text = _CAMEL1.sub(r"\1 \2", text)
    text = _CAMEL2.sub(r"\1 \2", text)
    text = text.lower()
    text = _SEP.sub(" ", text)
    text = _NONALNUM.sub(" ", text)
    return [t for t in text.split() if len(t) >= MIN_TOKEN_LEN]
