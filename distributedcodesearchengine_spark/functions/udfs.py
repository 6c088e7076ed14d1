"""Vectorized pandas/Arrow UDFs for the extract + tokenize hot path.

These are the ONLY Python touchpoints in the index build (everything else
is JVM-side DataFrame code). Both are Arrow-batched ``pandas_udf``s —
never row-at-a-time Python UDFs (input_hint: "no per-row Python").

Semantics are pinned to the oracle:
- ``tokenize_udf``     == ``oracle.tokenizer.tokenize`` per row
  (reference contract: codesearch/storage/bm25_index.py:42-72)
- ``extract_text_udf`` == ``oracle.extract.extract_text`` per row
  (decode utf-8 errors='replace', reference python_parser.py:35-42)

Vectorization note: after the two camelCase splits and ``str.lower()``,
the reference's "separators -> space, specials -> space, split, min-len-2"
chain (bm25_index.py:63-70) is exactly "maximal runs of [a-z0-9] of
length >= 2" — proven equivalent and property-tested against the literal
transcription in tests/test_tokenizer.py — so the hot path is a single
``Series.str.findall`` instead of four Python-regex replaces.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ..oracle.extract import extract_text as _oracle_extract

_CAMEL1 = r"([a-z])([A-Z])"
_CAMEL2 = r"([A-Z]+)([A-Z][a-z])"
_RUNS = re.compile(r"[a-z0-9]{2,}")


def _tokenize_series(s: pd.Series) -> pd.Series:
    s = s.fillna("")
    s = s.str.replace(_CAMEL1, r"\1 \2", regex=True)
    s = s.str.replace(_CAMEL2, r"\1 \2", regex=True)
    s = s.str.lower()
    return s.str.findall(_RUNS)


@pandas_udf(ArrayType(StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:
    return _tokenize_series(s)


def _extract_series(s: pd.Series) -> pd.Series:
    return s.map(lambda b: _oracle_extract(bytes(b)) if b is not None else "")


@pandas_udf(StringType())
def extract_text_udf(s: pd.Series) -> pd.Series:
    return _extract_series(s)


@pandas_udf(ArrayType(StringType()))
def extract_tokenize_udf(s: pd.Series) -> pd.Series:
    """Fused html -> tokens (one Arrow round trip; the intermediate text
    never crosses the JVM/Python boundary). Semantically identical to
    tokenize_udf(extract_text_udf(html)) — asserted in tests."""
    return _tokenize_series(_extract_series(s))


def tokenize_expr(col):
    """Column-expression form of the tokenizer (pure JVM, no Python).

    Usable when the corpus is known plain-ASCII (e.g. the driver's
    ``documents`` table): identical output to ``tokenize_udf`` for inputs
    where Java and Python regex/lowercase semantics agree. Kept for plan
    experiments; the UDF is the default contract path.
    """
    from pyspark.sql import functions as F

    c = F.regexp_replace(col, _CAMEL1, r"$1 $2")
    c = F.regexp_replace(c, _CAMEL2, r"$1 $2")
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    toks = F.split(F.trim(c), r"\s+")
    return F.filter(toks, lambda t: F.length(t) >= 2)


# --- unicode normalization (web-corpus cleanup) ---------------------------
# NFC has no JVM built-in in Spark; pandas' vectorized Series.str.normalize
# (ICU-equivalent via CPython unicodedata) is the one justified Python
# touchpoint, Arrow-batched like extract/tokenize. The regex steps mirror
# the DuckDB oracle's RE2 patterns character-class-for-character-class.
_ZERO_WIDTH = re.compile("[\u200b\u200c\u200d\ufeff]")
_CONTROL = re.compile("[\x00-\x08\x0b\x0e-\x1f\x7f]")
_WS_RUNS = re.compile("[ \t\n\r\f]+")


def _normalize_series(s: pd.Series) -> pd.Series:
    s = s.fillna("").str.normalize("NFC")
    s = s.str.replace(_ZERO_WIDTH, "", regex=True)
    s = s.str.replace(_CONTROL, "", regex=True)
    s = s.str.replace(" ", " ", regex=False)
    s = s.str.replace(_WS_RUNS, " ", regex=True)
    return s.str.strip(" ")


@pandas_udf(StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    return _normalize_series(s)
