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

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ..oracle.extract import extract_text as _oracle_extract

_CAMEL1 = r"([a-z])([A-Z])"
_CAMEL2 = r"([A-Z]+)([A-Z][a-z])"
_RUNS = re.compile(r"[a-z0-9]{2,}")


def _tokenize_series_regex(s: pd.Series) -> pd.Series:
    """Reference vectorization (per-row Python regex engine): the
    fallback path for non-ASCII rows and the equivalence baseline the
    byte-level fast path is tested against."""
    s = s.fillna("")
    s = s.str.replace(_CAMEL1, r"\1 \2", regex=True)
    s = s.str.replace(_CAMEL2, r"\1 \2", regex=True)
    s = s.str.lower()
    return s.str.findall(_RUNS)


# --- byte-level vectorized tokenizer (optimization round r06) -------------
#
# For ASCII text the whole tokenizer chain is computable with numpy over
# the batch's concatenated bytes — no per-row regex engine:
#
# - camel1 ``([a-z])([A-Z])`` inserts a boundary between every
#   lower/UPPER byte pair. The global sub never skips a candidate pair:
#   each match consumes one lower+one UPPER, and a following candidate
#   needs a NEW lower first, which is never part of the previous match's
#   consumed text's tail pattern.
# - camel2 ``([A-Z]+)([A-Z][a-z])`` (applied to camel1's output) inserts
#   a boundary between positions (i, i+1) whenever UPPER(i) & UPPER(i+1)
#   & lower(i+2). camel1 never separates two UPPERs (its pattern needs a
#   leading lower), so these positions are computable on the ORIGINAL
#   string; and the regex's left-to-right consumption cannot skip one
#   (every match ends in a lowercase byte, which cannot be the first
#   UPPER of the next candidate).
# - ``str.lower`` on ASCII == byte | 0x20 for A-Z.
# - ``findall([a-z0-9]{2,})`` == maximal alnum runs, additionally split
#   at the camel boundaries, length >= 2.
#
# Non-ASCII rows fall back to the regex path per row (Python lower() can
# map non-ASCII to ASCII — e.g. the Kelvin sign -> 'k' — so byte-level
# treatment of multi-byte UTF-8 would diverge). Equivalence with
# ``_tokenize_series_regex`` is fuzz- and property-tested in
# tests/test_tokenizer.py.


def _tokenize_bytes_flat(enc: list):
    """ASCII-only core. ``enc`` is a list of per-row ``bytes``.
    -> (token byte data uint8[], token offsets int64[n_tok+1],
        per-row token counts int64[n_rows])."""
    n_rows = len(enc)
    if n_rows == 0:
        return (
            np.zeros(0, np.uint8),
            np.zeros(1, np.int64),
            np.zeros(0, np.int64),
        )
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n_rows)
    row_ends = np.cumsum(lens + 1)  # rows separated by one \x00 byte
    buf = b"\x00".join(enc) + b"\x00"
    a = np.frombuffer(buf, np.uint8)
    lo = (a >= 97) & (a <= 122)
    up = (a >= 65) & (a <= 90)
    al = lo | up | ((a >= 48) & (a <= 57))
    n = len(a)
    bnd = np.zeros(n, bool)  # bnd[i] = token boundary between i-1 and i
    bnd[1:] = lo[:-1] & up[1:]
    if n >= 3:
        bnd[1:-1] |= up[:-2] & up[1:-1] & lo[2:]
    start = al.copy()
    start[1:] &= ~al[:-1] | bnd[1:]
    end_ = al.copy()
    end_[:-1] &= ~al[1:] | bnd[1:]
    starts = np.flatnonzero(start)
    tl = (np.flatnonzero(end_) + 1) - starts
    keep = tl >= 2
    starts, tl = starts[keep], tl[keep]
    lowered = a | (up.astype(np.uint8) << np.uint8(5))
    total = int(tl.sum())
    offs = np.zeros(len(tl) + 1, np.int64)
    np.cumsum(tl, out=offs[1:])
    gather = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], tl) + np.repeat(
        starts, tl
    )
    data = lowered[gather]
    counts = np.bincount(
        np.searchsorted(row_ends, starts, side="right"), minlength=n_rows
    ).astype(np.int64)
    return data, offs, counts


def _tokens_list_array(texts: list):
    """list[str] -> pyarrow ListArray<string> of token lists, with zero
    Python string objects on the ASCII fast path."""
    import pyarrow as pa

    enc = [("" if t is None else t).encode("utf-8") for t in texts]
    slow_idx: list = []
    if enc:
        whole = np.frombuffer(b"\x00".join(enc) + b"\x00", np.uint8)
        if (whole & 0x80).any():
            # locate the non-ASCII rows (rare): per-row max via reduceat
            lens = np.fromiter((len(b) for b in enc), np.int64, count=len(enc))
            row_starts = np.zeros(len(enc), np.int64)
            if len(enc) > 1:
                np.cumsum(lens[:-1] + 1, out=row_starts[1:])
            # reduceat over an empty segment (zero-length row) yields the
            # separator byte \x00 at row_starts — harmless, it is < 0x80
            row_max = np.maximum.reduceat(whole, row_starts)
            slow_idx = np.flatnonzero(row_max >= 0x80).tolist()
    if slow_idx:
        # rare path: tokenize non-ASCII rows via the regex engine and
        # splice their tokens into the flat layout (row loop is O(rows),
        # slicing the fast buffer segment-wise)
        slow_set = set(slow_idx)
        fast_enc = [b"" if i in slow_set else b for i, b in enumerate(enc)]
        data, offs, counts = _tokenize_bytes_flat(fast_enc)
        slow_tokens = {
            i: [t.encode("utf-8") for t in
                _tokenize_series_regex(pd.Series([texts[i]])).iloc[0]]
            for i in slow_idx
        }
        parts, tok_lens, final_counts = [], [], np.zeros(len(enc), np.int64)
        tok_i = 0
        for i in range(len(enc)):
            if i in slow_set:
                toks = slow_tokens[i]
                parts.extend(toks)
                tok_lens.extend(len(t) for t in toks)
                final_counts[i] = len(toks)
            else:
                c = int(counts[i])
                if c:
                    seg = data[offs[tok_i] : offs[tok_i + c]]
                    parts.append(seg.tobytes())
                    tok_lens.extend(
                        int(x) for x in np.diff(offs[tok_i : tok_i + c + 1])
                    )
                tok_i += c
                final_counts[i] = c
        data = np.frombuffer(b"".join(parts), np.uint8)
        offs = np.zeros(len(tok_lens) + 1, np.int64)
        np.cumsum(np.asarray(tok_lens, dtype=np.int64), out=offs[1:])
        counts = final_counts
    else:
        data, offs, counts = _tokenize_bytes_flat(enc)
    n_tok = len(offs) - 1
    values = pa.Array.from_buffers(
        pa.utf8(),
        n_tok,
        [None, pa.py_buffer(offs.astype(np.int32)), pa.py_buffer(data)],
    )
    doc_offs = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=doc_offs[1:])
    return pa.ListArray.from_arrays(
        pa.array(doc_offs.astype(np.int32), type=pa.int32()), values
    )


def _arrow_backed(list_array) -> pd.Series:
    """Wrap a pyarrow ListArray as a pandas Series that round-trips to
    Arrow zero-copy in the pandas-UDF serializer (``__arrow_array__``)."""
    import pyarrow as pa

    return pd.Series(
        pd.arrays.ArrowExtensionArray(pa.chunked_array([list_array]))
    )


def _tokenize_series(s: pd.Series) -> pd.Series:
    """Vectorized tokenizer: byte-level numpy fast path (Arrow-backed
    result, no per-token Python objects), regex fallback per non-ASCII
    row. Output values are list-identical to the regex formulation."""
    return _arrow_backed(_tokens_list_array(s.tolist()))


@pandas_udf(ArrayType(StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:
    return _tokenize_series(s)


# anchored wrapper fast path: a page of this exact shape provably takes
# the paragraph branch of oracle.extract.extract_text with tag-strip and
# entity-decode both the identity on the captured group (no '<' anywhere
# outside the five fixed tags -> no comments/scripts/extra <p>; no '&'
# in the body text -> entity decode is a no-op)
_WRAPPER = re.compile(
    r"(?s)\A<html><head><title>[^<]*</title></head><body><p>([^<&]*)"
    r"</p></body></html>\Z"
)


def _extract_series(s: pd.Series) -> pd.Series:
    decoded = s.map(
        lambda b: bytes(b).decode("utf-8", errors="replace") if b is not None else ""
    )
    ext = decoded.str.extract(_WRAPPER, expand=False)
    miss = ext.isna()
    if miss.any():
        ext[miss] = decoded[miss].map(_oracle_extract_str)
    return ext


def _oracle_extract_str(s: str) -> str:
    """oracle extract_text on an already-decoded string (the decode step
    is shared with the wrapper fast path)."""
    from ..oracle import extract as _ex

    t = _ex._COMMENT.sub("", s)
    t = _ex._SCRIPT_STYLE.sub("", t)
    paras = _ex._P_ITEM.findall(t)
    if paras:
        out = "\n".join(_ex._TAG.sub("", p) for p in paras)
    else:
        out = _ex._TAG.sub("", t)
    return _ex._decode_entities(out)


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
