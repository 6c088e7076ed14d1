"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``.

Every value for row ``i`` is a pure function of ``(seed, i)`` via a
counter-based splitmix64 hash — generation is embarrassingly parallel and
partition-count-independent, so ``generate_pages`` (distributed,
``mapInPandas`` over ``spark.range``) and ``generate_rows_local`` (pandas,
used by the oracle) produce byte-identical rows. No external data.

Content design (FIXTURES.md §1):
- Zipfian bag-of-words over a ~5k-word vocabulary mixing natural-looking
  syllable words with code-ish tokens (``parseJSON``, ``snake_case_name``,
  ``HTTPClient2``) to exercise the camelCase/snake_case tokenizer paths.
- 1% of rows tokenize to the empty list ("a ! b ?" — all tokens shorter
  than 2 chars) — the stats edge case: they still count in N and avgdl.
- doc lengths 5..500 tokens; lang in {en:80%, de:10%, fr:10%}.
- html is a fixed wrapper of text with a checkable inverse for the
  extract UDF; text never contains '<'.
- Optional skew mode: one hot term injected into 50% of docs (salting /
  skew-split test fixture, SURVEY §5.5).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta
from typing import Iterator, List

import numpy as np
import pandas as pd

from ..schemas import PAGES

VOCAB_SIZE = 5000
_ZIPF_S = 1.07
_LANGS = ["en"] * 8 + ["de", "fr"]
_EPOCH = datetime(2024, 1, 1)
HOT_TERM = "megahot"

_SYLL = [
    "al", "an", "ar", "as", "at", "ba", "ca", "da", "ea", "ed",
    "en", "er", "es", "fa", "ga", "ha", "he", "hi", "in", "is",
    "it", "ka", "le", "lo", "ma", "me", "na", "nd", "ne", "ng",
    "nt", "on", "or", "ou", "ra",
]

_CODE_TOKENS = [
    "parseJSON", "HTTPClient2", "snake_case_name", "XMLHttpRequest",
    "getElementById", "sendHTTPRequest", "parse_json_data", "JSONData",
    "validateEmailAddress", "asyncDatabaseQuery", "read-the.file/path",
    "OAuth2Token", "downloadFileAsync", "camelCaseSplitter",
    "MAX_RETRY_COUNT", "innerHTML", "toISOString", "base64Encode",
    "utf8Decoder", "querySelectorAll",
]


def _build_vocab() -> List[str]:
    n = len(_SYLL)
    vocab = []
    for i in range(VOCAB_SIZE):
        # base-n digits, fixed 3 syllables -> unique 6-char words
        w = _SYLL[i % n] + _SYLL[(i // n) % n] + _SYLL[(i // (n * n)) % n]
        vocab.append(w)
    # plant code-ish tokens at spread ranks (some common, some rare)
    for j, tok in enumerate(_CODE_TOKENS):
        vocab[7 + j * 211] = tok
    return vocab


VOCAB = _build_vocab()

# Zipf inverse-CDF lookup
_w = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), _ZIPF_S)
_ZIPF_CDF = np.cumsum(_w / _w.sum())

_M = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M
    return z ^ (z >> np.uint64(31))


def _h(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return _splitmix64(
        (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ _splitmix64(
            np.full(len(ids), np.uint64(stream) ^ (np.uint64(seed) << np.uint64(32)), dtype=np.uint64)
        )
    )


def _u01(h: np.ndarray) -> np.ndarray:
    return h.astype(np.float64) / 18446744073709551616.0


_VOCAB_ARR = np.array(VOCAB, dtype=object)


def generate_rows_local(ids: np.ndarray, seed: int = 42, skew: bool = False) -> pd.DataFrame:
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    lens = 5 + (_h(ids, 1, seed) % np.uint64(496)).astype(np.int64)
    is_empty = (_h(ids, 2, seed) % np.uint64(100)) == 0
    lang_idx = (_h(ids, 3, seed) % np.uint64(10)).astype(np.int64)
    hot = (_h(ids, 4, seed) % np.uint64(2)) == 0 if skew else np.zeros(n, bool)

    # fully vectorized token generation: one hash pass over all token
    # slots of the batch (values identical to the per-row formulation:
    # key = id*1000003 + position)
    L = np.where(is_empty, 0, lens)
    ends = np.cumsum(L)
    starts = ends - L
    total = int(ends[-1]) if n else 0
    doc_idx = np.repeat(np.arange(n), L)
    pos = np.arange(total) - np.repeat(starts, L)
    keys = ids[doc_idx] * np.int64(1000003) + pos
    u = _u01(_h(keys, 5, seed))
    vidx = np.searchsorted(_ZIPF_CDF, u, side="left")
    words = _VOCAB_ARR[vidx]
    if skew:
        words[(pos == 0) & hot[doc_idx]] = HOT_TERM

    texts = []
    for r in range(n):
        if is_empty[r]:
            texts.append("a ! b ?")
        else:
            texts.append(" ".join(words[starts[r] : ends[r]]))

    urls = [
        f"https://site{int(i) % 1000}.example/"
        + hashlib.sha1(str(int(i)).encode()).hexdigest()[:8]
        for i in ids
    ]
    ts = [_EPOCH + timedelta(seconds=13 * int(i)) for i in ids]
    langs = [_LANGS[j] for j in lang_idx]
    htmls = [
        b"<html><head><title>doc</title></head><body><p>"
        + t.encode("utf-8")
        + b"</p></body></html>"
        for t in texts
    ]
    return pd.DataFrame(
        {"url": urls, "warc_ts": ts, "html": htmls, "text": texts, "lang": langs}
    )


def generate_pages(spark, n_rows: int, seed: int = 42, parts: int | None = None, skew: bool = False):
    """Distributed deterministic pages DataFrame (partition-independent)."""
    parts = parts or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield generate_rows_local(pdf["id"].to_numpy(), seed=seed, skew=skew)

    return spark.range(0, n_rows, numPartitions=parts).mapInPandas(gen, schema=PAGES)
