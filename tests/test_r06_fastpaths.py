"""r06 optimization-round equivalence pins.

The optimization round swapped hot-path internals (byte-level
vectorized tokenizer, Arrow-pass term_freqs); these tests pin
bit-equivalence against the previous formulations so the swaps can
never drift semantically.
"""

from __future__ import annotations

import random
import string

import numpy as np
import pandas as pd
import pytest

from distributedcodesearchengine_spark.functions.udfs import (
    _extract_series,
    _tokenize_series,
    _tokenize_series_regex,
)
from distributedcodesearchengine_spark.oracle.extract import extract_text
from distributedcodesearchengine_spark.oracle.tokenizer import tokenize


def _fuzz_texts(n=3000, seed=11):
    rng = random.Random(seed)
    chars = string.ascii_letters + string.digits + " .,_-!<>&/\t\n\\"
    out = []
    for _ in range(n):
        out.append("".join(rng.choice(chars) for _ in range(rng.randint(0, 60))))
    out += [
        "",
        "aB",
        "ABCdef",
        "HTTPClient2",
        "parseJSON",
        "a1B2c3",
        "AAb",
        "aAAb",
        "ABC",
        "A",
        "ab",
        "XMLHttpRequest",
        "aBC",
        "aBCd",
        "ABCDe",
        "aBcDeF",
        "snake_case_name",
        "read-the.file/path",
        "MAX_RETRY_COUNT",
        None,
    ]
    return out


def test_fast_tokenizer_matches_regex_and_oracle():
    texts = _fuzz_texts()
    got = _tokenize_series(pd.Series(texts, dtype=object)).tolist()
    ref = _tokenize_series_regex(pd.Series(texts, dtype=object)).tolist()
    for t, g, r in zip(texts, got, ref):
        assert list(g) == list(r), t
        if t is not None:
            assert list(g) == tokenize(t), t


def test_fast_tokenizer_non_ascii_fallback_rows():
    # rows that MUST take the per-row regex fallback, mixed into a batch
    texts = [
        "parseJSON table",       # fast path
        "café naïveBayes",       # non-ASCII
        "Kelvin K sign",        # U+212A lowercases to ASCII 'k'
        "İstanbul API",          # dotted capital I
        "",
        "plain ascii words",
    ]
    got = _tokenize_series(pd.Series(texts)).tolist()
    for t, g in zip(texts, got):
        assert list(g) == tokenize(t), t


def test_fast_extract_matches_oracle():
    rng = random.Random(5)
    chars = string.ascii_letters + " <>&;#/!-_.pP"
    cases = [
        "".join(rng.choice(chars) for _ in range(rng.randint(0, 80))).encode()
        for _ in range(1500)
    ]
    cases += [
        b"<html><head><title>doc</title></head><body><p>hello worldX</p></body></html>",
        b"<html><head><title>t</title></head><body><p>a &amp; b</p></body></html>",
        b"<html><head><title>doc</title></head><body><p></p></body></html>",
        b"<script>x</script><p>keep</p>",
        b"<!-- c --><p>a</p><p>b</p>",
        b"\xff\xfe invalid utf8",
        None,
    ]
    got = _extract_series(pd.Series(cases, dtype=object)).tolist()
    for c, g in zip(cases, got):
        exp = extract_text(bytes(c)) if c is not None else ""
        assert g == exp, c


def test_term_freqs_arrow_matches_hof(spark):
    from pyspark.sql import functions as F

    from distributedcodesearchengine_spark.operators.stats import (
        build_docs,
        term_freqs,
        term_freqs_hof,
    )
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    docs = build_docs(generate_pages(spark, 800, seed=9, parts=4)).persist()
    a = term_freqs(docs)
    b = term_freqs_hof(docs)
    assert a.columns == b.columns
    key = [F.col(c) for c in a.columns]
    sa = [tuple(r) for r in a.orderBy(*key).collect()]
    sb = [tuple(r) for r in b.orderBy(*key).collect()]
    assert sa == sb
    docs.unpersist()
