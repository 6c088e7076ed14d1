"""string_stats aggregation tests (operators/textstats.string_stats —
the ES string_stats agg: length stats + Shannon char entropy over the
[a-z0-9] analyzer alphabet)."""

import math

import pytest

from distributedcodesearchengine_spark.operators.textstats import (
    _ALPHABET,
    string_stats,
)


def _py_entropy(counts):
    tot = sum(counts.values())
    if tot == 0:
        return 0.0
    e = 0.0
    for c in _ALPHABET:
        n = counts.get(c, 0)
        if n:
            p = n / tot
            e += p * math.log2(p)
    return -e


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_computed(spark):
    texts = ["Aa bb!", "cc11", ""]
    row = string_stats(_docs(spark, texts)).first()
    assert row["n_docs"] == 3
    assert row["min_len"] == 0 and row["max_len"] == 6
    assert row["avg_len"] == pytest.approx((6 + 4 + 0) / 3, abs=1e-6)
    # chars: a:2 (case-folded), b:2, c:2, 1:2 -> 8 alphabet chars
    assert row["alpha_chars"] == 8
    want = _py_entropy({"a": 2, "b": 2, "c": 2, "1": 2})
    assert row["entropy"] == pytest.approx(want, abs=1e-6)
    assert want == pytest.approx(2.0)  # 4 equiprobable symbols = 2 bits


def test_single_symbol_zero_entropy(spark):
    row = string_stats(_docs(spark, ["aaaa", "aa"])).first()
    assert row["entropy"] == 0.0
    assert row["alpha_chars"] == 6


def test_no_alphabet_chars(spark):
    """Punctuation-only corpus: tot = 0 -> entropy 0.0, not NaN."""
    row = string_stats(_docs(spark, ["!!!", "??"])).first()
    assert row["alpha_chars"] == 0
    assert row["entropy"] == 0.0
    assert row["min_len"] == 2 and row["max_len"] == 3


def test_python_replication_random(spark):
    texts = [
        "the quick brown fox jumps over 13 lazy dogs",
        "pack my box with five dozen liquor jugs 99",
        "sphinx of black quartz judge my vow",
    ]
    counts = {}
    for t in texts:
        for ch in t.lower():
            if ch in _ALPHABET:
                counts[ch] = counts.get(ch, 0) + 1
    row = string_stats(_docs(spark, texts)).first()
    assert row["alpha_chars"] == sum(counts.values())
    assert row["entropy"] == pytest.approx(_py_entropy(counts), abs=1e-6)
