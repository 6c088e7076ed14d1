"""Repetition-stats (Gopher-style n-gram repetition signals) tests."""

from collections import Counter

import pytest

from distributedcodesearchengine_spark.entry_queries import docs_with_tokens
from distributedcodesearchengine_spark.functions.rounding import round6_py
from distributedcodesearchengine_spark.operators.textstats import repetition_stats


def py_stats(tokens):
    def gram_stats(n):
        grams = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
        if not grams:
            return 0, 0.0, 0.0
        c = Counter(grams)
        total = len(grams)
        return total, max(c.values()) / total, 1.0 - len(c) / total

    n1, top1, _ = gram_stats(1)
    _, top2, dup2 = gram_stats(2)
    _, top3, _ = gram_stats(3)
    return (
        n1,
        round6_py(top1),
        round6_py(top2),
        round6_py(dup2),
        round6_py(top3),
    )


def test_repetition_matches_python(spark, sf_dir):
    docs = docs_with_tokens(spark, sf_dir)
    tok_map = {
        r["doc_id"]: list(r["tokens"])
        for r in docs.select("doc_id", "tokens").collect()
    }
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["top_token_frac"],
            r["top_2gram_frac"],
            r["dup_2gram_frac"],
            r["top_3gram_frac"],
        )
        for r in repetition_stats(docs).collect()
    }
    assert set(got) == set(tok_map)
    for doc_id, toks in tok_map.items():
        assert got[doc_id] == py_stats(toks), doc_id


def test_repetition_short_docs(spark):
    """Docs shorter than the gram width yield zero-signal rows, not
    missing rows or nulls."""
    docs = spark.createDataFrame(
        [(1, ["aa"]), (2, []), (3, ["aa", "bb"]), (4, ["aa", "aa", "aa"])],
        "doc_id long, tokens array<string>",
    )
    rows = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2]["n_tokens"] == 0 and rows[2]["top_token_frac"] == 0.0
    assert rows[1]["top_2gram_frac"] == 0.0
    assert rows[3]["top_2gram_frac"] == 1.0 and rows[3]["dup_2gram_frac"] == 0.0
    assert rows[4]["top_token_frac"] == 1.0
    assert rows[4]["dup_2gram_frac"] == round(1.0 - 1.0 / 2.0, 6)
    assert rows[4]["top_3gram_frac"] == 1.0
