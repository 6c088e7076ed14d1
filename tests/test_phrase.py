"""Positional index + phrase query tests.

Contract: Spark phrase occurrence counts == a pure-Python sliding-window
count over the SAME tokenizer output, for adversarial phrases (repeated
terms, overlapping self-matches, unknown terms, 1-term and empty
phrases). Plan shape: the intersection is equi-joins — no
CartesianProduct / BroadcastNestedLoopJoin may appear.
"""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.entry_queries import docs_with_tokens
from distributedcodesearchengine_spark.operators.phrase import (
    phrase_occurrences,
    phrase_topk,
    positional_postings,
)
from distributedcodesearchengine_spark.oracle.tokenizer import tokenize


def py_count(tokens, phrase_toks):
    n = len(phrase_toks)
    if n == 0 or len(tokens) < n:
        return 0
    return sum(
        1 for i in range(len(tokens) - n + 1) if tokens[i : i + n] == phrase_toks
    )


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d = docs_with_tokens(spark, sf_dir).persist()
    yield d
    d.unpersist()  # never leak a cached shared-plan into later modules


PHRASES = [
    "row scan",            # common bigram
    "table table",         # repeated term (self-overlap candidates)
    "query window sort",   # trigram
    "the",                 # single token (tokenizer keeps len>=2 'the')
    "zzz unknown phrase",  # no matches
    "Row-Scan!",           # tokenizer normalization must apply
]


@pytest.mark.parametrize("phrase", PHRASES)
def test_phrase_counts_match_python(docs, phrase):
    expected = {
        r["doc_id"]: py_count(list(r["tokens"]), tokenize(phrase))
        for r in docs.select("doc_id", "tokens").collect()
    }
    expected = {d: c for d, c in expected.items() if c > 0}
    got = {
        r["doc_id"]: r["n_occur"]
        for r in phrase_occurrences(docs, phrase).collect()
    }
    assert got == expected


def test_empty_phrase(docs, spark):
    assert phrase_occurrences(docs, "!!") .count() == 0


def test_phrase_topk_order(docs):
    rows = phrase_topk(docs, "table table", k=5).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    key = [(-r["n_occur"], r["doc_id"]) for r in rows]
    assert key == sorted(key)


def test_positional_postings_roundtrip(docs):
    """positions are 0-based, sorted, and tf == len(positions)."""
    pp = positional_postings(docs, terms=["table", "row"])
    sample = pp.limit(20).collect()
    assert sample
    tok_map = {
        r["doc_id"]: list(r["tokens"])
        for r in docs.select("doc_id", "tokens").collect()
    }
    for r in sample:
        toks = tok_map[r["doc_id"]]
        want = [i for i, t in enumerate(toks) if t == r["term"]]
        assert list(r["positions"]) == want
        assert r["tf"] == len(want)


def test_no_cartesian_in_phrase_plan(docs):
    plan = phrase_occurrences(docs, "query window sort")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- compressed positional index (operators/positional.py) -----------------


@pytest.mark.parametrize("phrase", PHRASES)
def test_indexed_phrase_equals_join_phrase(docs, phrase):
    from distributedcodesearchengine_spark.operators.positional import (
        phrase_match_indexed,
    )

    want = {
        (r["doc_id"], r["n_occur"])
        for r in phrase_occurrences(docs, phrase).collect()
    }
    got = {
        (r["doc_id"], r["n_occur"])
        for r in phrase_match_indexed(docs, phrase, shard_width=64).collect()
    }
    assert got == want


def test_positional_roundtrip_small_shards(spark):
    """Adversarial: repeated tokens, doc boundaries at shard edges,
    position 0 matches for every slot offset."""
    from distributedcodesearchengine_spark.operators.positional import (
        build_positional_index,
        phrase_occurrences_indexed,
    )

    rows = [
        (0, ["aa", "aa", "aa", "bb"]),
        (1, ["bb", "aa"]),
        (63, ["aa", "bb", "aa", "bb", "aa", "bb"]),
        (64, ["bb", "bb"]),         # first doc of shard 1
        (65, ["aa"]),
        (200, ["aa", "bb", "cc"]),  # sparse far shard
    ]
    docs = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    idx = build_positional_index(docs, shard_width=64).persist()
    got = {
        (r["doc_id"], r["n_occur"])
        for r in phrase_occurrences_indexed(idx, "aa bb", shard_width=64).collect()
    }
    assert got == {(0, 1), (63, 3), (200, 1)}
    got2 = {
        (r["doc_id"], r["n_occur"])
        for r in phrase_occurrences_indexed(idx, "bb bb", shard_width=64).collect()
    }
    assert got2 == {(64, 1)}
    got3 = {
        (r["doc_id"], r["n_occur"])
        for r in phrase_occurrences_indexed(idx, "aa", shard_width=64).collect()
    }
    assert got3 == {(0, 3), (1, 1), (63, 3), (65, 1), (200, 1)}
    idx.unpersist()


def test_positional_codec_property():
    """Hypothesis roundtrip on the pack/decode codec alone (no Spark):
    random (term, doc, pos) triples -> pack -> decode == ground truth."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import numpy as np
    import pandas as pd

    from distributedcodesearchengine_spark.operators.positional import (
        _POS_BITS,
        _decode_row,
        pack_positional_shard,
    )

    docs_strategy = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=63),          # doc offset
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd"]),   # tokens
                min_size=1, max_size=30,
            ),
        ),
        min_size=1, max_size=12, unique_by=lambda t: t[0],
    )

    @settings(max_examples=60, deadline=None)
    @given(docs_strategy)
    def run(doclist):
        triples = [
            (t, off, i)
            for off, toks in doclist
            for i, t in enumerate(toks)
        ]
        terms = sorted({t for t, _, _ in triples})
        code_of = {t: i for i, t in enumerate(terms)}
        codes = np.array([code_of[t] for t, _, _ in triples], dtype=np.int64)
        offs = np.array([o for _, o, _ in triples], dtype=np.int64)
        poss = np.array([p for _, _, p in triples], dtype=np.int64)
        packed = pack_positional_shard(7, codes, np.array(terms, object), offs, poss)
        got = set()
        for _, row in packed.iterrows():
            _, keys = _decode_row(row)
            for k in keys:
                got.add((row["term"], int(k) >> _POS_BITS, int(k) & ((1 << _POS_BITS) - 1)))
        assert got == set(triples)
        assert (packed["range_id"] == 7).all()

    run()


def test_positional_pack_overflow_raises():
    """A position past the _POS_BITS budget must fail the build loudly —
    silent overflow would forge keys in the neighboring doc."""
    import numpy as np
    import numpy as _np

    from distributedcodesearchengine_spark.operators.positional import (
        _POS_BITS,
        pack_positional_shard,
    )

    codes = np.zeros(2, np.int64)
    offs = np.zeros(2, np.int64)
    poss = np.array([0, 1 << _POS_BITS], np.int64)
    with pytest.raises(ValueError, match="too long"):
        pack_positional_shard(0, codes, _np.array(["aa"], object), offs, poss)
    # boundary-1 is fine
    ok = pack_positional_shard(
        0, codes, _np.array(["aa"], object), offs,
        np.array([0, (1 << _POS_BITS) - 1], np.int64),
    )
    assert len(ok) == 1


def test_indexed_phrase_prunes_term_buckets(spark, tmp_path):
    """The persisted partitionBy('term_bucket') layout must be
    partition-pruned at query time: the scan's PartitionFilters carry
    the phrase terms' buckets (ADVICE r2)."""
    from distributedcodesearchengine_spark.operators.positional import (
        build_positional_index,
        phrase_occurrences_indexed,
    )

    rows = [(i, ["aa", "bb", "cc", "aa", "bb"]) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    out = str(tmp_path / "pos")
    build_positional_index(docs, shard_width=64, n_buckets=8).write.partitionBy(
        "term_bucket"
    ).parquet(out)
    pos = spark.read.parquet(out)
    df = phrase_occurrences_indexed(pos, "aa bb", shard_width=64, n_buckets=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "term_bucket" in plan.split("PartitionFilters")[1][:250], plan[:4000]
    # and the pruned read still answers correctly
    got = {(r["doc_id"], r["n_occur"]) for r in df.collect()}
    assert got == {(i, 2) for i in range(20)}


def test_term_suggest_sql_prefix_is_literal():
    """Oracle SQL must treat the prefix literally (starts_with), like
    Spark's startswith — LIKE would wildcard-match '%' / '_'."""
    import duckdb

    from distributedcodesearchengine_spark.operators.snippets import term_suggest_sql

    cte = "docs AS (SELECT 1 AS doc_id, ['a%b', 'axb', 'aqb'] AS toks)"
    rows = duckdb.connect().execute(term_suggest_sql(cte, "a%")).fetchall()
    assert [r[0] for r in rows] == ["a%b"]


def test_spell_symspell_equals_baseline(spark, sf_dir):
    """SymSpell deletion-key candidates + verify == the full-dictionary
    levenshtein scan, for hit, miss, short and exact-word probes."""
    from distributedcodesearchengine_spark.entry_queries import (
        get_documents_index,
    )
    from distributedcodesearchengine_spark.operators.snippets import (
        spell_suggest,
        spell_suggest_symspell,
    )

    terms = get_documents_index(spark, sf_dir).terms
    for word in ["tble", "table", "qury", "zz", "spakr"]:
        base = [
            (r["term"], r["df"], r["dist"])
            for r in spell_suggest(terms, word, k=20).collect()
        ]
        sym = [
            (r["term"], r["df"], r["dist"])
            for r in spell_suggest_symspell(terms, word, k=20).collect()
        ]
        assert sym == base, word


def test_highlight_expr_marks_matches(spark):
    from distributedcodesearchengine_spark.operators.snippets import highlight_expr
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [(1, "Dup rows and the dup table; duplicate stays")],
        "doc_id long, text string",
    )
    got = d.select(highlight_expr(F.col("text"), ["dup", "table"]).alias("f")).first()["f"]
    # case-insensitive, token-boundary: 'duplicate' must NOT match
    assert got == "<em>Dup</em> rows and the <em>dup</em> <em>table</em>; duplicate stays"
