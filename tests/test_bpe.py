"""BPE tokenizer induction (operators/bpe.py): the merge loop pinned
against a pure-Python replication of the exact convention (all-adjacent
weighted pair counts, (cnt desc, pair asc) argmax, non-overlapping
left-to-right replace on spaced-symbol strings), the classic
lowest/newest textbook behavior, apply == training-state identity,
artifact roundtrip, exhausted-dictionary passthrough, layout
independence, and guards."""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.operators import bpe
from distributedcodesearchengine_spark.oracle.tokenizer import tokenize


def _docs(spark, texts):
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return d.select("doc_id", tokenize_udf("text").alias("tokens"))


def _py_bpe(texts, n_merges, max_terms):
    """Pure-python replication: returns (merge_list, final_dict)."""
    freq = {}
    for t in texts:
        for tok in tokenize(t):
            freq[tok] = freq.get(tok, 0) + 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:max_terms]
    items = [(" " + " ".join(term) + " ", f) for term, f in top]
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for s, f in items:
            syms = s.split()
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        items = [
            (s.replace(f" {a} {b} ", f" {a}{b} "), f) for s, f in items
        ]
    return merges, items


TEXTS = [
    "the parser parses parsed parsing text tokens",
    "parse the parser parse parse tokens token",
    "low lower lowest newer newest new news",
    "token text parse parser the lowest",
]


def test_merges_match_python_replication(spark):
    docs = _docs(spark, TEXTS)
    got = [
        (r.step, r.l_sym, r.r_sym, r.cnt)
        for r in bpe.bpe_merges(docs, n_merges=8, max_terms=100).collect()
    ]
    exp, _ = _py_bpe(TEXTS, 8, 100)
    assert got == [(i + 1, a, b, c) for i, (a, b, c) in enumerate(exp)]


def test_symbols_match_python_replication(spark):
    docs = _docs(spark, TEXTS)
    got = [
        (r.symbol, r.cnt)
        for r in bpe.bpe_symbols(docs, n_merges=8, max_terms=100, k=15).collect()
    ]
    _, items = _py_bpe(TEXTS, 8, 100)
    counts = {}
    for s, f in items:
        for sym in s.split():
            counts[sym] = counts.get(sym, 0) + f
    exp = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert got == exp


def test_textbook_merge_progression(spark):
    """On a parse-heavy corpus the learner rebuilds the stem: each
    merge extends a substring of 'parse', and after enough merges the
    whole stem is one symbol."""
    docs = _docs(spark, [
        "parse parser parsed parses parsing",
        "parse parse parser parsed",
    ])
    rows = bpe.bpe_merges(docs, n_merges=4, max_terms=100).collect()
    joined = [r.l_sym + r.r_sym for r in rows]
    assert all(j in "parse" or "pars" in j for j in joined)
    syms = {
        r.symbol
        for r in bpe.bpe_symbols(docs, 4, 100, k=20).collect()
    }
    assert any("pars" in s for s in syms)


def test_apply_equals_training_state(spark):
    """bpe_apply_col with the collected artifact reproduces the exact
    final training dictionary state per term."""
    docs = _docs(spark, TEXTS)
    merges = bpe.train_bpe_merges(docs, n_merges=6, max_terms=100)
    assert 1 <= len(merges) <= 6
    terms = (
        docs.select(F.explode("tokens").alias("term")).distinct()
    )
    applied = {
        r.term: r.s
        for r in terms.select(
            "term", bpe.bpe_apply_col(F.col("term"), merges).alias("s")
        ).collect()
    }
    exp_merges, _ = _py_bpe(TEXTS, 6, 100)
    assert [(a, b) for a, b, _ in exp_merges] == merges
    for term, s in applied.items():
        py = " " + " ".join(term) + " "
        for a, b in merges:
            py = py.replace(f" {a} {b} ", f" {a}{b} ")
        assert s == py, term


def test_artifact_roundtrip(spark, tmp_path):
    docs = _docs(spark, TEXTS)
    merges = bpe.train_bpe_merges(docs, n_merges=5, max_terms=100)
    p = str(tmp_path / "bpe.json")
    bpe.save_bpe(p, merges)
    assert bpe.load_bpe(p) == merges


def test_exhausted_dictionary_passthrough(spark):
    """Two 2-char terms exhaust after two merges: the merge table has
    only the real steps and later iterations pass the dictionary
    through unchanged instead of vanishing it."""
    docs = _docs(spark, ["aa bb aa"])
    rows = bpe.bpe_merges(docs, n_merges=4, max_terms=10).collect()
    assert [(r.step, r.l_sym, r.r_sym, r.cnt) for r in rows] == [
        (1, "a", "a", 2), (2, "b", "b", 1),
    ]
    got = {
        r.symbol: r.cnt
        for r in bpe.bpe_symbols(docs, 4, 10, k=10).collect()
    }
    assert got == {"aa": 2, "bb": 1}


def test_layout_independent(spark):
    docs = _docs(spark, TEXTS)
    a = [
        tuple(r)
        for r in bpe.bpe_merges(docs, n_merges=6, max_terms=100).collect()
    ]
    b = [
        tuple(r)
        for r in bpe.bpe_merges(
            docs.repartition(7), n_merges=6, max_terms=100
        ).collect()
    ]
    assert a == b


def test_guards(spark):
    docs = _docs(spark, ["a b"])
    with pytest.raises(ValueError):
        bpe.bpe_merges(docs, n_merges=0)
    with pytest.raises(ValueError):
        bpe.bpe_symbols(docs, max_terms=0)
