"""DSIR importance resampling (operators/dsir.py): the per-doc
log-weight pinned against a full pure-Python replication (tokenize ->
grams -> md5 buckets -> Laplace LMs -> bucket-ordered fold), the
Gumbel-top-k selection pinned the same way, target-enrichment
direction on a separable corpus, layout independence, and guards."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.operators import dsir
from distributedcodesearchengine_spark.oracle.tokenizer import tokenize


def _docs(spark, texts, langs):
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf

    d = spark.createDataFrame(
        [(i, langs[i], t) for i, t in enumerate(texts)],
        "doc_id long, lang string, text string",
    )
    return d.select("doc_id", "lang", "text", tokenize_udf("text").alias("tokens"))


def _bucket(gram, m):
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % m


def _py_weights(texts, langs, target_lang, m):
    """Pure-python replication of dsir_weights."""
    per_doc = []
    raw, tgt = {}, {}
    for i, t in enumerate(texts):
        toks = tokenize(t)
        grams = list(toks) + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        counts = {}
        for g in grams:
            b = _bucket(g, m)
            counts[b] = counts.get(b, 0) + 1
        per_doc.append(counts)
        for b, c in counts.items():
            raw[b] = raw.get(b, 0) + c
            if langs[i] == target_lang:
                tgt[b] = tgt.get(b, 0) + c
    tr = float(sum(raw.values()))
    tt = float(sum(tgt.get(b, 0) for b in raw))
    out = {}
    for i, counts in enumerate(per_doc):
        s = 0.0
        for b in sorted(counts):  # bucket-ordered fold
            lr = math.log((tgt.get(b, 0) + 1.0) / (tt + float(m))) - math.log(
                (raw[b] + 1.0) / (tr + float(m))
            )
            s = s + counts[b] * lr
        out[i] = (sum(counts.values()), s)
    return out


TEXTS = [
    "spark table scan merge window sort",
    "json parser spark json token stream",
    "table scan window window filter row",
    "vector embed cosine bucket hash probe",
    "json json token parse stream reader",
    "merge sort window table scan filter",
    "bucket probe hash vector embed embed",
    "row filter scan table spark window",
]
LANGS = ["en", "de", "en", "fr", "de", "en", "fr", "en"]


def test_weights_match_python_replication(spark):
    d = _docs(spark, TEXTS, LANGS)
    got = {
        r.doc_id: (r.n_grams, r.logw)
        for r in dsir.dsir_weights(d, "en", m=64).collect()
    }
    exp = _py_weights(TEXTS, LANGS, "en", 64)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0], i
        assert got[i][1] == pytest.approx(exp[i][1], abs=1e-9), i


def test_sample_matches_python_gumbel(spark):
    d = _docs(spark, TEXTS, LANGS)
    got = [
        (r.rank, r.doc_id)
        for r in dsir.dsir_sample(d, k=4, target_lang="en", m=64).collect()
    ]
    exp_w = _py_weights(TEXTS, LANGS, "en", 64)
    keyed = []
    for i, (_, logw) in exp_w.items():
        hb = int(
            hashlib.md5(f"dsir|{i}".encode()).hexdigest()[:8], 16
        )
        u = (hb + 0.5) / 4294967296.0
        keyed.append((logw + (-math.log(-math.log(u))), -i))
    keyed.sort(reverse=True)
    exp_ids = [-ni for _, ni in keyed[:4]]
    assert [doc for _, doc in got] == exp_ids
    assert [r for r, _ in got] == [1, 2, 3, 4]


def test_target_docs_score_higher_on_separable_corpus(spark):
    """Target-language docs use a disjoint vocabulary -> every target
    doc outweighs every raw-only doc (the enrichment direction DSIR
    exists to produce)."""
    texts = (
        ["alpha beta gamma delta epsilon zeta"] * 3
        + ["omega sigma theta lambda kappa phi"] * 3
    )
    langs = ["en"] * 3 + ["de"] * 3
    d = _docs(spark, texts, langs)
    w = {r.doc_id: r.logw for r in dsir.dsir_weights(d, "en", m=128).collect()}
    assert min(w[i] for i in (0, 1, 2)) > max(w[i] for i in (3, 4, 5))


def test_empty_tokens_doc_gets_zero(spark):
    d = _docs(spark, ["spark table scan", "!! ??"], ["en", "en"])
    w = {r.doc_id: (r.n_grams, r.logw) for r in dsir.dsir_weights(d).collect()}
    assert w[1] == (0, 0.0)


def test_layout_independent(spark):
    d = _docs(spark, TEXTS, LANGS)
    a = {r.doc_id: r.logw for r in dsir.dsir_weights(d, "en", 64).collect()}
    b = {
        r.doc_id: r.logw
        for r in dsir.dsir_weights(d.repartition(7), "en", 64).collect()
    }
    assert a == b


def test_guards(spark):
    d = _docs(spark, ["spark table"], ["en"])
    with pytest.raises(ValueError):
        dsir.dsir_weights(d, m=0)
    with pytest.raises(ValueError):
        dsir.dsir_sample(d, k=0)


def test_sample_plan_is_take_ordered(spark):
    d = _docs(spark, TEXTS, LANGS)
    plan = (
        dsir.dsir_sample(d, k=3, m=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
