"""ColBERT MaxSim late-interaction tests (operators/pipeline
.maxsim_topk): score(q, d) = sum_j max_chunk (qvec_j . chunk_vec),
chunk vectors from the sha2 hash-embed lane (chunk_semantic_topk's
embedding contract).
"""

import hashlib
import math

import pytest

from distributedcodesearchengine_spark.functions.embed import mock_embed_text
from distributedcodesearchengine_spark.operators.pipeline import (
    chunk_semantic_topk,
    maxsim_topk,
)


def _docs(spark, texts):
    from distributedcodesearchengine_spark.functions.udfs import tokenize_udf

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return d.select("doc_id", "text", tokenize_udf("text").alias("tokens"))


def _py_chunk_vec(chunk_text):
    h = hashlib.sha256(chunk_text.encode()).hexdigest()
    v = [(int(h[8 * i: 8 * i + 8], 16) / 4294967296.0) * 2 - 1 for i in range(8)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v] if n > 0 else [0.0] * 8


def _py_maxsim(texts, qvecs, size=32, overlap=8):
    from distributedcodesearchengine_spark.oracle.tokenizer import tokenize

    stride = size - overlap
    out = {}
    for i, t in enumerate(texts):
        toks = tokenize(t)
        if not toks:
            continue
        chunks = [
            " ".join(toks[s: s + size]) for s in range(0, len(toks), stride)
        ]
        vecs = [_py_chunk_vec(c) for c in chunks]
        s = 0.0
        for qv in qvecs:
            s += max(sum(a * b for a, b in zip(v, qv[:8])) for v in vecs)
        out[i] = s
    return out


TEXTS = [
    "distributed table scan engine " + " ".join(f"w{i:02d}" for i in range(40)),
    "alpha beta gamma delta",
    "table scan " + " ".join(f"x{i:02d}" for i in range(70)),
    "unrelated words entirely different content here",
]


def test_maxsim_matches_python(spark):
    qvecs = [mock_embed_text(w, 64) for w in ("distributed", "table", "scan")]
    got = {r["doc_id"]: r["score"]
           for r in maxsim_topk(_docs(spark, TEXTS), qvecs, k=10).collect()}
    want = _py_maxsim(TEXTS, qvecs)
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-6)


def test_single_qvec_single_chunk_equals_cosine(spark):
    """With ONE query vector and docs short enough for one chunk,
    MaxSim degenerates to the chunk cosine — rank-identical to
    chunk_semantic_topk."""
    short = ["apple banana cherry", "durian fig grape", "apple fig zebra"]
    qv = mock_embed_text("apple", 64)
    a = [(r["doc_id"], r["score"])
         for r in maxsim_topk(_docs(spark, short), [qv], k=10).collect()]
    b = [(r["doc_id"], r["score"])
         for r in chunk_semantic_topk(_docs(spark, short), qv, k=10).collect()]
    assert a == b


def test_max_over_chunks_rewards_best_window(spark):
    """A long doc whose LAST window matches must score as high on that
    qvec as a short doc that is exactly the matching window — max, not
    avg, over chunks."""
    payload = "signal phrase here"
    long = " ".join(f"pad{i:03d}" for i in range(64)) + " " + payload
    texts = [long, payload]
    qvecs = [mock_embed_text("signal", 64)]
    got = {r["doc_id"]: r["score"]
           for r in maxsim_topk(_docs(spark, texts), qvecs, k=10,
                                size=8, overlap=0).collect()}
    # doc 0's best window contains the same 3 payload tokens but inside
    # an 8-token window; doc 1 IS the payload window. Both must equal
    # the python replication (the max picked the right window).
    want = _py_maxsim(texts, qvecs, size=8, overlap=0)
    for d in (0, 1):
        assert got[d] == pytest.approx(want[d], abs=1e-6)


def test_guards(spark):
    with pytest.raises(ValueError):
        maxsim_topk(_docs(spark, TEXTS), [], k=5)
    with pytest.raises(ValueError):
        maxsim_topk(_docs(spark, TEXTS), [mock_embed_text("a", 64)], k=0)
