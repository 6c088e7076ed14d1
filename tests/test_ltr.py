"""Learning-to-rank rescorer tests (operators/ltr.ltr_rescore_topk):
linear model over (bm25, n_matched, ln(1+dl), max_tf), bounded rescore
window, injectable weight artifact."""

import math

import pytest

from distributedcodesearchengine_spark.operators.ltr import (
    DEFAULT_LTR_WEIGHTS,
    load_ltr,
    ltr_rescore_topk,
    save_ltr,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk
from tests.test_search_after import _index

TEXTS = [
    "apple banana apple cherry",
    "banana cherry durian fig grape",
    "apple fig",
    "grape grape grape durian",
]


def test_ltr_features_and_dot(spark):
    idx = _index(spark, TEXTS)
    base = {r["doc_id"]: r["score"]
            for r in bm25_topk(idx, "apple banana", k=10).collect()}
    got = {r["doc_id"]: r for r in ltr_rescore_topk(
        idx, "apple banana", k=10, window_size=10).collect()}
    toks = [t.split() for t in TEXTS]
    w = DEFAULT_LTR_WEIGHTS
    for d, r in got.items():
        ts = toks[d]
        nm = sum(1 for t in ("apple", "banana") if t in ts)
        mt = max((ts.count(t) for t in ("apple", "banana")), default=0)
        want = (w[0] * base[d] + w[1] * nm
                + w[2] * math.log(1.0 + len(ts)) + w[3] * mt)
        assert r["n_matched"] == nm
        assert r["score"] == pytest.approx(want, abs=1e-6)
        assert r["base"] == pytest.approx(base[d], abs=1e-6)


def test_ltr_weights_change_ranking(spark):
    idx = _index(spark, TEXTS)
    default = [r["doc_id"] for r in ltr_rescore_topk(
        idx, "apple banana", k=10, window_size=10).collect()]
    # huge negative length weight -> shortest doc first
    short_first = [r["doc_id"] for r in ltr_rescore_topk(
        idx, "apple banana", weights=(0.0, 0.0, -10.0, 0.0),
        k=10, window_size=10).collect()]
    assert short_first != default
    lens = [len(TEXTS[d].split()) for d in short_first]
    assert lens == sorted(lens)


def test_ltr_artifact_roundtrip(tmp_path, spark):
    p = str(tmp_path / "ltr.json")
    save_ltr(p, (2.0, 1.0, 0.0, 0.5))
    assert load_ltr(p) == (2.0, 1.0, 0.0, 0.5)
    idx = _index(spark, TEXTS)
    a = ltr_rescore_topk(idx, "apple", weights=load_ltr(p), k=5).collect()
    b = ltr_rescore_topk(idx, "apple", weights=(2.0, 1.0, 0.0, 0.5),
                         k=5).collect()
    assert a == b


def test_ltr_guards(spark):
    idx = _index(spark, TEXTS)
    with pytest.raises(ValueError):
        ltr_rescore_topk(idx, "apple", k=30, window_size=10)
    with pytest.raises(ValueError):
        ltr_rescore_topk(idx, "apple", weights=(1.0, 2.0))
    assert ltr_rescore_topk(idx, "!! ??").count() == 0
