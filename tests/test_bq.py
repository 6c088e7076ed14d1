"""Binary quantization (operators/similarity.py bq_*): the sign-bit
word packing pinned against a python replication, Hamming == popcount
of python-packed xor, the refine == exact-cosine-over-candidates
contract, full-window refine == brute cosine, determinism, and
guards."""

import math

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.functions.embed import mock_embed_text
from distributedcodesearchengine_spark.operators import similarity as sim


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _py_words(v):
    words = (len(v) + 31) // 32
    out = []
    for wi in range(words):
        w = 0
        for j in range(32):
            pos = 32 * wi + j
            if pos >= len(v):
                break
            if float(v[pos]) > 0:
                w += 2 ** j
        out.append(w)
    return out


def test_codes_match_python_packing(spark):
    vecs = [mock_embed_text(f"doc {i}", 64) for i in range(25)]
    # a non-multiple-of-32 dim exercises the ragged last word
    vecs40 = [v[:40] for v in vecs]
    for vs in (vecs, vecs40):
        emb = _emb(spark, vs)
        got = {}
        for r in sim.bq_codes_summary(emb).collect():
            got.setdefault(r.vec_id, []).append((r.word_idx, r.word))
        for i, v in enumerate(vs):
            exp = [(wi, w) for wi, w in enumerate(_py_words(v))]
            assert sorted(got[i]) == exp, i


def test_hamming_matches_python(spark):
    vecs = [mock_embed_text(f"doc {i}", 64) for i in range(30)]
    emb = _emb(spark, vecs)
    q = mock_embed_text("the query", 64)
    qw = _py_words(q)
    dists = []
    for i, v in enumerate(vecs):
        vw = _py_words(v)
        d = sum(bin(a ^ b).count("1") for a, b in zip(vw, qw))
        dists.append((d, i))
    dists.sort()
    got = sim.bq_hamming_topk(emb, q, k=8).collect()
    assert [(r.dist, r.vec_id) for r in got] == dists[:8]
    assert [r.rank for r in got] == list(range(1, 9))


def test_refine_full_window_is_brute_cosine(spark):
    vecs = [mock_embed_text(f"doc {i}", 64) for i in range(30)]
    emb = _emb(spark, vecs)
    q = mock_embed_text("the query", 64)

    def cos(v):
        dot = sum(float(a) * float(b) for a, b in zip(v, q))
        nv = math.sqrt(sum(float(a) ** 2 for a in v))
        nq = math.sqrt(sum(float(b) ** 2 for b in q))
        return dot / (nv * nq)

    exp = sorted(((cos(v), -i) for i, v in enumerate(vecs)), reverse=True)
    exp_ids = [-ni for _, ni in exp[:5]]
    got = sim.bq_hamming_topk(emb, q, k=5, refine=6).collect()
    assert [r.vec_id for r in got] == exp_ids
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_refine_candidates_come_from_hamming_cut(spark):
    """refine=1: the refined set IS the Hamming top-k set, re-ranked
    by exact cosine."""
    vecs = [mock_embed_text(f"doc {i}", 64) for i in range(40)]
    emb = _emb(spark, vecs)
    q = mock_embed_text("other query", 64)
    ham = {r.vec_id for r in sim.bq_hamming_topk(emb, q, k=6).collect()}
    ref = {r.vec_id for r in sim.bq_hamming_topk(emb, q, k=6, refine=1).collect()}
    assert ref == ham


def test_layout_independent(spark):
    vecs = [mock_embed_text(f"doc {i}", 64) for i in range(20)]
    emb = _emb(spark, vecs)
    q = mock_embed_text("q", 64)
    a = [tuple(r) for r in sim.bq_hamming_topk(emb, q, k=5).collect()]
    b = [
        tuple(r)
        for r in sim.bq_hamming_topk(emb.repartition(7), q, k=5).collect()
    ]
    assert a == b


def test_guards(spark):
    emb = _emb(spark, [mock_embed_text("x", 64)])
    with pytest.raises(ValueError):
        sim.bq_hamming_topk(emb, [0.0] * 32)  # dim mismatch
    with pytest.raises(ValueError):
        sim.bq_hamming_topk(emb, [0.0] * 64, k=0)
    with pytest.raises(ValueError):
        sim.bq_hamming_topk(emb, [0.0] * 64, refine=-1)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        sim.bq_codes_summary(empty)


def test_topk_plan_is_take_ordered(spark):
    vecs = [mock_embed_text(f"doc {i}", 64) for i in range(15)]
    emb = _emb(spark, vecs)
    q = mock_embed_text("q", 64)
    for refine in (0, 3):
        plan = (
            sim.bq_hamming_topk(emb, q, k=5, refine=refine)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan


# --- Matryoshka (MRL) prefix serving ----------------------------------------


def _cos(a, b):
    dot = sum(float(x) * float(y) for x, y in zip(a, b))
    na = math.sqrt(sum(float(x) ** 2 for x in a))
    nb = math.sqrt(sum(float(y) ** 2 for y in b))
    return dot / (na * nb)


def test_mrl_prefix_matches_python(spark):
    vecs = [mock_embed_text(f"doc {i}", 64) for i in range(30)]
    emb = _emb(spark, vecs)
    q = mock_embed_text("the query", 64)
    got = sim.mrl_topk(emb, q, dim_prefix=16, k=6).collect()
    exp = sorted(
        ((_cos(v[:16], q[:16]), -i) for i, v in enumerate(vecs)), reverse=True
    )
    assert [r.vec_id for r in got] == [-ni for _, ni in exp[:6]]


def test_mrl_full_prefix_is_plain_cosine(spark):
    """dim_prefix == dim reduces to the brute cosine ranking."""
    vecs = [mock_embed_text(f"doc {i}", 64) for i in range(25)]
    emb = _emb(spark, vecs)
    q = mock_embed_text("the query", 64)
    got = [r.vec_id for r in sim.mrl_topk(emb, q, dim_prefix=64, k=5).collect()]
    exp = sorted(((_cos(v, q), -i) for i, v in enumerate(vecs)), reverse=True)
    assert got == [-ni for _, ni in exp[:5]]


def test_mrl_refine_full_window_is_brute_cosine(spark):
    vecs = [mock_embed_text(f"doc {i}", 64) for i in range(30)]
    emb = _emb(spark, vecs)
    q = mock_embed_text("funnel", 64)
    got = [
        r.vec_id
        for r in sim.mrl_topk(emb, q, dim_prefix=8, k=5, refine=6).collect()
    ]
    exp = sorted(((_cos(v, q), -i) for i, v in enumerate(vecs)), reverse=True)
    assert got == [-ni for _, ni in exp[:5]]


def test_mrl_guards(spark):
    emb = _emb(spark, [mock_embed_text("x", 64)])
    q = [0.5] * 64
    with pytest.raises(ValueError):
        sim.mrl_topk(emb, q, dim_prefix=0)
    with pytest.raises(ValueError):
        sim.mrl_topk(emb, q, dim_prefix=65)
    with pytest.raises(ValueError):
        sim.mrl_topk(emb, q, dim_prefix=8, k=0)


# --- embedding snapshot drift -------------------------------------------------


def test_embedding_drift_identical_and_shifted(spark):
    vecs = [mock_embed_text(f"doc {i}", 16) for i in range(20)]
    a = _emb(spark, vecs)
    # identical snapshot (re-keyed): cos 1.0, shift 0.0 — and bit-exact
    b = a.withColumn("vec_id", F.col("vec_id") + 100)
    row = sim.embedding_drift(a, b).first()
    assert row.n_old == 20 and row.n_new == 20
    assert row.cos_means == 1.0 and row.l2_shift == 0.0
    # a constant offset on every vector moves the mean by exactly it
    import math

    off = 0.5
    c = a.withColumn(
        "embedding",
        F.expr(f"transform(embedding, x -> x + CAST({off} AS FLOAT))"),
    )
    row2 = sim.embedding_drift(a, c).first()
    assert abs(row2.l2_shift - math.sqrt(16 * off * off)) < 1e-4
    assert row2.cos_means < 1.0


def test_embedding_drift_matches_numpy_means(spark):
    import numpy as np

    va = [mock_embed_text(f"a {i}", 16) for i in range(15)]
    vb = [mock_embed_text(f"b {i}", 16) for i in range(9)]
    a, b = _emb(spark, va), _emb(spark, vb)
    row = sim.embedding_drift(a, b).first()
    ma = np.mean(np.array(va, dtype=np.float64), axis=0)
    mb = np.mean(np.array(vb, dtype=np.float64), axis=0)
    cos = float(ma @ mb / (np.linalg.norm(ma) * np.linalg.norm(mb)))
    assert abs(row.cos_means - cos) < 1e-6
    assert abs(row.l2_shift - float(np.linalg.norm(ma - mb))) < 1e-6
