"""int8 scalar quantization (operators/similarity.py): reconstruction
error bound, boundary codes, constant dimensions, top-k fidelity on
well-separated vectors, and determinism under repartition."""

from pyspark.sql import functions as F

from distributedcodesearchengine_spark.functions.embed import mock_embed_text
from distributedcodesearchengine_spark.operators.similarity import (
    SQ_LEVELS,
    _sq_codes_col,
    _sq_dequant_col,
    sq_codes_summary,
    sq_params,
    sq_topk,
)


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_sq_reconstruction_error_bounded(spark):
    vecs = [mock_embed_text(f"doc {i}", 16) for i in range(40)]
    emb = _emb(spark, vecs)
    params = sq_params(emb)
    dq = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        _sq_dequant_col(
            _sq_codes_col(F.col("embedding"), params), params
        ).alias("w"),
    ).collect()
    steps = [(hi - lo) / float(SQ_LEVELS) for lo, hi in params]
    for r in dq:
        for x, y, st in zip(r.v, r.w, steps):
            assert abs(x - y) <= st / 2 + 1e-12


def test_sq_boundary_and_constant_dims(spark):
    # dim0 spans [0,1]; dim1 is constant (hi == lo)
    emb = _emb(spark, [[0.0, 5.0], [1.0, 5.0], [0.5, 5.0]])
    params = sq_params(emb)
    assert params[1][0] == params[1][1] == 5.0
    rows = {
        r.vec_id: r.codes
        for r in emb.select(
            "vec_id",
            _sq_codes_col(F.col("embedding"), params).alias("codes"),
        ).collect()
    }
    assert rows[0][0] == 0           # x == lo -> 0
    assert rows[1][0] == SQ_LEVELS   # x == hi -> 255
    assert all(r[1] == 0 for r in rows.values())  # constant dim -> 0
    # constant dim dequantizes back to exactly lo
    dq = emb.select(
        _sq_dequant_col(
            _sq_codes_col(F.col("embedding"), params), params
        ).alias("w")
    ).collect()
    assert all(r.w[1] == 5.0 for r in dq)


def test_sq_topk_finds_the_separated_neighbor(spark):
    # vec 0 is (nearly) the query direction; others are orthogonal-ish
    base = [1.0] + [0.0] * 15
    vecs = [base] + [
        [0.0] * (i % 16) + [1.0] + [0.0] * (15 - i % 16) for i in range(1, 30)
    ]
    emb = _emb(spark, vecs)
    got = sq_topk(emb, base, k=3).collect()
    assert got[0].vec_id == 0
    assert got[0].score > 0.99


def test_sq_deterministic_under_repartition(spark):
    vecs = [mock_embed_text(f"page {i}", 16) for i in range(50)]
    emb = _emb(spark, vecs)
    q = mock_embed_text("probe", 16)
    a = [(r.rank, r.vec_id, r.score) for r in sq_topk(emb, q, 10).collect()]
    b = [
        (r.rank, r.vec_id, r.score)
        for r in sq_topk(emb.repartition(7), q, 10).collect()
    ]
    assert a == b
    ca = sq_codes_summary(emb).collect()
    cb = sq_codes_summary(emb.repartition(5)).collect()
    assert [tuple(r) for r in ca] == [tuple(r) for r in cb]
