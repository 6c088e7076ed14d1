

# --- ANN recall harness ------------------------------------------------------


def _ar_emb(spark, n=40, dim=16):
    from distributedcodesearchengine_spark.functions.embed import (
        mock_embed_text,
    )

    vecs = [mock_embed_text(f"doc {i}", dim) for i in range(n)]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_ann_recall_full_probe_is_one(spark):
    """nprobe == k_cells scans everything -> the IVF ranking IS the
    exact ranking -> recall 1.0 for every query."""
    from distributedcodesearchengine_spark.functions.embed import (
        mock_embed_text,
    )
    from distributedcodesearchengine_spark.operators.similarity import (
        ann_recall,
    )

    emb = _ar_emb(spark)
    qvs = [mock_embed_text(w, 16) for w in ("alpha", "beta")]
    out = ann_recall(emb, qvs, k=5, nprobe=16, k_cells=16).collect()
    assert [r["recall"] for r in out] == [1.0, 1.0]
    assert [r["hits"] for r in out] == [5, 5]


def test_ann_recall_matches_manual_intersection(spark):
    import pytest

    from distributedcodesearchengine_spark.functions.embed import (
        cosine_topk,
        mock_embed_text,
    )
    from distributedcodesearchengine_spark.operators.similarity import (
        ann_recall,
        ivf_topk,
    )

    emb = _ar_emb(spark)
    qv = mock_embed_text("gamma", 16)
    exact = {r["vec_id"] for r in cosine_topk(emb, qv, 5).collect()}
    approx = {r["vec_id"] for r in ivf_topk(
        emb, qv, topk=5, nprobe=1, dim=16, k_cells=16).collect()}
    want = len(exact & approx)
    out = ann_recall(emb, [qv], k=5, nprobe=1, k_cells=16).collect()[0]
    assert out["hits"] == want
    assert out["recall"] == pytest.approx(want / 5.0)


def test_ann_recall_monotone_in_nprobe(spark):
    from distributedcodesearchengine_spark.functions.embed import (
        mock_embed_text,
    )
    from distributedcodesearchengine_spark.operators.similarity import (
        ann_recall,
    )

    emb = _ar_emb(spark)
    qvs = [mock_embed_text("delta", 16)]
    r1 = ann_recall(emb, qvs, k=5, nprobe=1, k_cells=16).collect()[0]["recall"]
    r4 = ann_recall(emb, qvs, k=5, nprobe=4, k_cells=16).collect()[0]["recall"]
    r16 = ann_recall(emb, qvs, k=5, nprobe=16, k_cells=16).collect()[0]["recall"]
    assert r1 <= r4 <= r16 == 1.0


def test_ann_recall_guards(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.similarity import (
        ann_recall,
    )

    emb = _ar_emb(spark, n=5)
    with pytest.raises(ValueError):
        ann_recall(emb, [], k=5)
    with pytest.raises(ValueError):
        ann_recall(emb, [[0.1] * 16], k=0)


def test_ann_recall_modes(spark):
    """bq and mrl modes equal a manual tier-vs-exact intersection; the
    full-dim mrl prefix is recall 1.0."""
    import pytest

    from distributedcodesearchengine_spark.functions.embed import (
        cosine_topk,
        mock_embed_text,
    )
    from distributedcodesearchengine_spark.operators.similarity import (
        ann_recall,
        bq_hamming_topk,
        mrl_topk,
    )

    emb = _ar_emb(spark)
    qv = mock_embed_text("epsilon", 16)
    exact = {r["vec_id"] for r in cosine_topk(emb, qv, 5).collect()}
    bq_ids = {r["vec_id"] for r in bq_hamming_topk(emb, qv, k=5).collect()}
    got_bq = ann_recall(emb, [qv], k=5, mode="bq").collect()[0]
    assert got_bq["hits"] == len(exact & bq_ids)
    mrl_ids = {r["vec_id"]
               for r in mrl_topk(emb, qv, dim_prefix=4, k=5).collect()}
    got_mrl = ann_recall(emb, [qv], k=5, mode="mrl", dim_prefix=4).collect()[0]
    assert got_mrl["hits"] == len(exact & mrl_ids)
    # full-prefix mrl IS the exact ranking
    full = ann_recall(emb, [qv], k=5, mode="mrl", dim_prefix=16).collect()[0]
    assert full["recall"] == 1.0
    with pytest.raises(ValueError):
        ann_recall(emb, [qv], mode="hnsw")
