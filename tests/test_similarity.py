"""Embedding near-dup: the LSH-bucketed scale path must (a) contain no
cartesian product in its physical plan, (b) return a subset of the exact
all-pairs result, and (c) find every pair whose LSH buckets are within
Hamming distance 1 (the designed recall guarantee)."""

from pyspark.sql import functions as F

from distributedcodesearchengine_spark.operators.similarity import (
    hyperplane_buckets,
    near_dup_pairs,
    near_dup_pairs_lsh,
)
from distributedcodesearchengine_spark.plans.audit import assert_plan
from distributedcodesearchengine_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_lsh_plan_has_no_cartesian(spark):
    out = near_dup_pairs_lsh(_emb(spark), threshold=0.25, limit=50)
    assert_plan(out, must_not_contain=["CartesianProduct", "BroadcastNestedLoopJoin"])


def test_lsh_is_subset_of_exact(spark):
    emb = _emb(spark).limit(200).cache()
    exact = {
        (r.vec_a, r.vec_b)
        for r in near_dup_pairs(emb, threshold=0.25, limit=10**6).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in near_dup_pairs_lsh(emb, threshold=0.25, limit=10**6).collect()
    }
    assert lsh <= exact
    # recall guarantee: every exact pair with Hamming(bucket) <= 1 is found
    buckets = {r.vec_id: r.bucket for r in hyperplane_buckets(emb).collect()}
    for a, b in exact:
        if bin(buckets[a] ^ buckets[b]).count("1") <= 1:
            assert (a, b) in lsh, (a, b)


def test_ivf_full_probe_equals_brute_force(spark):
    """With nprobe == k_cells, IVF degenerates to exact brute force —
    rank- and score-identical to cosine_topk; with nprobe < k_cells it
    returns a subset drawn only from the probed cells."""
    from distributedcodesearchengine_spark.functions.embed import (
        cosine_topk,
        mock_embed_text,
    )
    from distributedcodesearchengine_spark.functions.rounding import round6_py
    from distributedcodesearchengine_spark.operators.similarity import (
        N_IVF_CELLS,
        ivf_cells,
        ivf_topk,
    )

    emb = _emb(spark).cache()
    qvec = mock_embed_text("distributed table scan", 64)
    brute = [
        (r["rank"], r["vec_id"], round6_py(r["score"]))
        for r in cosine_topk(emb, qvec, 10).collect()
    ]
    full = [
        (r["rank"], r["vec_id"], r["score"])
        for r in ivf_topk(emb, qvec, topk=10, nprobe=N_IVF_CELLS).collect()
    ]
    assert full == brute

    cells = {r["vec_id"]: r["cell"] for r in ivf_cells(emb).collect()}
    assert all(0 <= c < N_IVF_CELLS for c in cells.values())
    probed = ivf_topk(emb, qvec, topk=10, nprobe=4).collect()
    assert 0 < len(probed) <= 10
    brute_ids = {b[1] for b in brute}
    # probed results are real vectors and scores agree with brute force
    # wherever both contain the id
    bmap = {b[1]: b[2] for b in brute}
    for r in probed:
        if r["vec_id"] in brute_ids:
            assert abs(r["score"] - bmap[r["vec_id"]]) < 1e-9


def test_mega_bucket_cap_drops_quadratic_bucket(spark):
    emb = _emb(spark).limit(50)
    # cap of 0 keeps no bucket -> no candidates at all
    out = near_dup_pairs_lsh(emb, threshold=-1.0, limit=10**6, max_bucket=0)
    assert out.count() == 0
