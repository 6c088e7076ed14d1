"""Product quantization (operators/pq.py): code range/packing, the
ADC == exact-reconstruction-distance identity, seed-codebook
determinism under repartition, trained codebooks beating the seed
codebooks on quantization error (and pruning via DuckDB injected-
literal parity), and the argument guards."""

import duckdb
import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.functions.embed import mock_embed_text
from distributedcodesearchengine_spark.operators import pq


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _py_codes(vecs, books):
    """Pure-python replication of the encode contract: per subspace,
    argmin ordered-fold squared distance, lowest index on ties."""
    m = len(books)
    dsub = len(books[0][0])
    out = []
    for v in vecs:
        codes = []
        for j in range(m):
            best, bi = None, None
            for i, entry in enumerate(books[j]):
                acc = 0.0
                for t in range(dsub):
                    d = float(v[j * dsub + t]) - entry[t]
                    acc = acc + d * d
                if best is None or acc < best:
                    best, bi = acc, i
            codes.append(bi)
        out.append(codes)
    return out


def test_pq_codes_match_python_replication(spark):
    vecs = [mock_embed_text(f"doc {i}", 16) for i in range(30)]
    emb = _emb(spark, vecs)
    books = pq.pq_seed_codebooks(emb, m=4, K=5)
    got = {
        r.vec_id: (r.code_key, r.code_min, r.code_max)
        for r in pq.pq_codes_summary(emb, codebooks=books).collect()
    }
    exp = _py_codes(vecs, books)
    K = max(len(b) for b in books)
    for i, codes in enumerate(exp):
        key = sum(c * K**j for j, c in enumerate(codes))
        assert got[i] == (key, min(codes), max(codes))
        assert all(0 <= c < K for c in codes)


def test_pq_adc_equals_reconstruction_distance(spark):
    vecs = [mock_embed_text(f"doc {i}", 16) for i in range(25)]
    emb = _emb(spark, vecs)
    books = pq.pq_seed_codebooks(emb, m=4, K=6)
    q = mock_embed_text("the query", 16)
    got = {
        r.vec_id: r.dist
        for r in pq.pq_adc_topk(emb, q, k=25, codebooks=books).collect()
    }
    m, dsub = 4, 4
    for i, codes in enumerate(_py_codes(vecs, books)):
        # exact ||q - decode(encode(v))||^2, folded subspace-major —
        # the ADC identity: table lookups ARE the reconstruction
        # distance, not an approximation of it
        acc = 0.0
        for j in range(m):
            sub = 0.0
            for t in range(dsub):
                d = q[j * dsub + t] - books[j][codes[j]][t]
                sub = sub + d * d
            acc = acc + sub
        assert got[i] == pytest.approx(acc, abs=1e-6)


def test_pq_seed_codebooks_layout_independent(spark):
    vecs = [mock_embed_text(f"doc {i}", 16) for i in range(40)]
    emb = _emb(spark, vecs)
    b1 = pq.pq_seed_codebooks(emb, m=4, K=8)
    b2 = pq.pq_seed_codebooks(emb.repartition(7), m=4, K=8)
    assert b1 == b2


def test_pq_trained_beats_seed_on_clustered_data(spark, tmp_path):
    # two tight clusters per subspace half: trained centroids land on
    # the cluster means; seed codebooks are whole sample vectors
    base_a = mock_embed_text("cluster a", 8)
    base_b = mock_embed_text("cluster b", 8)
    vecs = []
    for i in range(60):
        base = base_a if i % 2 == 0 else base_b
        vecs.append([x + (i % 5) * 1e-3 for x in base])
    emb = _emb(spark, vecs)
    seed = pq.pq_seed_codebooks(emb, m=2, K=2)
    trained = pq.train_pq_codebooks(emb, m=2, K=2, iters=4)

    def mean_err(books):
        q = [0.0] * 8  # distance to origin == reconstruction norm proxy
        codes = _py_codes(vecs, books)
        tot = 0.0
        for v, cs in zip(vecs, codes):
            for j in range(2):
                for t in range(4):
                    d = v[j * 4 + t] - books[j][cs[j]][t]
                    tot += d * d
        return tot

    assert mean_err(trained) <= mean_err(seed)
    # artifact roundtrip
    p = str(tmp_path / "pq.json")
    pq.save_pq(p, trained)
    assert pq.load_pq(p) == trained


def test_pq_trained_duckdb_injected_parity(spark):
    vecs = [mock_embed_text(f"doc {i}", 16) for i in range(30)]
    emb = _emb(spark, vecs)
    trained = pq.train_pq_codebooks(emb, m=4, K=3, iters=2)
    q = mock_embed_text("the query", 16)
    sp = (
        pq.pq_adc_topk(emb, q, k=8, codebooks=trained)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "embeddings",
        emb.toPandas(),
    )
    oc = (
        con.execute(pq.pq_adc_topk_sql(q, k=8, codebooks=trained))
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert list(sp["vec_id"]) == list(oc["vec_id"])
    assert list(sp["dist"]) == list(oc["dist"])


def test_pq_guards(spark):
    emb = _emb(spark, [mock_embed_text("x", 16)])
    with pytest.raises(ValueError):
        pq.pq_seed_codebooks(emb, m=5, K=4)  # 16 % 5 != 0
    with pytest.raises(ValueError):
        pq.pq_seed_codebooks(emb, m=0, K=4)
    with pytest.raises(ValueError):
        pq.pq_adc_topk(
            emb, [0.0] * 12, codebooks=pq.pq_seed_codebooks(emb, m=4, K=1)
        )  # qvec dim mismatch


def test_pq_topk_plan_is_take_ordered(spark):
    vecs = [mock_embed_text(f"doc {i}", 16) for i in range(20)]
    emb = _emb(spark, vecs)
    books = pq.pq_seed_codebooks(emb, m=4, K=4)
    q = mock_embed_text("the query", 16)
    plan = (
        pq.pq_adc_topk(emb, q, k=5, codebooks=books)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def _py_exact_topk(vecs, q, k):
    """Brute-force exact squared-L2 top-k, ties on vec_id asc."""
    ds = []
    for i, v in enumerate(vecs):
        acc = 0.0
        for a, b in zip(v, q):
            d = float(a) - float(b)
            acc = acc + d * d
        ds.append((acc, i))
    ds.sort()
    return [i for _, i in ds[:k]]


def test_pq_refine_recovers_exact_topk(spark):
    """With a refine window covering the whole corpus the two-stage
    plan IS the exact brute-force ranking — the refine contract."""
    vecs = [mock_embed_text(f"doc {i}", 16) for i in range(30)]
    emb = _emb(spark, vecs)
    books = pq.pq_seed_codebooks(emb, m=4, K=5)
    q = mock_embed_text("the query", 16)
    got = pq.pq_refine_topk(emb, q, k=6, refine=5, codebooks=books).collect()
    assert [r.vec_id for r in got] == _py_exact_topk(vecs, q, 6)
    assert [r.rank for r in got] == list(range(1, 7))


def test_pq_refine_improves_on_adc(spark):
    """Exact re-rank can only improve: the refined top-1's TRUE
    distance is <= the ADC top-1's true distance, and the refined
    ranking is ordered by exact distance."""
    vecs = [mock_embed_text(f"doc {i}", 16) for i in range(40)]
    emb = _emb(spark, vecs)
    books = pq.pq_seed_codebooks(emb, m=4, K=3)  # coarse -> ADC errs
    q = mock_embed_text("refine target", 16)

    def true_d(i):
        acc = 0.0
        for a, b in zip(vecs[i], q):
            d = float(a) - float(b)
            acc = acc + d * d
        return acc

    adc1 = pq.pq_adc_topk(emb, q, k=1, codebooks=books).collect()[0].vec_id
    ref = pq.pq_refine_topk(emb, q, k=5, refine=8, codebooks=books).collect()
    assert true_d(ref[0].vec_id) <= true_d(adc1) + 1e-12
    dists = [r.dist for r in ref]
    assert dists == sorted(dists)


def test_pq_refine_duckdb_parity(spark):
    vecs = [mock_embed_text(f"doc {i}", 16) for i in range(30)]
    emb = _emb(spark, vecs)
    q = mock_embed_text("the query", 16)
    sp = (
        pq.pq_refine_topk(emb, q, k=8, refine=2, m=4, K=5)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", emb.toPandas())
    oc = (
        con.execute(pq.pq_refine_topk_sql(q, k=8, refine=2, m=4, K=5))
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert list(sp["vec_id"]) == list(oc["vec_id"])
    assert list(sp["dist"]) == list(oc["dist"])


def test_pq_refine_guards(spark):
    emb = _emb(spark, [mock_embed_text("x", 16)])
    books = pq.pq_seed_codebooks(emb, m=4, K=1)
    with pytest.raises(ValueError):
        pq.pq_refine_topk(emb, [0.0] * 12, codebooks=books)
    with pytest.raises(ValueError):
        pq.pq_refine_topk(emb, [0.0] * 16, k=0, codebooks=books)
    with pytest.raises(ValueError):
        pq.pq_refine_topk(emb, [0.0] * 16, refine=0, codebooks=books)


def test_pq_refine_plan_shape(spark):
    """Two TakeOrdered cuts (candidate window + final k), no cartesian,
    no corpus re-join: the candidate relation carries the float vector
    so stage 2 never touches the embeddings table again."""
    vecs = [mock_embed_text(f"doc {i}", 16) for i in range(20)]
    emb = _emb(spark, vecs)
    books = pq.pq_seed_codebooks(emb, m=4, K=4)
    q = mock_embed_text("the query", 16)
    plan = (
        pq.pq_refine_topk(emb, q, k=5, refine=3, codebooks=books)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("TakeOrderedAndProject") >= 1
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_ivfpq_composition_contract(spark):
    """IVFPQ == ADC restricted to the probed cells: with nprobe =
    k_cells it IS pq_adc_topk, and with nprobe=1 every result lives in
    the query's own best cell."""
    from distributedcodesearchengine_spark.operators import similarity as sim

    vecs = [mock_embed_text(f"doc {i}", 16) for i in range(40)]
    emb = _emb(spark, vecs)
    books = pq.pq_seed_codebooks(emb, m=4, K=5)
    cents = sim.ivf_centroids(16, 4)
    q = mock_embed_text("the query", 16)
    full = pq.ivfpq_topk(
        emb, q, k=6, nprobe=4, centroids=cents, codebooks=books
    ).collect()
    adc = pq.pq_adc_topk(emb, q, k=6, codebooks=books).collect()
    assert [(r.rank, r.vec_id, r.dist) for r in full] == [
        (r.rank, r.vec_id, r.dist) for r in adc
    ]
    one = pq.ivfpq_topk(
        emb, q, k=6, nprobe=1, centroids=cents, codebooks=books
    ).collect()
    qdots = [sum(a * b for a, b in zip(q, c)) for c in cents]
    best = max(range(len(cents)), key=lambda i: (qdots[i], -i))
    cells = {r.vec_id: r.cell for r in sim.ivf_cells(
        emb, dim=16, k=4, centroids=cents
    ).collect()}
    assert one and all(cells[r.vec_id] == best for r in one)
    # probing fewer cells can only shrink the candidate set
    assert {r.vec_id for r in one} <= {
        r.vec_id
        for r in pq.ivfpq_topk(
            emb, q, k=40, nprobe=4, centroids=cents, codebooks=books
        ).collect()
    }


def test_ivfpq_guards(spark):
    emb = _emb(spark, [mock_embed_text("x", 16)])
    books = pq.pq_seed_codebooks(emb, m=4, K=1)
    with pytest.raises(ValueError):
        pq.ivfpq_topk(emb, [0.0] * 16, k=0, codebooks=books)
    with pytest.raises(ValueError):
        pq.ivfpq_topk(emb, [0.0] * 16, nprobe=0, codebooks=books)
    with pytest.raises(ValueError):
        pq.ivfpq_topk(emb, [0.0] * 12, codebooks=books)


# --- residual IVF-PQ (by_residual=True) --------------------------------------


def _remb(spark, n=30, dim=16):
    vecs = [mock_embed_text(f"doc {i}", dim) for i in range(n)]
    return _emb(spark, vecs)


def test_residual_full_probe_python_replication(spark):
    """nprobe == k_cells: every vector is a candidate; distances match
    a pure-Python replication of residual encode + per-cell ADC."""
    import pytest

    from distributedcodesearchengine_spark.operators.pq import (
        ivfpq_residual_topk,
        pq_seed_codebooks,
    )
    from distributedcodesearchengine_spark.operators.similarity import (
        ivf_centroids,
    )

    emb = _remb(spark)
    rows = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    dim = len(next(iter(rows.values())))
    cents = ivf_centroids(dim, 4)
    cbs = pq_seed_codebooks(emb, 4, 4)
    qv = [0.1] * dim

    def cell_of(v):
        dots = [sum(a * b for a, b in zip(v, c)) for c in cents]
        return dots.index(max(dots))

    m, dsub = len(cbs), len(cbs[0][0])

    def adc(v):
        p = cell_of(v)
        rv = [v[t] - cents[p][t] for t in range(dim)]
        qr = [qv[t] - cents[p][t] for t in range(dim)]
        tot = 0.0
        for j in range(m):
            sv = rv[j * dsub:(j + 1) * dsub]
            dists = [sum((a - b) * (a - b) for a, b in zip(sv, e))
                     for e in cbs[j]]
            code = dists.index(min(dists))
            e = cbs[j][code]
            qs = qr[j * dsub:(j + 1) * dsub]
            tot += sum((a - b) * (a - b) for a, b in zip(qs, e))
        return tot

    got = {r["vec_id"]: r["dist"] for r in ivfpq_residual_topk(
        emb, qv, k=len(rows), nprobe=4, k_cells=4, m=4, K=4,
        codebooks=cbs, centroids=cents).collect()}
    want = {i: adc(v) for i, v in rows.items()}
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=1e-6)


def test_residual_differs_from_plain_ivfpq(spark):
    """The residual encoding must actually change distances vs
    by_residual=False (same seeds, same probe set)."""
    from distributedcodesearchengine_spark.operators.pq import (
        ivfpq_residual_topk,
        ivfpq_topk,
    )

    emb = _remb(spark)
    dim = len(emb.first()["embedding"])
    qv = [0.1] * dim
    a = {r["vec_id"]: r["dist"] for r in ivfpq_topk(
        emb, qv, k=20, nprobe=4, k_cells=4, m=4, K=4).collect()}
    b = {r["vec_id"]: r["dist"] for r in ivfpq_residual_topk(
        emb, qv, k=20, nprobe=4, k_cells=4, m=4, K=4).collect()}
    assert a != b


def test_residual_nprobe1_candidates_live_in_one_cell(spark):
    from distributedcodesearchengine_spark.operators.pq import (
        ivfpq_residual_topk,
    )
    from distributedcodesearchengine_spark.operators.similarity import (
        ivf_cells,
    )

    emb = _remb(spark)
    dim = len(emb.first()["embedding"])
    qv = [0.1] * dim
    got = [r["vec_id"] for r in ivfpq_residual_topk(
        emb, qv, k=5, nprobe=1, k_cells=4, m=4, K=4).collect()]
    cell_by = {r["vec_id"]: r["cell"]
               for r in ivf_cells(emb, dim=dim, k=4).collect()}
    assert len({cell_by[v] for v in got}) <= 1


def test_residual_guards(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.pq import (
        ivfpq_residual_topk,
    )

    emb = _remb(spark)
    dim = len(emb.first()["embedding"])
    with pytest.raises(ValueError):
        ivfpq_residual_topk(emb, [0.1] * dim, k=0)
    with pytest.raises(ValueError):
        ivfpq_residual_topk(emb, [0.1] * dim, nprobe=0)
