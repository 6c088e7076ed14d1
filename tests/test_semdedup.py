"""SemDeDup (cluster-then-prune semantic dedup) tests."""

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.operators.similarity import (
    ivf_cells,
    semdedup,
)
from distributedcodesearchengine_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    # yield + unpersist: a leaked persist of the raw embeddings scan
    # would cache-substitute into later tests' plans (CacheManager keys
    # by logical plan) and hide their PushedFilters asserts
    e = load_table(spark, sf_dir, "embeddings").persist()
    yield e
    e.unpersist()


def test_min_id_representative_survives(emb):
    """Every dropped vector has a surviving-or-not lower-id cell-mate
    over the threshold, and the minimum id of each cell always
    survives (nothing can dominate it)."""
    out = semdedup(emb, threshold=0.25).collect()
    kept = {r["vec_id"] for r in out}
    cells = {r["vec_id"]: r["cell"] for r in ivf_cells(emb).collect()}
    assert kept  # non-vacuous
    by_cell = {}
    for v, c in cells.items():
        by_cell.setdefault(c, []).append(v)
    for c, members in by_cell.items():
        assert min(members) in kept


def test_threshold_monotone(emb):
    """A higher threshold can only keep MORE vectors."""
    lo = {r["vec_id"] for r in semdedup(emb, threshold=0.25).collect()}
    hi = {r["vec_id"] for r in semdedup(emb, threshold=0.9).collect()}
    assert lo <= hi


def test_mega_cell_cap_keeps_everything(emb):
    """max_cell below every cell size -> pruning disabled, all kept."""
    n = emb.count()
    out = semdedup(emb, threshold=0.0, max_cell=0)
    assert out.count() == n


def test_synthetic_twins(spark):
    """Two near-identical vectors in one cell -> higher id dropped;
    an orthogonal-ish vector survives."""
    from distributedcodesearchengine_spark.functions.embed import (
        mock_embed_text,
    )

    base = mock_embed_text("twin", 64)
    tweak = [v * 1.001 for v in base]  # same direction -> cos ~ 1
    other = mock_embed_text("completely different", 64)
    df = spark.createDataFrame(
        [(1, base), (2, tweak), (3, other)],
        "vec_id long, embedding array<float>",
    )
    kept = {r["vec_id"] for r in semdedup(df, threshold=0.95).collect()}
    assert 1 in kept and 2 not in kept


def _twin_corpus(spark):
    """4 direction clusters x 6 scaled copies, all within a few degrees
    of one base direction: the fixed basis funnels ALL of them into one
    mega-cell, trained centroids separate the 4 sub-directions."""
    import numpy as np

    from distributedcodesearchengine_spark.functions.embed import (
        mock_embed_text,
    )

    base = np.array(mock_embed_text("cluster-base", 64), dtype=np.float64)
    rows = []
    vid = 0
    for j in range(4):
        pert = np.array(mock_embed_text(f"dir-{j}", 64), dtype=np.float64)
        d = base + 0.05 * pert
        d = d / np.sqrt((d * d).sum())
        for i in range(6):
            rows.append((vid, [float(x) for x in d * (1.0 + 0.001 * i)]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_trained_centroids_prune_where_fixed_basis_over_caps(spark):
    """The round-3 gap scenario: with the fixed basis every vector
    lands in one cell, the over-cap exemption fires and SemDeDup keeps
    everything; trained centroids split the directions into under-cap
    cells and the near-twins actually prune."""
    from distributedcodesearchengine_spark.operators.similarity import (
        train_centroids,
    )

    df = _twin_corpus(spark)
    fixed = semdedup(df, threshold=0.999, max_cell=12)
    assert fixed.count() == 24  # precondition: cap exemption, no pruning

    cents = train_centroids(df, k=4, sample_n=100, iters=10)
    kept = {
        r["vec_id"]
        for r in semdedup(
            df, threshold=0.999, max_cell=12, centroids=cents
        ).collect()
    }
    # scaled copies share a direction (cos ~ 1 >= .999) -> essentially
    # only each cluster's min id survives (float32 storage can nudge a
    # borderline vector into its own cell, where it survives as that
    # cell's min — allow a one-or-two-vector tail, but pruning must
    # have genuinely fired, unlike the fixed basis)
    assert {0, 6, 12, 18} <= kept, kept
    assert len(kept) <= 6, kept


def test_train_centroids_deterministic_and_roundtrip(spark, tmp_path):
    from distributedcodesearchengine_spark.operators.similarity import (
        load_centroids,
        save_centroids,
        train_centroids,
    )

    df = _twin_corpus(spark)
    a = train_centroids(df, k=4, sample_n=100)
    b = train_centroids(df.repartition(7), k=4, sample_n=100)
    assert a == b  # layout-independent, bit-identical
    p = str(tmp_path / "cents.json")
    save_centroids(p, a)
    assert load_centroids(p) == a


def test_trained_centroids_duckdb_parity(spark, sf_dir):
    """semdedup with TRAINED centroids still hash-matches the DuckDB
    mirror (the seam keeps the oracle contract: centroids are plain
    literals on both engines)."""
    import duckdb

    from distributedcodesearchengine_spark.operators.similarity import (
        semdedup_sql,
        train_centroids,
    )
    from distributedcodesearchengine_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids(emb, k=8, sample_n=512, iters=5)
    got = [
        (r["vec_id"], r["cell"])
        for r in semdedup(emb, threshold=0.25, centroids=cents).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = [
        (int(v), int(c))
        for v, c in con.execute(
            semdedup_sql(threshold=0.25, centroids=cents)
        ).fetchall()
    ]
    assert got == want and got


def test_auto_k_sizes_cells_to_corpus(spark, sf_dir):
    """k defaults to ceil(n / max_cell) — the sizing rule that keeps
    expected occupancy under the SemDeDup exemption."""
    from distributedcodesearchengine_spark.operators.similarity import (
        train_centroids,
    )
    from distributedcodesearchengine_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    cents = train_centroids(emb, max_cell=100, sample_n=256, iters=2)
    assert len(cents) == max(2, min(4096, -(-n // 100)))


def test_large_k_pandas_assignment_matches_jvm(emb, monkeypatch):
    """Above _CELL_EXPR_MAX_K the cell assignment switches to the
    Arrow-vectorized matmul path; with well-separated centroids the
    two paths must assign identically (the JVM fold and the numpy
    matmul can differ only at ulp level, which distinct dots ignore).
    Regression: the old per-branch CASE was O(k^2) expression nodes,
    unusable at the k≈4096 train_centroids auto-sizes for web scale."""
    from distributedcodesearchengine_spark.operators import similarity as sim

    cents = sim.train_centroids(emb, k=8, sample_n=512)
    jvm = {r.vec_id: r.cell for r in ivf_cells(emb, centroids=cents).collect()}
    monkeypatch.setattr(sim, "_CELL_EXPR_MAX_K", 4)
    pdu = {r.vec_id: r.cell for r in ivf_cells(emb, centroids=cents).collect()}
    assert pdu == jvm
