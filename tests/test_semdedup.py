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
    return load_table(spark, sf_dir, "embeddings").persist()


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
