"""Similarity search over an embedding column (array<float>).

- ``cosine_topk`` (functions/embed.py) is the brute-force baseline.
- ``hyperplane_buckets``: random-hyperplane LSH — sign bits of dot
  products against NP deterministic hyperplanes (derived from the mock
  embedder so both engines share exact literals) -> bucket id. The scale
  path: restrict candidate search to same-bucket (or Hamming-near
  buckets) before exact scoring.
- ``near_dup_pairs``: embedding-cosine near-duplicate detection on
  bounded inputs (the exact baseline for bucketed variants).

JVM-only expressions (zip_with/aggregate); DuckDB SQL mirrors colocated.
"""

from __future__ import annotations

import math
from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.embed import mock_embed_text
from ..functions.rounding import round6, round6_sql, sql_double

N_PLANES = 8


def hyperplanes(dim: int = 64, n_planes: int = N_PLANES) -> List[List[float]]:
    """Deterministic hyperplanes via the mock embedder (unit vectors)."""
    return [mock_embed_text(f"hyperplane-{i}", dim) for i in range(n_planes)]


def _dot(vec_col, plane: Sequence[float]):
    arr = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(vec_col.cast("array<double>"), arr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def hyperplane_buckets(
    embeddings: DataFrame, dim: int = 64, n_planes: int = N_PLANES,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket) — bucket = sum over planes of (dot >= 0) << i."""
    planes = hyperplanes(dim, n_planes)
    expr = None
    for i, p in enumerate(planes):
        bit = F.when(_dot(F.col(vec_col), p) >= 0, F.lit(2 ** i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        expr = bit if expr is None else expr + bit
    return embeddings.select(F.col(id_col), expr.alias("bucket")).orderBy(id_col)


def hyperplane_buckets_sql(dim: int = 64, n_planes: int = N_PLANES) -> str:
    planes = hyperplanes(dim, n_planes)
    bits = " + ".join(
        "CASE WHEN list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(sql_double(x) for x in p)
        + f"]) >= 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END"
        for i, p in enumerate(planes)
    )
    return f"SELECT vec_id, {bits} AS bucket FROM embeddings ORDER BY vec_id"


N_IVF_CELLS = 16


def ivf_centroids(dim: int = 64, k: int = N_IVF_CELLS) -> List[List[float]]:
    """Deterministic FIXED-BASIS coarse-quantizer centroids (mock-embed
    derived unit vectors, so Spark and DuckDB share exact literals) —
    the default when no trained centroids are injected. At web scale
    fixed directions attract everything into a few mega-cells (every
    cell over ``max_cell`` -> SemDeDup's conservative cap keeps
    everything); ``train_centroids`` is the production seam."""
    return [mock_embed_text(f"ivf-centroid-{i}", dim) for i in range(k)]


def train_centroids(
    embeddings: DataFrame,
    k: int | None = None,
    dim: int = 64,
    sample_n: int = 8192,
    iters: int = 10,
    max_cell: int = 4000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> List[List[float]]:
    """Deterministic sampled spherical k-means coarse quantizer — the
    trained-centroid seam for ``ivf_cells`` / ``ivf_topk`` /
    ``semdedup`` (inject the returned list via their ``centroids``
    argument; persist with ``save_centroids`` the way the
    embed/classify/rerank seams persist their model artifacts).

    Determinism (same input table -> bit-identical centroids, any
    partitioning): the sample is the ``sample_n`` lowest md5(vec_id)
    rows (a total order independent of physical layout), init takes the
    first k distinct sampled vectors in that same order, and Lloyd
    iterations run driver-side in float64 numpy with argmax-dot
    assignment (lowest index wins ties) — the EXACT criterion
    ``ivf_cells`` applies at assignment time (spherical: centroids are
    re-normalized every round, so argmax dot == min angle).

    ``k`` defaults to ceil(n / max_cell) clamped to [2, 4096]: cells
    sized so the expected occupancy sits under SemDeDup's ``max_cell``
    exemption instead of tripping it.

    Scale shape: ONE column-pruned pass for the count (when k is
    auto-sized), one TakeOrdered for the sample; training never touches
    more than ``sample_n`` vectors and the cluster loop is
    O(sample_n * k * dim) on the driver — the corpus-sized work stays
    the assignment pass, which is the same JVM expression chain as the
    fixed basis."""
    import numpy as np

    if k is None:
        n = embeddings.count()
        k = max(2, min(4096, -(-n // max(1, max_cell))))
    rows = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(int(sample_n))
        .collect()
    )
    sample = np.array([list(map(float, r[vec_col])) for r in rows], dtype=np.float64)
    if sample.shape[0] == 0:
        return ivf_centroids(dim, int(k))
    k = int(min(k, sample.shape[0]))
    # init: first k DISTINCT vectors in hash order (duplicates would
    # seed dead centroids)
    seen: set = set()
    init = []
    for v in sample:
        key = v.tobytes()
        if key not in seen:
            seen.add(key)
            init.append(v)
        if len(init) == k:
            break
    k = len(init)
    cents = np.stack(init)

    def _unit(m):
        nrm = np.sqrt((m * m).sum(axis=1, keepdims=True))
        nrm[nrm == 0] = 1.0
        return m / nrm

    cents = _unit(cents)
    for _ in range(int(iters)):
        assign = np.argmax(sample @ cents.T, axis=1)  # lowest index wins ties
        nxt = cents.copy()
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                nxt[c] = members.mean(axis=0)
        cents = _unit(nxt)
    return [[float(x) for x in c] for c in cents]


def save_centroids(path: str, centroids: List[List[float]]) -> None:
    """Persist a trained centroid artifact (json — a k x dim float
    table small enough for the driver, like the seam model files)."""
    import json

    with open(path, "w") as f:
        json.dump(centroids, f)


def load_centroids(path: str) -> List[List[float]]:
    import json

    with open(path) as f:
        return [[float(x) for x in c] for c in json.load(f)]


_CELL_EXPR_MAX_K = 128


def _cell_col(cents: List[List[float]], vec_col: str):
    """argmax_i dot(vec, c_i) as a Column, ties to the LOWEST index.

    Small k: pure JVM — an array of the k dots, then
    ``array_position(dots, array_max(dots)) - 1`` (first occurrence =
    lowest index). O(k·dim) expression nodes; the earlier per-branch
    CASE re-embedded ``greatest`` over all k columns in each of the k
    branches, an O(k²)-node tree that stalls Catalyst at the k≈4096
    auto-sizes ``train_centroids`` produces for web-scale corpora.

    Large k (> ``_CELL_EXPR_MAX_K``): an Arrow-vectorized pandas UDF —
    one batched float64 matmul + argmax per Arrow batch (np.argmax also
    ties to the lowest index). Expression-tree size O(1); the centroid
    matrix ships once per worker in the UDF closure, which is the same
    broadcast-the-model shape as the embed/classify seams."""
    k = len(cents)
    if k <= _CELL_EXPR_MAX_K:
        darr = F.array(*[_dot(F.col(vec_col), c) for c in cents])
        return (F.array_position(darr, F.array_max(darr)) - F.lit(1)).cast("int")

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m = np.array([[float(x) for x in c] for c in cents], dtype=np.float64)

    def _assign_fn(v):
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        return pd.Series(np.argmax(mat @ m.T, axis=1).astype("int32"))

    # unannotated + explicit returnType: the module's postponed
    # annotations (PEP 563) stringify type hints, which PySpark's
    # signature inference cannot resolve
    _assign = pandas_udf(_assign_fn, "int")
    return _assign(F.col(vec_col).cast("array<double>"))


def ivf_cells(
    embeddings: DataFrame, dim: int = 64, k: int = N_IVF_CELLS,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: List[List[float]] | None = None,
) -> DataFrame:
    """(vec_id, cell) — IVF coarse assignment: cell = argmax_i dot(v, c_i).
    Pure JVM expressions, no shuffle; at build time this is the
    partition/bucket column of the vector table. ``centroids`` injects
    a trained quantizer (train_centroids/load_centroids); default is
    the fixed deterministic basis."""
    cents = centroids if centroids is not None else ivf_centroids(dim, k)
    return embeddings.select(
        F.col(id_col), _cell_col(cents, vec_col).alias("cell")
    ).orderBy(id_col)


def ivf_topk(
    embeddings: DataFrame, qvec: Sequence[float], topk: int = 10,
    nprobe: int = 4, dim: int = 64, k_cells: int = N_IVF_CELLS,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: List[List[float]] | None = None,
) -> DataFrame:
    """(rank, vec_id, score) — IVF-probed ANN: rank centroids by
    query-dot on the driver, scan ONLY the top-``nprobe`` cells'
    vectors, exact cosine top-k among those candidates. The scale path
    vs brute force: with the vector table partitioned by cell, the scan
    prunes to nprobe/k_cells of the corpus and the plan stays
    filter -> project -> TakeOrderedAndProject (no shuffle, no
    cartesian)."""
    import math

    cents = centroids if centroids is not None else ivf_centroids(dim, k_cells)
    k_cells = len(cents)
    qdots = [sum(float(a) * float(b) for a, b in zip(qvec, c)) for c in cents]
    probe = sorted(range(k_cells), key=lambda i: (-qdots[i], i))[:nprobe]
    d = embeddings.select(
        F.col(id_col), F.col(vec_col), _cell_col(cents, vec_col).alias("cell")
    )
    cand = d.where(F.col("cell").isin([int(p) for p in probe]))
    qnorm = math.sqrt(sum(float(x) * float(x) for x in qvec))
    qarr = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), qarr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.col(vec_col).cast("array<double>"),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = cand.select(
        F.col(id_col), (dot / (vnorm * F.lit(qnorm))).alias("score")
    )
    from pyspark.sql.window import Window

    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(topk)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", F.col(id_col), round6("score").alias("score")
    )


def _cell_sql(
    k_cells: int, dim: int, centroids: List[List[float]] | None = None
) -> str:
    cents = centroids if centroids is not None else ivf_centroids(dim, k_cells)
    k_cells = len(cents)
    dots = ", ".join(
        "list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(sql_double(x) for x in c)
        + f"]) AS d{i}"
        for i, c in enumerate(cents)
    )
    # gmax is computed ONCE in its own CTE stage — inlining it into
    # every CASE branch (the earlier form) makes the SQL text O(k^2)
    gmax = "greatest(" + ", ".join(f"d{i}" for i in range(k_cells)) + ")"
    case = "CASE " + " ".join(
        f"WHEN d{i} = gmax THEN {i}" for i in range(k_cells)
    ) + " END"
    return (
        f"dd AS (SELECT vec_id, embedding, {dots} FROM embeddings), "
        f"dg AS (SELECT *, {gmax} AS gmax FROM dd), "
        f"cells AS (SELECT vec_id, embedding, {case} AS cell FROM dg)"
    )


def ivf_cells_sql(
    dim: int = 64, k_cells: int = N_IVF_CELLS,
    centroids: List[List[float]] | None = None,
) -> str:
    return (
        f"WITH {_cell_sql(k_cells, dim, centroids)} "
        "SELECT vec_id, CAST(cell AS INT) AS cell FROM cells ORDER BY vec_id"
    )


def ivf_topk_sql(
    qvec: Sequence[float], topk: int = 10, nprobe: int = 4,
    dim: int = 64, k_cells: int = N_IVF_CELLS,
    centroids: List[List[float]] | None = None,
) -> str:
    import math

    cents = centroids if centroids is not None else ivf_centroids(dim, k_cells)
    k_cells = len(cents)
    qdots = [sum(float(a) * float(b) for a, b in zip(qvec, c)) for c in cents]
    probe = sorted(range(k_cells), key=lambda i: (-qdots[i], i))[:nprobe]
    qnorm = math.sqrt(sum(float(x) * float(x) for x in qvec))
    v = "[" + ", ".join(sql_double(x) for x in qvec) + "]"
    plist = ", ".join(str(int(p)) for p in probe)
    return (
        f"WITH {_cell_sql(k_cells, dim, centroids)}, "
        f"cand AS (SELECT vec_id, embedding FROM cells WHERE cell IN ({plist})), "
        "scored AS (SELECT vec_id, "
        f"list_dot_product(embedding::DOUBLE[], {v}) / "
        f"(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * {sql_double(qnorm)}) AS score "
        "FROM cand) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT) AS rank, "
        f"vec_id, {round6_sql('score')} AS score FROM scored "
        f"ORDER BY score DESC, vec_id ASC LIMIT {topk}"
    )


def near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.25, limit: int = 50,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, cos) pairs with cosine >= threshold.

    All-pairs on the given (bounded) input; at scale, feed this the
    per-bucket groups from hyperplane_buckets instead of the full table.
    """
    # norms are per-VECTOR quantities: compute them once per side
    # before the pair join instead of twice per pair (Catalyst will not
    # factor a lambda-HOF fold out of the join loop itself — measured
    # ~2.5x on the sf0.1 gate key). Same expression over the same
    # values, so cos stays bit-identical to the per-pair form.
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(F.col(c).cast("array<double>"), F.col(c).cast("array<double>"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    a = embeddings.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea"),
        norm(vec_col).alias("_na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb"),
        norm(vec_col).alias("_nb"),
    )
    pairs = a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b"))
    dot = F.aggregate(
        F.zip_with(F.col("ea").cast("array<double>"), F.col("eb").cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("_na") * F.col("_nb"))
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cos"))
        .where(F.col("cos") >= threshold)
        .orderBy(F.desc("cos"), "vec_a", "vec_b")
        .limit(limit)
        .select("vec_a", "vec_b", round6("cos").alias("cos"))
    )


def _cos_expr(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(
            F.col(a).cast("array<double>"), F.col(b).cast("array<double>"), lambda x, y: x * y
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(
                F.col(c).cast("array<double>"), F.col(c).cast("array<double>"), lambda x, y: x * y
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (norm(a) * norm(b))


def near_dup_pairs_lsh(
    embeddings: DataFrame, threshold: float = 0.25, limit: int = 50,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, n_planes: int = N_PLANES, max_bucket: int = 1000,
) -> DataFrame:
    """(vec_a, vec_b, cos) — the SCALE path for embedding near-dup.

    Candidates are pairs whose hyperplane-LSH buckets are within Hamming
    distance 1 (own bucket + one-bit probes), exact cosine verified on
    candidates only — never an all-pairs crossJoin. Degenerate
    mega-buckets (> ``max_bucket`` members, e.g. boilerplate-identical
    embeddings) are dropped from candidate generation so no bucket can
    go quadratic; the cap is mirrored in the DuckDB oracle.

    A Hamming-1 pair matches exactly once (the single flipped bit), a
    same-bucket pair exactly once (the unflipped probe), so no
    ``distinct`` pass is needed on candidates.
    """
    b = hyperplane_buckets(
        embeddings, dim=dim, n_planes=n_planes, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("vid"), "bucket")
    kept = (
        b.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") <= max_bucket)
        .select("bucket")
    )
    ok = b.join(F.broadcast(kept), "bucket")
    probes = ok.select(
        "vid",
        F.explode(
            F.array(
                F.col("bucket"), *[F.expr(f"bucket ^ {1 << i}") for i in range(n_planes)]
            )
        ).alias("probe"),
    )
    cand = probes.join(
        ok.select(F.col("vid").alias("vb"), F.col("bucket").alias("probe")),
        ["probe"],
    ).where(F.col("vid") < F.col("vb")).select(
        F.col("vid").alias("vec_a"), F.col("vb").alias("vec_b")
    )
    ea = embeddings.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea"))
    eb = embeddings.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb"))
    scored = cand.join(ea, "vec_a").join(eb, "vec_b").select(
        "vec_a", "vec_b", _cos_expr("ea", "eb").alias("cos")
    )
    return (
        scored.where(F.col("cos") >= threshold)
        .orderBy(F.desc("cos"), "vec_a", "vec_b")
        .limit(limit)
        .select("vec_a", "vec_b", round6("cos").alias("cos"))
    )


def near_dup_pairs_lsh_sql(
    threshold: float = 0.25, limit: int = 50,
    dim: int = 64, n_planes: int = N_PLANES, max_bucket: int = 1000,
) -> str:
    planes = hyperplanes(dim, n_planes)
    bits = " + ".join(
        "CASE WHEN list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(sql_double(x) for x in p)
        + f"]) >= 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END"
        for i, p in enumerate(planes)
    )
    probe_list = "[bucket, " + ", ".join(
        f"xor(bucket, {1 << i})" for i in range(n_planes)
    ) + "]"
    return (
        f"WITH b AS (SELECT vec_id, {bits} AS bucket FROM embeddings), "
        "sizes AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket), "
        f"ok AS (SELECT vec_id, bucket FROM b JOIN sizes USING (bucket) WHERE n <= {max_bucket}), "
        f"probes AS (SELECT vec_id, unnest({probe_list}) AS probe FROM ok), "
        "cand AS (SELECT p.vec_id AS vec_a, o.vec_id AS vec_b FROM probes p "
        "  JOIN ok o ON o.bucket = p.probe AND p.vec_id < o.vec_id), "
        "scored AS (SELECT c.vec_a, c.vec_b, "
        "list_dot_product(a.embedding::DOUBLE[], b2.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b2.embedding::DOUBLE[], b2.embedding::DOUBLE[]))) AS cos "
        "FROM cand c JOIN embeddings a ON a.vec_id = c.vec_a "
        "JOIN embeddings b2 ON b2.vec_id = c.vec_b) "
        f"SELECT vec_a, vec_b, {round6_sql('cos')} AS cos FROM scored "
        f"WHERE cos >= {threshold} ORDER BY cos DESC, vec_a, vec_b LIMIT {limit}"
    )


def near_dup_pairs_sql(threshold: float = 0.25, limit: int = 50) -> str:
    return (
        "WITH p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos "
        "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id) "
        f"SELECT vec_a, vec_b, {round6_sql('cos')} AS cos FROM p WHERE cos >= {threshold} "
        f"ORDER BY cos DESC, vec_a, vec_b LIMIT {limit}"
    )


def semdedup(
    embeddings: DataFrame, threshold: float = 0.25,
    dim: int = 64, k_cells: int = N_IVF_CELLS, max_cell: int = 4000,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: List[List[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup -> surviving (vec_id, cell).

    Cluster-then-prune (Abbas et al., SemDeDup): assign every vector to
    its IVF cell (argmax centroid dot — pure JVM expressions, no
    shuffle), then WITHIN each cell drop any vector that has a
    lower-id cell-mate with cosine >= ``threshold``. The dominator
    rule (exists ANY lower-id near-twin, dropped or not) is
    deterministic and needs no iteration — unlike connected-components
    it is a single join + EXISTS, and it keeps exactly the min-id
    representative of every mutually-similar group.

    Scale shape: the pairwise test is confined to cell-mates — the
    cell is the partition key, so each comparison task sees one cell's
    candidates, never a corpus crossJoin. Cells larger than
    ``max_cell`` are exempt from pruning (kept verbatim): the safety
    valve that bounds the worst per-cell product at max_cell^2 when a
    degenerate centroid attracts everything; at 100 TB inject TRAINED
    centroids sized ~corpus/max_cell (``train_centroids`` — the fixed
    basis over-caps every cell at web scale and this pass degrades to
    keep-everything), and the cap makes the residual failure mode
    conservative (keep, never mass-drop).
    """
    cents = centroids if centroids is not None else ivf_centroids(dim, k_cells)
    d = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"),
        _cell_col(cents, vec_col).alias("cell"),
    )
    # the assignment subtree is k HOF dot expressions; referenced by
    # three consumers (sizes, both join sides) Catalyst's constraint
    # propagation goes combinatorial across the self-join — cut the
    # lineage so the join sides see plain columns (and the k-dot scan
    # runs once, not three times)
    cells = d.select("vec_id", "emb", "cell").localCheckpoint(eager=False)
    sizes = (
        cells.groupBy("cell").agg(F.count("*").alias("n"))
    )
    prunable = cells.join(
        F.broadcast(sizes.where(F.col("n") <= max_cell).select("cell")), "cell"
    )
    a = prunable.select(
        "cell", F.col("vec_id").alias("va"), F.col("emb").alias("ea")
    )
    b = prunable.select(
        "cell", F.col("vec_id").alias("vec_id"), F.col("emb").alias("eb")
    )
    dropped = (
        a.join(b, "cell")
        .where(F.col("va") < F.col("vec_id"))
        .where(_cos_expr("ea", "eb") >= threshold)
        .select("vec_id")
        .distinct()
    )
    return (
        cells.join(dropped, "vec_id", "left_anti")
        .select("vec_id", F.col("cell").cast("int").alias("cell"))
        .orderBy("vec_id")
    )


def semdedup_sql(
    threshold: float = 0.25, dim: int = 64,
    k_cells: int = N_IVF_CELLS, max_cell: int = 4000,
    centroids: List[List[float]] | None = None,
) -> str:
    return (
        f"WITH {_cell_sql(k_cells, dim, centroids)}, "
        "sizes AS (SELECT cell, count(*) AS n FROM cells GROUP BY cell), "
        "prunable AS (SELECT c.* FROM cells c JOIN sizes USING (cell) "
        f"  WHERE n <= {max_cell}), "
        "dropped AS (SELECT DISTINCT b.vec_id FROM prunable a "
        "  JOIN prunable b ON a.cell = b.cell AND a.vec_id < b.vec_id "
        "  WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "  (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "  sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) "
        f"  >= {threshold}) "
        "SELECT vec_id, CAST(cell AS INT) AS cell FROM cells "
        "WHERE vec_id NOT IN (SELECT vec_id FROM dropped) ORDER BY vec_id"
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (the SQ vector-store compression every
# large-scale ANN system ships — FAISS SQ8 / Lucene Int8ScalarQuantizer:
# 4x memory over float32, which at 10^12 x 768-dim vectors is the
# difference between fitting the store in executor memory or not)
# ---------------------------------------------------------------------------

SQ_LEVELS = 255  # codes 0..255 in one byte


def sq_params(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> List[tuple]:
    """[(lo, hi)] per dimension — exact per-dim min/max over the corpus
    (one posexplode + one map-side-combinable groupBy; the collect is
    DIMENSION-sized — 64..4096 rows — the same bounded-collect class as
    the vocab dictionary probe). min/max of float32-cast-double are
    exact, so both engines derive bit-identical parameters."""
    rows = (
        embeddings.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x")
        )
        .groupBy("i")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("i")
        .collect()
    )
    return [(float(r.lo), float(r.hi)) for r in rows]


def _sq_codes_col(vec_col, params: List[tuple]):
    """array<long> of 0..255 codes: clamp(floor((x - lo) * scale + 0.5))
    with scale = 255/(hi - lo); a constant dimension (hi == lo) encodes
    0 (0.0 * anything + 0.5 floors to 0 — no special case needed)."""
    lo_arr = F.array(*[F.lit(lo) for lo, _ in params])
    sc_arr = F.array(
        *[
            F.lit(
                (float(SQ_LEVELS) / (hi - lo)) if hi > lo else 0.0
            )
            for lo, hi in params
        ]
    )
    diff = F.zip_with(
        vec_col.cast("array<double>"), lo_arr, lambda x, lo: x - lo
    )
    return F.zip_with(
        diff,
        sc_arr,
        lambda dx, s: F.greatest(
            F.lit(0).cast("long"),
            F.least(F.lit(SQ_LEVELS).cast("long"), F.floor(dx * s + F.lit(0.5))),
        ),
    )


def _sq_dequant_col(codes_col, params: List[tuple]):
    """array<double>: lo + code * step, step = (hi - lo)/255."""
    st_arr = F.array(
        *[F.lit((hi - lo) / float(SQ_LEVELS)) for lo, hi in params]
    )
    lo_arr = F.array(*[F.lit(lo) for lo, _ in params])
    t = F.zip_with(codes_col, st_arr, lambda q, s: q * s)
    return F.zip_with(t, lo_arr, lambda v, lo: lo + v)


def sq_codes_summary(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, code_sum, code_min, code_max) — integer checksum of the
    quantizer output per vector: pins the whole encode lane with zero
    float-hash exposure."""
    params = sq_params(embeddings, vec_col)
    codes = _sq_codes_col(F.col(vec_col), params)
    return embeddings.select(
        F.col(id_col),
        F.aggregate(
            codes, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("code_sum"),
        F.array_min(codes).cast("long").alias("code_min"),
        F.array_max(codes).cast("long").alias("code_max"),
    ).orderBy(id_col)


def sq_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(rank, vec_id, score) — cosine top-k over the DEQUANTIZED int8
    codes (what an SQ store actually serves; the exact float store is
    gone at scale). One plan: encode + dequantize + cosine are chained
    zip_with expressions (zero Python, zero shuffle beyond the
    TakeOrdered k-cut); the params collect is dimension-bounded."""
    from ..functions.embed import cosine_expr

    params = sq_params(embeddings, vec_col)
    codes = _sq_codes_col(F.col(vec_col), params)
    dq = _sq_dequant_col(codes, params)
    from pyspark.sql.window import Window

    scored = embeddings.select(
        F.col(id_col), cosine_expr(dq, qvec).alias("score")
    )
    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(int(k))
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", F.col(id_col), round6("score").alias("score")
    )


def _sq_prm_ctes() -> str:
    """Shared CTE chain deriving the identical per-dim params + codes
    (1-based list positions; the arithmetic operand order matches the
    Spark lanes exactly)."""
    return (
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        "dimn AS (SELECT unnest(generate_series(1, "
        "(SELECT len(v) FROM e LIMIT 1))) AS i), "
        "dims AS (SELECT i, min(v[i]) AS lo, max(v[i]) AS hi "
        "FROM e CROSS JOIN dimn GROUP BY i), "
        "prm AS (SELECT list(lo ORDER BY i) AS lov, "
        f"list(CASE WHEN hi > lo THEN {float(SQ_LEVELS)} / (hi - lo) "
        "ELSE 0.0 END ORDER BY i) AS sv, "
        f"list((hi - lo) / {float(SQ_LEVELS)} ORDER BY i) AS stv FROM dims), "
        "enc AS (SELECT vec_id, v, list_transform("
        "generate_series(1, len(v)), i -> greatest(CAST(0 AS BIGINT), "
        "least(CAST(255 AS BIGINT), "
        "CAST(floor((v[i] - lov[i]) * sv[i] + 0.5) AS BIGINT)))) AS codes "
        "FROM e CROSS JOIN prm)"
    )


def sq_codes_summary_sql() -> str:
    return (
        f"WITH {_sq_prm_ctes()} "
        "SELECT vec_id, CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum, "
        "CAST(list_aggregate(codes, 'min') AS BIGINT) AS code_min, "
        "CAST(list_aggregate(codes, 'max') AS BIGINT) AS code_max "
        "FROM enc ORDER BY vec_id"
    )


def sq_topk_sql(qvec: Sequence[float], k: int = 10) -> str:
    qnorm = math.sqrt(sum(float(x) * float(x) for x in qvec))
    qv = "[" + ", ".join(sql_double(float(x)) for x in qvec) + "]"
    return (
        f"WITH {_sq_prm_ctes()}, "
        "dq AS (SELECT vec_id, list_transform(generate_series(1, len(codes)), "
        "i -> lov[i] + codes[i] * stv[i]) AS w FROM enc CROSS JOIN prm), "
        f"scored AS (SELECT vec_id, list_dot_product(w, {qv}) / "
        f"(sqrt(list_dot_product(w, w)) * {sql_double(qnorm)}) AS score FROM dq) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT) AS rank, "
        f"vec_id, {round6_sql('score')} AS score FROM scored "
        f"ORDER BY score DESC, vec_id ASC LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# binary quantization (1-bit sign codes + Hamming serving + exact refine)
# ---------------------------------------------------------------------------

BQ_WORD_BITS = 32  # 32 bits per BIGINT word — no sign hazard (the bloom rule)


def _bq_dim(embeddings: DataFrame, vec_col: str) -> int:
    row = embeddings.select(F.size(vec_col).alias("d")).first()
    if row is None or row["d"] is None or row["d"] < 1:
        raise ValueError("empty embeddings table: no dimension to encode")
    return int(row["d"])


def _bq_word_col(vec_col, wi: int, dim: int):
    """Word ``wi``: bit j set iff v[32*wi + j] > 0 — a sum of integer
    terms, max 2^32 - 1, exact on both engines."""
    v = vec_col.cast("array<double>")
    terms = []
    for j in range(BQ_WORD_BITS):
        pos = BQ_WORD_BITS * wi + j + 1  # 1-based element_at
        if pos > dim:
            break
        terms.append(
            F.when(F.element_at(v, pos) > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def bq_codes_summary(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, word_idx, word) — the 1-bit sign quantization of the
    embedding store (the classic binary-quantization / ES-BBQ-class
    compression tier: 32x over float32, bit j of word w set iff
    dimension 32w+j is positive), in long format so the schema is
    dimension-independent. All-integer — exact cross-engine by
    construction; per-row expression, zero shuffle."""
    dim = _bq_dim(embeddings, vec_col)
    words = (dim + BQ_WORD_BITS - 1) // BQ_WORD_BITS
    cols = []
    for wi in range(words):
        cols.append(
            F.struct(
                F.lit(wi).cast("int").alias("word_idx"),
                _bq_word_col(F.col(vec_col), wi, dim).alias("word"),
            )
        )
    return (
        embeddings.select(
            F.col(id_col), F.explode(F.array(*cols)).alias("_w")
        )
        .select(F.col(id_col), F.col("_w.word_idx"), F.col("_w.word"))
        .orderBy(id_col, "word_idx")
    )


def _bq_query_words(qvec: Sequence[float]) -> list:
    q = [float(x) for x in qvec]
    words = (len(q) + BQ_WORD_BITS - 1) // BQ_WORD_BITS
    out = []
    for wi in range(words):
        w = 0
        for j in range(BQ_WORD_BITS):
            pos = BQ_WORD_BITS * wi + j
            if pos >= len(q):
                break
            if q[pos] > 0:
                w += 2 ** j
        out.append(w)
    return out


def bq_hamming_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    refine: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantized serving. ``refine=0``: (rank, vec_id, dist) —
    top-k ascending Hamming distance between sign codes (an INTEGER,
    so parity and tie-handling are exact; ties on vec_id asc), the
    1-bit first stage a BBQ-class store scans. ``refine>0``: the
    two-stage pattern (the pq_refine shape) — Hamming cuts refine*k
    candidates carrying their float vectors, exact cosine re-ranks
    only those -> (rank, vec_id, score). At 10^12 vectors the 1-bit
    scan reads 32x less than float32 and the float store is read for
    refine*k rows only."""
    from pyspark.sql.window import Window

    if int(k) < 1 or int(refine) < 0:
        raise ValueError(f"k must be >= 1, refine >= 0: k={k} refine={refine}")
    dim = _bq_dim(embeddings, vec_col)
    q = [float(x) for x in qvec]
    if len(q) != dim:
        raise ValueError(f"qvec dim {len(q)} != {dim}")
    qwords = _bq_query_words(q)
    dist = None
    for wi, qw in enumerate(qwords):
        term = F.bit_count(
            _bq_word_col(F.col(vec_col), wi, dim).bitwiseXOR(F.lit(int(qw)))
        )
        dist = term if dist is None else dist + term
    if refine == 0:
        scored = embeddings.select(
            F.col(id_col), dist.cast("long").alias("dist")
        )
        top = scored.orderBy(F.asc("dist"), F.asc(id_col)).limit(int(k))
        w = Window.orderBy(F.asc("dist"), F.asc(id_col))
        return top.withColumn("rank", F.row_number().over(w)).select(
            "rank", F.col(id_col), "dist"
        )
    from ..functions.embed import cosine_expr

    cand = (
        embeddings.select(
            F.col(id_col),
            F.col(vec_col).alias("_v"),
            dist.cast("long").alias("_d"),
        )
        .orderBy(F.asc("_d"), F.asc(id_col))
        .limit(int(refine) * int(k))
    )
    exact = cand.select(
        F.col(id_col), cosine_expr(F.col("_v"), q).alias("score")
    )
    top = exact.orderBy(F.desc("score"), F.asc(id_col)).limit(int(k))
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", F.col(id_col), round6("score").alias("score")
    )


def _bq_words_sql(dim: int) -> str:
    """wrds(vec_id, word_idx, word) CTE — the identical sum-of-bits
    encoding, 1-based list positions."""
    words = (int(dim) + BQ_WORD_BITS - 1) // BQ_WORD_BITS
    rows = []
    for wi in range(words):
        terms = []
        for j in range(BQ_WORD_BITS):
            pos = BQ_WORD_BITS * wi + j + 1
            if pos > int(dim):
                break
            terms.append(f"CASE WHEN v[{pos}] > 0 THEN {2 ** j} ELSE 0 END")
        rows.append(
            f"SELECT vec_id, {wi} AS word_idx, "
            f"CAST({' + '.join(terms)} AS BIGINT) AS word FROM e"
        )
    return (
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        "wrds AS (" + " UNION ALL ".join(rows) + ")"
    )


def bq_codes_summary_sql(dim: int = 64) -> str:
    return (
        f"WITH {_bq_words_sql(dim)} "
        "SELECT vec_id, CAST(word_idx AS INT) AS word_idx, word "
        "FROM wrds ORDER BY vec_id, word_idx"
    )


def bq_hamming_topk_sql(
    qvec: Sequence[float], k: int = 10, refine: int = 0
) -> str:
    q = [float(x) for x in qvec]
    qwords = _bq_query_words(q)
    qvals = ", ".join(f"({wi}, {w})" for wi, w in enumerate(qwords))
    base = (
        f"WITH {_bq_words_sql(len(q))}, "
        f"qw(word_idx, qword) AS (VALUES {qvals}), "
        "hd AS (SELECT vec_id, CAST(sum(bit_count(xor(word, qword))) AS BIGINT) "
        "AS dist FROM wrds JOIN qw USING (word_idx) GROUP BY vec_id)"
    )
    if int(refine) == 0:
        return (
            f"{base} "
            "SELECT CAST(row_number() OVER (ORDER BY dist ASC, vec_id ASC) AS INT) "
            "AS rank, vec_id, dist FROM hd "
            f"ORDER BY dist ASC, vec_id ASC LIMIT {int(k)}"
        )
    import math as _m

    qnorm = _m.sqrt(sum(x * x for x in q))
    qv = "[" + ", ".join(sql_double(x) for x in q) + "]"
    return (
        f"{base}, "
        f"cand AS (SELECT vec_id FROM hd ORDER BY dist ASC, vec_id ASC "
        f"LIMIT {int(refine) * int(k)}), "
        f"exact AS (SELECT e.vec_id, list_dot_product(v, {qv}) / "
        f"(sqrt(list_dot_product(v, v)) * {sql_double(qnorm)}) AS score "
        "FROM e JOIN cand USING (vec_id)) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT) "
        f"AS rank, vec_id, {round6_sql('score')} AS score FROM exact "
        f"ORDER BY score DESC, vec_id ASC LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# Matryoshka (MRL) truncated-prefix serving
# ---------------------------------------------------------------------------


def mrl_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    dim_prefix: int,
    k: int = 10,
    refine: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-representation serving (Kusupati et al. 2022 — the
    adaptive-retrieval pattern the 2024 embedding APIs expose as
    ``dimensions=``): cosine over the FIRST ``dim_prefix`` dimensions
    of store and query. ``refine=0``: (rank, vec_id, score) on the
    truncated prefix — a dim_prefix/dim fraction of the scan bytes.
    ``refine>0``: the two-stage shape — the prefix scan cuts refine*k
    candidates carrying their full vectors, full-dim exact cosine
    re-ranks only those (funnel retrieval, the paper's serving mode).
    Cosine is the house ordered fold == list_dot_product pairing; ties
    on vec_id asc."""
    from pyspark.sql.window import Window

    from ..functions.embed import cosine_expr

    q = [float(x) for x in qvec]
    d = int(dim_prefix)
    if d < 1 or d > len(q):
        raise ValueError(f"dim_prefix must be in [1, {len(q)}]: {dim_prefix!r}")
    if int(k) < 1 or int(refine) < 0:
        raise ValueError(f"k must be >= 1, refine >= 0: k={k} refine={refine}")
    v = F.col(vec_col).cast("array<double>")
    pre = cosine_expr(F.slice(v, 1, d), q[:d])
    if refine == 0:
        scored = embeddings.select(F.col(id_col), pre.alias("score"))
        top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(int(k))
        w = Window.orderBy(F.desc("score"), F.asc(id_col))
        return top.withColumn("rank", F.row_number().over(w)).select(
            "rank", F.col(id_col), round6("score").alias("score")
        )
    cand = (
        embeddings.select(
            F.col(id_col), F.col(vec_col).alias("_v"), pre.alias("_p")
        )
        .orderBy(F.desc("_p"), F.asc(id_col))
        .limit(int(refine) * int(k))
    )
    exact = cand.select(
        F.col(id_col), cosine_expr(F.col("_v"), q).alias("score")
    )
    top = exact.orderBy(F.desc("score"), F.asc(id_col)).limit(int(k))
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", F.col(id_col), round6("score").alias("score")
    )


def mrl_topk_sql(
    qvec: Sequence[float], dim_prefix: int, k: int = 10, refine: int = 0
) -> str:
    import math as _m

    q = [float(x) for x in qvec]
    d = int(dim_prefix)
    qp = q[:d]
    qnorm_p = _m.sqrt(sum(x * x for x in qp))
    qvp = "[" + ", ".join(sql_double(x) for x in qp) + "]"
    base = (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"pre AS (SELECT vec_id, v, list_dot_product(list_slice(v, 1, {d}), {qvp}) / "
        f"(sqrt(list_dot_product(list_slice(v, 1, {d}), list_slice(v, 1, {d}))) "
        f"* {sql_double(qnorm_p)}) AS p FROM e)"
    )
    if int(refine) == 0:
        return (
            f"{base} "
            "SELECT CAST(row_number() OVER (ORDER BY p DESC, vec_id ASC) AS INT) "
            f"AS rank, vec_id, {round6_sql('p')} AS score FROM pre "
            f"ORDER BY p DESC, vec_id ASC LIMIT {int(k)}"
        )
    qnorm = _m.sqrt(sum(x * x for x in q))
    qv = "[" + ", ".join(sql_double(x) for x in q) + "]"
    return (
        f"{base}, "
        f"cand AS (SELECT vec_id, v FROM pre ORDER BY p DESC, vec_id ASC "
        f"LIMIT {int(refine) * int(k)}), "
        f"exact AS (SELECT vec_id, list_dot_product(v, {qv}) / "
        f"(sqrt(list_dot_product(v, v)) * {sql_double(qnorm)}) AS score "
        "FROM cand) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT) "
        f"AS rank, vec_id, {round6_sql('score')} AS score FROM exact "
        f"ORDER BY score DESC, vec_id ASC LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# embedding snapshot drift (vector-side crawl/model monitoring)
# ---------------------------------------------------------------------------


def _mean_vec_rel(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(j, mean) — the per-dimension mean vector, reduced with the
    house canonical two-level md5-bucket fold per dimension (per-
    (dim, bucket) vec_id-ordered fold, then a bucket-ordered fold over
    <=4096 sums) so the float sums are engine-deterministic and no
    task ever holds more than ~n/4096 rows of one dimension."""
    x = emb.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("j", "x"),
    )
    b = x.groupBy(
        "j", F.substring(F.md5(F.col("_id").cast("string")), 1, 3).alias("_b")
    ).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("_id", "x"))),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        ).alias("_s"),
        F.count("*").cast("long").alias("_n"),
    )
    return b.groupBy("j").agg(
        (
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_b", "_s"))),
                F.lit(0.0),
                lambda acc, s: acc + s["_s"],
            )
            / F.sum("_n")
        ).alias("mean")
    )


def embedding_drift(
    emb_old: DataFrame,
    emb_new: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(n_old, n_new, cos_means, l2_shift) — vector-side snapshot
    drift (the embedding sibling of textstats.term_drift/snapshot_kl):
    cosine between the two snapshots' mean vectors and the L2 distance
    between them. A model swap, an encoder-version skew, or a topical
    crawl shift all move the centroid — the one-row alarm a vector
    store monitors between ingests. Every reduction is the canonical
    two-level fold (means) or a dimension-ordered k-row fold
    (dot/norm/shift over the <=dim joined means)."""
    mo = _mean_vec_rel(emb_old, id_col, vec_col)
    mn = _mean_vec_rel(emb_new, id_col, vec_col)
    no = emb_old.count()
    nn = emb_new.count()
    j = mo.withColumnRenamed("mean", "a").join(
        mn.withColumnRenamed("mean", "b"), "j"
    )

    def _jfold(expr_col):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("j", expr_col.alias("v")))),
            F.lit(0.0),
            lambda acc, s: acc + s["v"],
        )

    agg = j.agg(
        _jfold(F.col("a") * F.col("b")).alias("dot"),
        _jfold(F.col("a") * F.col("a")).alias("na"),
        _jfold(F.col("b") * F.col("b")).alias("nb"),
        _jfold((F.col("a") - F.col("b")) * (F.col("a") - F.col("b"))).alias(
            "dd"
        ),
    )
    return agg.select(
        F.lit(int(no)).cast("long").alias("n_old"),
        F.lit(int(nn)).cast("long").alias("n_new"),
        round6(
            F.col("dot") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb")))
        ).alias("cos_means"),
        round6(F.sqrt(F.col("dd"))).alias("l2_shift"),
    )


def _mean_vec_sql(src: str, name: str) -> str:
    """CTE chain producing ``{name}(j, mean)`` from ``{src}`` —
    mirrors _mean_vec_rel's two-level fold verbatim."""
    return (
        f"{name}_x AS (SELECT vec_id AS _id, j, v[j] AS x FROM "
        f"(SELECT vec_id, embedding::DOUBLE[] AS v FROM {src}), "
        "unnest(generate_series(1, len(v))) AS _t(j)), "
        f"{name}_b AS (SELECT j, substr(md5(_id::VARCHAR), 1, 3) AS b, "
        "sum(x ORDER BY _id) AS s, CAST(count(*) AS BIGINT) AS n "
        f"FROM {name}_x GROUP BY 1, 2), "
        f"{name} AS (SELECT j, sum(s ORDER BY b) / sum(n) AS mean "
        f"FROM {name}_b GROUP BY j)"
    )


def embedding_drift_sql(old_src: str, new_src: str) -> str:
    """DuckDB mirror of embedding_drift over two source relations
    (e.g. parity-split CTE names)."""
    return (
        f"WITH {_mean_vec_sql(old_src, 'mo')}, "
        f"{_mean_vec_sql(new_src, 'mn')}, "
        "jj AS (SELECT mo.j, mo.mean AS a, mn.mean AS b "
        "FROM mo JOIN mn ON mo.j = mn.j), "
        "s AS (SELECT sum(a * b ORDER BY j) AS dot, "
        "sum(a * a ORDER BY j) AS na, sum(b * b ORDER BY j) AS nb, "
        "sum((a - b) * (a - b) ORDER BY j) AS dd FROM jj), "
        f"cnt AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM {old_src}) AS n_old, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM {new_src}) AS n_new) "
        "SELECT n_old, n_new, "
        f"{round6_sql('dot / (sqrt(na) * sqrt(nb))')} AS cos_means, "
        f"{round6_sql('sqrt(dd)')} AS l2_shift FROM s CROSS JOIN cnt"
    )


# ---------------------------------------------------------------------------
# ANN recall harness (offline quality gate for the approximate tiers)
# ---------------------------------------------------------------------------


def ann_recall(
    embeddings: DataFrame,
    qvecs,
    k: int = 10,
    nprobe: int = 2,
    k_cells: int = N_IVF_CELLS,
    centroids: List[List[float]] | None = None,
    mode: str = "ivf",
    dim_prefix: int | None = None,
) -> DataFrame:
    """(q_idx, k, hits, recall) — recall@k of an approximate tier
    (``mode``: ivf = the nprobe-pruned scan, bq = 1-bit Hamming,
    mrl = truncated-prefix cosine at ``dim_prefix``, default dim/4)
    against the exact brute-force cosine ranking, per query — the
    offline number a deployment gates EVERY quantization tier on: the
    offline quality gate an ANN deployment runs before changing
    nprobe / k_cells / centroids (the retrieval_eval analog for the
    vector family — FAISS benchmarks report exactly this number).

    Both rankings cut with the same (score desc, vec_id asc) total
    order and the identical cosine spelling, so the two id sets — and
    therefore the integer hit count — are deterministic cross-engine;
    recall = hits / k is the single division.

    Scale: per query, one full scan (the exact baseline is the point
    — run it on a sampled slice in production) + one nprobe-pruned
    scan, both TakeOrdered; the m-row result assembles driver-side."""
    if int(k) < 1 or int(nprobe) < 1:
        raise ValueError(f"k and nprobe must be >= 1: k={k} nprobe={nprobe}")
    if not qvecs:
        raise ValueError("need >= 1 query vectors")
    if mode not in ("ivf", "bq", "mrl"):
        raise ValueError(f"mode must be ivf|bq|mrl: {mode!r}")
    from ..functions.embed import cosine_topk

    spark = embeddings.sparkSession
    rows = []
    for qi, qv in enumerate(qvecs):
        exact = {
            r["vec_id"]
            for r in cosine_topk(embeddings, qv, int(k)).collect()
        }
        if mode == "ivf":
            adf = ivf_topk(
                embeddings, qv, topk=int(k), nprobe=int(nprobe),
                dim=len(qv), k_cells=k_cells, centroids=centroids,
            )
        elif mode == "bq":
            adf = bq_hamming_topk(embeddings, qv, k=int(k))
        else:
            dp = int(dim_prefix or max(1, len(qv) // 4))
            adf = mrl_topk(embeddings, qv, dim_prefix=dp, k=int(k))
        approx = {r["vec_id"] for r in adf.collect()}
        hits = len(exact & approx)
        rows.append((qi, int(k), hits, float(hits) / int(k)))
    return spark.createDataFrame(
        rows, "q_idx int, k int, hits long, recall double"
    )


def ann_recall_sql(
    qvecs,
    k: int = 10,
    nprobe: int = 2,
    k_cells: int = N_IVF_CELLS,
    centroids: List[List[float]] | None = None,
    mode: str = "ivf",
    dim_prefix: int | None = None,
) -> str:
    """DuckDB mirror of ann_recall: per query, the exact top-k CTE and
    the probed-cells top-k CTE (identical cosine spelling and (score
    desc, vec_id asc) cuts), then the integer intersection count."""
    import math

    if int(k) < 1 or int(nprobe) < 1:
        raise ValueError(f"k and nprobe must be >= 1: k={k} nprobe={nprobe}")
    if not qvecs:
        raise ValueError("need >= 1 query vectors")
    if mode not in ("ivf", "bq", "mrl"):
        raise ValueError(f"mode must be ivf|bq|mrl: {mode!r}")
    dim = len(qvecs[0])
    cents = centroids if centroids is not None else ivf_centroids(dim, k_cells)
    if mode == "ivf":
        parts = [_cell_sql(len(cents), dim, cents)]
    elif mode == "bq":
        parts = [_bq_words_sql(dim)]
    else:
        parts = ["e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"]
    dp = int(dim_prefix or max(1, dim // 4))
    selects = []
    for qi, qv in enumerate(qvecs):
        q = [float(x) for x in qv]
        qnorm = math.sqrt(sum(x * x for x in q))
        v = "[" + ", ".join(sql_double(x) for x in q) + "]::DOUBLE[]"
        cos = (
            f"list_dot_product(embedding::DOUBLE[], {v}) / "
            "(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) "
            f"* {sql_double(qnorm)})"
        )
        parts.append(
            f"ex{qi} AS (SELECT vec_id FROM (SELECT vec_id, {cos} AS score "
            "FROM embeddings) s "
            f"ORDER BY score DESC, vec_id ASC LIMIT {int(k)})"
        )
        if mode == "ivf":
            qdots = [sum(a * b for a, b in zip(q, c)) for c in cents]
            probe = sorted(range(len(cents)), key=lambda i: (-qdots[i], i))[
                : int(nprobe)
            ]
            plist = ", ".join(str(int(p)) for p in probe)
            parts.append(
                f"iv{qi} AS (SELECT vec_id FROM (SELECT vec_id, {cos} AS score "
                f"FROM embeddings WHERE vec_id IN "
                f"(SELECT vec_id FROM cells WHERE cell IN ({plist}))) s "
                f"ORDER BY score DESC, vec_id ASC LIMIT {int(k)})"
            )
        elif mode == "bq":
            qwords = _bq_query_words(q)
            qvals = ", ".join(f"({wi}, {w})" for wi, w in enumerate(qwords))
            parts.append(
                f"qw{qi}(word_idx, qword) AS (VALUES {qvals})"
            )
            parts.append(
                f"iv{qi} AS (SELECT vec_id FROM ("
                "SELECT vec_id, CAST(sum(bit_count(xor(word, qword))) AS BIGINT) "
                f"AS dist FROM wrds JOIN qw{qi} USING (word_idx) GROUP BY vec_id) s "
                f"ORDER BY dist ASC, vec_id ASC LIMIT {int(k)})"
            )
        else:
            qp = q[:dp]
            qnorm_p = math.sqrt(sum(x * x for x in qp))
            qvp = "[" + ", ".join(sql_double(x) for x in qp) + "]"
            parts.append(
                f"iv{qi} AS (SELECT vec_id FROM ("
                f"SELECT vec_id, list_dot_product(list_slice(v, 1, {dp}), {qvp}) / "
                f"(sqrt(list_dot_product(list_slice(v, 1, {dp}), "
                f"list_slice(v, 1, {dp}))) * {sql_double(qnorm_p)}) AS p FROM e) s "
                f"ORDER BY p DESC, vec_id ASC LIMIT {int(k)})"
            )
        parts.append(
            f"h{qi} AS (SELECT CAST(count(*) AS BIGINT) AS hits FROM iv{qi} "
            f"WHERE vec_id IN (SELECT vec_id FROM ex{qi}))"
        )
        selects.append(
            f"SELECT {qi} AS q_idx, {int(k)} AS k, (SELECT hits FROM h{qi}) AS hits, "
            f"CAST((SELECT hits FROM h{qi}) AS DOUBLE) / {int(k)} AS recall"
        )
    return (
        "WITH " + ", ".join(parts) + " "
        + " UNION ALL ".join(selects)
        + " ORDER BY q_idx"
    )
