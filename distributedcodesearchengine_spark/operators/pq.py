"""Product quantization (PQ) of the embedding store + ADC top-k serving.

The FAISS-IVFPQ / ScaNN compression step that pairs with the coarse
quantizer (``ivf_cells``): split each vector into ``m`` contiguous
subvectors, quantize every subvector to one of ``K`` codebook entries,
and serve queries by Asymmetric Distance Computation — the query
precomputes an ``m x K`` table of exact subspace distances and each
document's distance is ``m`` table lookups summed, never a float-vector
scan. At 10^12 x 768-dim vectors PQ at m=96/K=256 is 32x memory over
float32 (96 bytes/vector) — the difference between an in-memory ANN
serving tier and one that pages.

Reference parity note: the reference serves vectors through Qdrant
(codesearch/indexer/embedder.py -> Qdrant collections), whose HNSW
store ships exactly this scalar/product quantization pair as its
compression options; here both live Spark-side (``similarity.sq_*`` for
int8 SQ, this module for PQ) so the 4x/32x memory claims apply to the
executor-resident serving relations.

Two codebook sources, mirroring the IVF/SemDeDup trained-centroid seam:

- **seed codebooks** (the gate default, SQL-derivable): codebook entry
  ``i`` of subspace ``j`` is the ``j``-th slice of the ``i``-th seed
  vector, where seeds are the ``K`` lowest-md5(vec_id) rows — the same
  layout-independent deterministic sample the k-means trainer uses, so
  BOTH engines derive bit-identical codebooks from the parquet alone.
- **trained codebooks** (``train_pq_codebooks``): per-subspace Lloyd
  k-means over the md5 sample, driver-side float64 numpy, lowest-index
  argmin ties — injectable into every operator and both SQL builders
  (as literals) exactly like ``train_centroids``; persist with
  ``save_pq`` / ``load_pq``.

Encode/serve are pure JVM expression chains (slice + zip_with +
aggregate + array_position): zero Python on the corpus, zero shuffle
beyond the TakeOrdered k-cut. The per-(vec, subspace) argmin is the
``array_position(dists, array_min(dists))`` linear form (lowest index
wins ties) shared with ``ivf_cells``.

Float-parity contract with the DuckDB mirrors: every distance is an
ordered left fold of ``(a-b)*(a-b)`` in element order (Spark
``aggregate`` over ``zip_with`` == DuckDB ``list_dot_product`` of the
difference list with itself), and the ADC sum folds in subspace order
(chained ``+`` == ``sum(qd ORDER BY j)``) — the house cosine/pagerank
fold rules, so integer codes and 6-dp distances hash-match.
"""

from __future__ import annotations

from functools import reduce
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round6, round6_sql, sql_double

PQ_M = 8  # subspaces (dim 64 -> 8 dims per subspace)
PQ_K = 16  # codes per subspace (4 bits)

Codebooks = List[List[List[float]]]  # [m][K][dsub]


def _check_pq(dim: int, m: int, K: int) -> int:
    if m < 1 or K < 1:
        raise ValueError(f"m and K must be >= 1: m={m} K={K}")
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    return dim // m


def pq_seed_codebooks(
    embeddings: DataFrame,
    m: int = PQ_M,
    K: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Seed codebooks: entry ``i`` of subspace ``j`` = slice ``j`` of
    the ``i``-th seed vector; seeds are the ``K`` lowest
    (md5(vec_id), vec_id) rows — a K-row bounded collect (the vocab-
    probe class), layout-independent, and re-derivable in SQL so the
    gate oracle needs no injected literals."""
    rows = (
        embeddings.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
        )
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(int(K))
        .collect()
    )
    if not rows:
        raise ValueError("empty embeddings table: no seed codebooks")
    dim = len(rows[0]["v"])
    dsub = _check_pq(dim, m, K)
    seeds = [[float(x) for x in r["v"]] for r in rows]
    return [
        [s[j * dsub : (j + 1) * dsub] for s in seeds] for j in range(m)
    ]


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = PQ_M,
    K: int = PQ_K,
    sample_n: int = 2048,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Per-subspace Lloyd k-means (Euclidean — PQ quantizes residual
    geometry, not angles) over the deterministic md5 sample: init =
    first ``K`` distinct subvectors in hash order, assignment = argmin
    squared distance with lowest index on ties (the exact encode-time
    criterion), means in float64 on the driver. Same determinism
    contract as ``train_centroids``: same table -> bit-identical
    codebooks under any partitioning. Inject the result via the
    ``codebooks=`` argument of the operators AND the SQL builders (as
    literals) for trained-parity gates."""
    import numpy as np

    rows = (
        embeddings.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
        )
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(int(sample_n))
        .collect()
    )
    if not rows:
        raise ValueError("empty embeddings table: nothing to train on")
    sample = np.array([r["v"] for r in rows], dtype=np.float64)
    dim = sample.shape[1]
    dsub = _check_pq(dim, m, K)
    books: Codebooks = []
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        seen: set = set()
        init = []
        for v in sub:
            key = v.tobytes()
            if key not in seen:
                seen.add(key)
                init.append(v)
            if len(init) == K:
                break
        cents = np.stack(init)
        for _ in range(int(iters)):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # lowest index wins ties
            nxt = cents.copy()
            for c in range(cents.shape[0]):
                members = sub[assign == c]
                if len(members):
                    nxt[c] = members.mean(axis=0)
            cents = nxt
        books.append([[float(x) for x in c] for c in cents])
    return books


def save_pq(path: str, codebooks: Codebooks) -> None:
    """Persist a codebook artifact (json m x K x dsub float table —
    driver-sized, like the centroid/classifier seam artifacts)."""
    import json

    with open(path, "w") as f:
        json.dump(codebooks, f)


def load_pq(path: str) -> Codebooks:
    import json

    with open(path) as f:
        return [
            [[float(x) for x in c] for c in book] for book in json.load(f)
        ]


def _subdist(sub_col, entry: Sequence[float]):
    """Ordered left fold of (a-b)^2 in element order — the exact op
    sequence DuckDB's list_dot_product(diff, diff) performs."""
    arr = F.array(*[F.lit(float(x)) for x in entry])
    return F.aggregate(
        F.zip_with(sub_col, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_code_cols(vec_col, codebooks: Codebooks):
    """One bigint code expression per subspace: argmin over the K
    entry distances, lowest index on ties (array_position returns the
    FIRST match of the min element)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    v = vec_col.cast("array<double>")
    codes = []
    for j in range(m):
        sub = F.slice(v, j * dsub + 1, dsub)
        dists = F.array(*[_subdist(sub, e) for e in codebooks[j]])
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - F.lit(1)).cast(
                "long"
            )
        )
    return codes


def pq_codes_summary(
    embeddings: DataFrame,
    codebooks: Optional[Codebooks] = None,
    m: int = PQ_M,
    K: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, code_key, code_min, code_max) — all-integer pin of the
    encode lane (the sq_codes precedent: zero float-hash exposure).
    ``code_key`` is the radix-K positional packing sum_j code_j * K^j,
    so it pins every subspace's exact code, not just their sum."""
    if codebooks is None:
        codebooks = pq_seed_codebooks(embeddings, m, K, id_col, vec_col)
    K = max(len(b) for b in codebooks)
    codes = _pq_code_cols(F.col(vec_col), codebooks)
    key = reduce(
        lambda a, b: a + b,
        [c * F.lit(int(K) ** j).cast("long") for j, c in enumerate(codes)],
    )
    return embeddings.select(
        F.col(id_col),
        key.cast("long").alias("code_key"),
        F.least(*codes).cast("long").alias("code_min"),
        F.greatest(*codes).cast("long").alias("code_max"),
    ).orderBy(id_col)


def pq_adc_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    codebooks: Optional[Codebooks] = None,
    m: int = PQ_M,
    K: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(rank, vec_id, dist) — ADC top-k ascending squared distance:
    the query precomputes the m x K subspace distance table driver-side
    (exactly ||q_j - c_ji||^2, the same ordered fold the encode lane
    uses) and each document pays m literal-array lookups plus an
    ordered m-term sum. The corpus-side plan is encode + lookup + sum
    as one expression chain cut by TakeOrdered — no float-vector scan,
    no shuffle. Ties break on vec_id asc."""
    from pyspark.sql.window import Window

    if codebooks is None:
        codebooks = pq_seed_codebooks(embeddings, m, K, id_col, vec_col)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    q = [float(x) for x in qvec]
    if len(q) != m * dsub:
        raise ValueError(f"qvec dim {len(q)} != {m}*{dsub}")
    # dtab[j][i] = ||q_j - c_ji||^2, folded in element order (matches
    # both the encode fold and the oracle's list_dot_product)
    dtab = []
    for j in range(m):
        row = []
        for entry in codebooks[j]:
            acc = 0.0
            for t in range(dsub):
                d = q[j * dsub + t] - entry[t]
                acc = acc + d * d
            row.append(acc)
        dtab.append(row)
    codes = _pq_code_cols(F.col(vec_col), codebooks)
    # chained + in subspace order == the oracle's sum(qd ORDER BY j)
    dist = reduce(
        lambda a, b: a + b,
        [
            F.element_at(
                F.array(*[F.lit(x) for x in dtab[j]]),
                (codes[j] + F.lit(1)).cast("int"),
            )
            for j in range(m)
        ],
    )
    scored = embeddings.select(F.col(id_col), dist.alias("dist"))
    top = scored.orderBy(F.asc("dist"), F.asc(id_col)).limit(int(k))
    w = Window.orderBy(F.asc("dist"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", F.col(id_col), round6("dist").alias("dist")
    )


def pq_refine_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    refine: int = 4,
    codebooks: Optional[Codebooks] = None,
    m: int = PQ_M,
    K: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(rank, vec_id, dist) — the FAISS ``IndexRefineFlat`` serving
    pattern: stage 1 cuts ``refine * k`` candidates by the compressed
    ADC distance (m table lookups per doc, the pq_adc_topk plan), stage
    2 re-ranks ONLY those candidates by the exact squared distance
    against the stored float vectors and returns the exact top-k. At
    10^12 vectors the full-precision store pages from disk; this plan
    touches it for ``refine*k`` rows instead of the corpus — the
    two-stage compressed-scan + exact-refine shape every production ANN
    tier (FAISS refine, ScaNN reordering, Lucene/ES int8-rescore) runs.

    Candidate-set parity: the stage-1 cut orders by (adc_dist asc,
    vec_id asc) — the same total order on both engines, so the refine
    window is identical even when ADC distances tie at the boundary.
    Exact-distance parity: the ordered element fold of (a-b)^2 (==
    DuckDB ``list_dot_product`` of the diff with itself), the house
    rule every distance in this module follows. Final ties break on
    vec_id asc; dist is the EXACT distance, 6-dp rounded."""
    from pyspark.sql.window import Window

    if k < 1 or refine < 1:
        raise ValueError(f"k and refine must be >= 1: k={k} refine={refine}")
    if codebooks is None:
        codebooks = pq_seed_codebooks(embeddings, m, K, id_col, vec_col)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    q = [float(x) for x in qvec]
    if len(q) != m * dsub:
        raise ValueError(f"qvec dim {len(q)} != {m}*{dsub}")
    dtab = []
    for j in range(m):
        row = []
        for entry in codebooks[j]:
            acc = 0.0
            for t in range(dsub):
                d = q[j * dsub + t] - entry[t]
                acc = acc + d * d
            row.append(acc)
        dtab.append(row)
    codes = _pq_code_cols(F.col(vec_col), codebooks)
    adc = reduce(
        lambda a, b: a + b,
        [
            F.element_at(
                F.array(*[F.lit(x) for x in dtab[j]]),
                (codes[j] + F.lit(1)).cast("int"),
            )
            for j in range(m)
        ],
    )
    # stage 1: compressed scan, TakeOrdered refine*k cut — the full
    # float vector rides along so stage 2 never rejoins the corpus
    cand = (
        embeddings.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
            adc.alias("_adc"),
        )
        .orderBy(F.asc("_adc"), F.asc(id_col))
        .limit(int(refine) * int(k))
    )
    # stage 2: exact distance on the refine*k survivors only
    qarr = F.array(*[F.lit(x) for x in q])
    exact = F.aggregate(
        F.zip_with(F.col("_v"), qarr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    top = (
        cand.select(F.col(id_col), exact.alias("dist"))
        .orderBy(F.asc("dist"), F.asc(id_col))
        .limit(int(k))
    )
    w = Window.orderBy(F.asc("dist"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", F.col(id_col), round6("dist").alias("dist")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    m: int = PQ_M,
    K: int = PQ_K,
    k_cells: Optional[int] = None,
    centroids: Optional[List[List[float]]] = None,
    codebooks: Optional[Codebooks] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(rank, vec_id, dist) — the full FAISS-IVFPQ serving stack
    composed end to end: the coarse quantizer prunes the scan to the
    query's ``nprobe`` nearest cells (with the vector table partitioned
    by cell this is partition pruning — nprobe/k_cells of the corpus is
    read), and ONLY those candidates pay the ADC distance (m table
    lookups + an ordered m-term sum; the compressed codes are the only
    per-vector bytes touched). Distances are against the stored vectors
    directly (FAISS ``by_residual=False``); both quantizers take the
    trained-artifact seams (``train_centroids`` / ``train_pq_codebooks``)
    or the SQL-derivable seeds. Ties break on vec_id asc."""
    from .similarity import N_IVF_CELLS, _cell_col, ivf_centroids

    if int(k) < 1 or int(nprobe) < 1:
        raise ValueError(f"k and nprobe must be >= 1: k={k} nprobe={nprobe}")
    q = [float(x) for x in qvec]
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(len(q), k_cells or N_IVF_CELLS)
    )
    qdots = [sum(a * b for a, b in zip(q, c)) for c in cents]
    probe = sorted(range(len(cents)), key=lambda i: (-qdots[i], i))[
        : int(nprobe)
    ]
    if codebooks is None:
        codebooks = pq_seed_codebooks(embeddings, m, K, id_col, vec_col)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(q) != m * dsub:
        raise ValueError(f"qvec dim {len(q)} != {m}*{dsub}")
    dtab = []
    for j in range(m):
        row = []
        for entry in codebooks[j]:
            acc = 0.0
            for t in range(dsub):
                d = q[j * dsub + t] - entry[t]
                acc = acc + d * d
            row.append(acc)
        dtab.append(row)
    # prune FIRST: only the probed cells' rows reach the encode chain
    cand = embeddings.where(
        _cell_col(cents, vec_col).isin([int(p) for p in probe])
    )
    codes = _pq_code_cols(F.col(vec_col), codebooks)
    dist = reduce(
        lambda a, b: a + b,
        [
            F.element_at(
                F.array(*[F.lit(x) for x in dtab[j]]),
                (codes[j] + F.lit(1)).cast("int"),
            )
            for j in range(m)
        ],
    )
    from pyspark.sql.window import Window

    scored = cand.select(F.col(id_col), dist.alias("dist"))
    top = scored.orderBy(F.asc("dist"), F.asc(id_col)).limit(int(k))
    w = Window.orderBy(F.asc("dist"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", F.col(id_col), round6("dist").alias("dist")
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors
# ---------------------------------------------------------------------------


def _cb_literal_sql(codebooks: Codebooks) -> str:
    """cb(si, j, cv) VALUES relation from injected (trained) codebooks
    — si is 1-based to match the derived row_number layout."""
    vals = []
    for j, book in enumerate(codebooks):
        for i, entry in enumerate(book):
            lst = "[" + ", ".join(sql_double(float(x)) for x in entry) + "]"
            vals.append(f"({i + 1}, {j + 1}, {lst}::DOUBLE[])")
    return (
        "cb AS (SELECT * FROM (VALUES " + ", ".join(vals) + ") AS t(si, j, cv))"
    )


def _pq_ctes(m: int, K: int, codebooks: Optional[Codebooks]) -> str:
    """Shared CTE chain: e (double vectors), cb (codebooks — derived
    from the md5 seed sample unless injected), subs (per-vector
    subspace slices), codes (per-(vec, subspace) argmin code)."""
    if codebooks is not None:
        m = len(codebooks)
        dsub = len(codebooks[0][0])
        cb = _cb_literal_sql(codebooks)
        pre = (
            "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
            f"js AS (SELECT unnest(generate_series(1, {m})) AS j), "
            f"{cb}, "
        )
    else:
        cb = (
            "seeds AS (SELECT v, CAST(row_number() OVER "
            "(ORDER BY md5(vec_id::VARCHAR), vec_id) AS BIGINT) AS si "
            "FROM e ORDER BY md5(vec_id::VARCHAR), vec_id "
            f"LIMIT {int(K)}), "
            "cb AS (SELECT si, j, "
            "list_slice(v, (j-1)*(len(v)//" + str(int(m)) + ")+1, "
            "j*(len(v)//" + str(int(m)) + ")) AS cv "
            "FROM seeds CROSS JOIN js)"
        )
        pre = (
            "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
            f"js AS (SELECT unnest(generate_series(1, {int(m)})) AS j), "
            f"{cb}, "
        )
    return pre + (
        "subs AS (SELECT vec_id, j, "
        "list_slice(v, (j-1)*len(cv0)+1, j*len(cv0)) AS sv "
        "FROM e CROSS JOIN js CROSS JOIN "
        "(SELECT cv AS cv0 FROM cb WHERE si = 1 AND j = 1)), "
        "d AS (SELECT vec_id, j, si, list_dot_product("
        "list_transform(generate_series(1, len(cv)), t -> sv[t] - cv[t]), "
        "list_transform(generate_series(1, len(cv)), t -> sv[t] - cv[t])"
        ") AS dist FROM subs JOIN cb USING (j)), "
        "codes AS (SELECT vec_id, j, si - 1 AS code FROM ("
        "SELECT vec_id, j, si, row_number() OVER "
        "(PARTITION BY vec_id, j ORDER BY dist, si) AS rn FROM d) "
        "WHERE rn = 1)"
    )


def pq_codes_summary_sql(
    m: int = PQ_M, K: int = PQ_K, codebooks: Optional[Codebooks] = None
) -> str:
    if codebooks is not None:
        K = max(len(b) for b in codebooks)
    mult = ", ".join(f"({j + 1}, {int(K) ** j})" for j in range(
        len(codebooks) if codebooks is not None else int(m)
    ))
    return (
        f"WITH {_pq_ctes(m, K, codebooks)}, "
        f"mult AS (SELECT * FROM (VALUES {mult}) AS t(j, w)) "
        "SELECT vec_id, CAST(sum(code * w) AS BIGINT) AS code_key, "
        "CAST(min(code) AS BIGINT) AS code_min, "
        "CAST(max(code) AS BIGINT) AS code_max "
        "FROM codes JOIN mult USING (j) GROUP BY vec_id ORDER BY vec_id"
    )


def ivfpq_topk_sql(
    qvec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    m: int = PQ_M,
    K: int = PQ_K,
    k_cells: Optional[int] = None,
    centroids: Optional[List[List[float]]] = None,
    codebooks: Optional[Codebooks] = None,
) -> str:
    """DuckDB mirror of ``ivfpq_topk``: the IVF cell chain
    (similarity._cell_sql) + the PQ code chain (_pq_ctes) composed —
    candidates are the probed cells' vec_ids, the ADC sum runs over
    those only."""
    from .similarity import N_IVF_CELLS, _cell_sql, ivf_centroids

    q = [float(x) for x in qvec]
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(len(q), k_cells or N_IVF_CELLS)
    )
    qdots = [sum(a * b for a, b in zip(q, c)) for c in cents]
    probe = sorted(range(len(cents)), key=lambda i: (-qdots[i], i))[
        : int(nprobe)
    ]
    mm = len(codebooks) if codebooks is not None else int(m)
    if len(q) % mm != 0:
        raise ValueError(f"qvec dim {len(q)} not divisible by m {mm}")
    dsub = len(q) // mm
    qvals = []
    for j in range(mm):
        lst = "[" + ", ".join(
            sql_double(x) for x in q[j * dsub : (j + 1) * dsub]
        ) + "]"
        qvals.append(f"({j + 1}, {lst}::DOUBLE[])")
    plist = ", ".join(str(int(p)) for p in probe)
    return (
        f"WITH {_cell_sql(len(cents), len(q), cents)}, "
        f"{_pq_ctes(m, K, codebooks)}, "
        f"cand AS (SELECT vec_id FROM cells WHERE cell IN ({plist})), "
        "qsub AS (SELECT * FROM (VALUES "
        + ", ".join(qvals)
        + ") AS t(j, qs)), "
        "dt AS (SELECT si, j, list_dot_product("
        "list_transform(generate_series(1, len(cv)), t -> qs[t] - cv[t]), "
        "list_transform(generate_series(1, len(cv)), t -> qs[t] - cv[t])"
        ") AS qd FROM cb JOIN qsub USING (j)), "
        "dist AS (SELECT c.vec_id, sum(dt.qd ORDER BY c.j) AS dist "
        "FROM codes c JOIN dt ON dt.j = c.j AND dt.si = c.code + 1 "
        "WHERE c.vec_id IN (SELECT vec_id FROM cand) "
        "GROUP BY c.vec_id) "
        "SELECT CAST(row_number() OVER (ORDER BY dist ASC, vec_id ASC) AS INT) "
        f"AS rank, vec_id, {round6_sql('dist')} AS dist FROM dist "
        f"ORDER BY dist ASC, vec_id ASC LIMIT {int(k)}"
    )


def pq_refine_topk_sql(
    qvec: Sequence[float],
    k: int = 10,
    refine: int = 4,
    m: int = PQ_M,
    K: int = PQ_K,
    codebooks: Optional[Codebooks] = None,
) -> str:
    """DuckDB mirror of ``pq_refine_topk``: the ADC chain cut to
    refine*k by (adc asc, vec_id asc), then exact
    list_dot_product(diff, diff) re-rank of the candidates only."""
    q = [float(x) for x in qvec]
    mm = len(codebooks) if codebooks is not None else int(m)
    if len(q) % mm != 0:
        raise ValueError(f"qvec dim {len(q)} not divisible by m {mm}")
    dsub = len(q) // mm
    qvals = []
    for j in range(mm):
        lst = "[" + ", ".join(
            sql_double(x) for x in q[j * dsub : (j + 1) * dsub]
        ) + "]"
        qvals.append(f"({j + 1}, {lst}::DOUBLE[])")
    qfull = "[" + ", ".join(sql_double(x) for x in q) + "]::DOUBLE[]"
    return (
        f"WITH {_pq_ctes(m, K, codebooks)}, "
        "qsub AS (SELECT * FROM (VALUES "
        + ", ".join(qvals)
        + ") AS t(j, qs)), "
        "dt AS (SELECT si, j, list_dot_product("
        "list_transform(generate_series(1, len(cv)), t -> qs[t] - cv[t]), "
        "list_transform(generate_series(1, len(cv)), t -> qs[t] - cv[t])"
        ") AS qd FROM cb JOIN qsub USING (j)), "
        "adc AS (SELECT c.vec_id, sum(dt.qd ORDER BY c.j) AS adc "
        "FROM codes c JOIN dt ON dt.j = c.j AND dt.si = c.code + 1 "
        "GROUP BY c.vec_id), "
        "cand AS (SELECT vec_id FROM adc "
        f"ORDER BY adc ASC, vec_id ASC LIMIT {int(refine) * int(k)}), "
        f"qv AS (SELECT {qfull} AS q), "
        "exact AS (SELECT e.vec_id, list_dot_product("
        "list_transform(generate_series(1, len(v)), t -> v[t] - q[t]), "
        "list_transform(generate_series(1, len(v)), t -> v[t] - q[t])"
        ") AS dist FROM e JOIN cand USING (vec_id) CROSS JOIN qv) "
        "SELECT CAST(row_number() OVER (ORDER BY dist ASC, vec_id ASC) AS INT) "
        f"AS rank, vec_id, {round6_sql('dist')} AS dist FROM exact "
        f"ORDER BY dist ASC, vec_id ASC LIMIT {int(k)}"
    )


def pq_adc_topk_sql(
    qvec: Sequence[float],
    k: int = 10,
    m: int = PQ_M,
    K: int = PQ_K,
    codebooks: Optional[Codebooks] = None,
) -> str:
    q = [float(x) for x in qvec]
    mm = len(codebooks) if codebooks is not None else int(m)
    if len(q) % mm != 0:
        raise ValueError(f"qvec dim {len(q)} not divisible by m {mm}")
    dsub = len(q) // mm
    qvals = []
    for j in range(mm):
        lst = "[" + ", ".join(
            sql_double(x) for x in q[j * dsub : (j + 1) * dsub]
        ) + "]"
        qvals.append(f"({j + 1}, {lst}::DOUBLE[])")
    return (
        f"WITH {_pq_ctes(m, K, codebooks)}, "
        "qsub AS (SELECT * FROM (VALUES "
        + ", ".join(qvals)
        + ") AS t(j, qs)), "
        "dt AS (SELECT si, j, list_dot_product("
        "list_transform(generate_series(1, len(cv)), t -> qs[t] - cv[t]), "
        "list_transform(generate_series(1, len(cv)), t -> qs[t] - cv[t])"
        ") AS qd FROM cb JOIN qsub USING (j)), "
        "dist AS (SELECT c.vec_id, sum(dt.qd ORDER BY c.j) AS dist "
        "FROM codes c JOIN dt ON dt.j = c.j AND dt.si = c.code + 1 "
        "GROUP BY c.vec_id) "
        "SELECT CAST(row_number() OVER (ORDER BY dist ASC, vec_id ASC) AS INT) "
        f"AS rank, vec_id, {round6_sql('dist')} AS dist FROM dist "
        f"ORDER BY dist ASC, vec_id ASC LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# residual IVF-PQ (FAISS by_residual=True — the IndexIVFPQ default)
# ---------------------------------------------------------------------------


def ivfpq_residual_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    m: int = PQ_M,
    K: int = PQ_K,
    k_cells: Optional[int] = None,
    centroids: Optional[List[List[float]]] = None,
    codebooks: Optional[Codebooks] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(rank, vec_id, dist) — IVF-PQ with RESIDUAL encoding, the
    actual FAISS IndexIVFPQ default (``by_residual=True``): each
    vector's PQ codes quantize r = v - centroid(cell(v)) instead of v,
    and the query builds a SEPARATE distance table per probed cell
    from its own residual query q - centroid_p — the classic accuracy
    win because residuals concentrate near 0, so one codebook covers
    every cell's local geometry.

    Plan shape vs ivfpq_topk: identical scan pruning (cell isin probe
    — partition pruning on a cell-partitioned table), the residual is
    one zip_with against the row's OWN cell centroid (a literal-array
    element_at on the cell code — still zero joins), codes are the
    same argmin chain over the residual, and the ADC distance is an
    nprobe-branch CASE on the cell, each branch the m-lookup ordered
    sum against that cell's table. Seed codebooks stay the raw-vector
    md5 sample (quantizer-space-agnostic anchors, SQL-derivable);
    trained residual codebooks inject via the train_pq_codebooks seam
    unchanged.
    """
    from .similarity import N_IVF_CELLS, _cell_col, ivf_centroids

    if int(k) < 1 or int(nprobe) < 1:
        raise ValueError(f"k and nprobe must be >= 1: k={k} nprobe={nprobe}")
    q = [float(x) for x in qvec]
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(len(q), k_cells or N_IVF_CELLS)
    )
    qdots = [sum(a * b for a, b in zip(q, c)) for c in cents]
    probe = sorted(range(len(cents)), key=lambda i: (-qdots[i], i))[
        : int(nprobe)
    ]
    if codebooks is None:
        codebooks = pq_seed_codebooks(embeddings, m, K, id_col, vec_col)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(q) != m * dsub:
        raise ValueError(f"qvec dim {len(q)} != {m}*{dsub}")
    # per-probed-cell distance tables from the cell's residual query
    dtabs = {}
    for p in probe:
        qr = [q[t] - cents[p][t] for t in range(len(q))]
        rows = []
        for j in range(m):
            row = []
            for entry in codebooks[j]:
                acc = 0.0
                for t in range(dsub):
                    d = qr[j * dsub + t] - entry[t]
                    acc = acc + d * d
                row.append(acc)
            rows.append(row)
        dtabs[p] = rows

    cent_arrs = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    )
    d = embeddings.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
        _cell_col(cents, vec_col).alias("_cell"),
    ).where(F.col("_cell").isin([int(p) for p in probe]))
    rv = F.zip_with(
        F.col("_v"),
        F.element_at(cent_arrs, (F.col("_cell") + F.lit(1)).cast("int")),
        lambda a, b: a - b,
    )
    d = d.withColumn("_rv", rv)
    codes = _pq_code_cols(F.col("_rv"), codebooks)
    dist = None
    for p in probe:
        branch = reduce(
            lambda a, b: a + b,
            [
                F.element_at(
                    F.array(*[F.lit(x) for x in dtabs[p][j]]),
                    (codes[j] + F.lit(1)).cast("int"),
                )
                for j in range(m)
            ],
        )
        cond = F.col("_cell") == int(p)
        dist = F.when(cond, branch) if dist is None else dist.when(cond, branch)

    from pyspark.sql.window import Window

    scored = d.select(F.col(id_col), dist.alias("dist"))
    top = scored.orderBy(F.asc("dist"), F.asc(id_col)).limit(int(k))
    w = Window.orderBy(F.asc("dist"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", F.col(id_col), round6("dist").alias("dist")
    )


def ivfpq_residual_topk_sql(
    qvec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    m: int = PQ_M,
    K: int = PQ_K,
    k_cells: Optional[int] = None,
    centroids: Optional[List[List[float]]] = None,
    codebooks: Optional[Codebooks] = None,
) -> str:
    """DuckDB mirror of ivfpq_residual_topk: the cell chain + a
    residual-vector relation (v - own-cell centroid, elementwise in
    index order) + the argmin code chain over residual slices + the
    per-probed-cell distance tables keyed by (cell, j, si)."""
    from .similarity import N_IVF_CELLS, _cell_sql, ivf_centroids

    q = [float(x) for x in qvec]
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(len(q), k_cells or N_IVF_CELLS)
    )
    qdots = [sum(a * b for a, b in zip(q, c)) for c in cents]
    probe = sorted(range(len(cents)), key=lambda i: (-qdots[i], i))[
        : int(nprobe)
    ]
    mm = len(codebooks) if codebooks is not None else int(m)
    if len(q) % mm != 0:
        raise ValueError(f"qvec dim {len(q)} not divisible by m {mm}")
    dsub = len(q) // mm
    # centroid literal relation for the residual subtraction
    cent_vals = ", ".join(
        f"({i}, [" + ", ".join(sql_double(x) for x in c) + "]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    # seed codebooks from RAW vectors (the _pq_ctes seeds block) or
    # injected literals — matching the Spark choice
    if codebooks is not None:
        mm = len(codebooks)
        cb = _cb_literal_sql(codebooks)
    else:
        cb = (
            "seeds AS (SELECT v, CAST(row_number() OVER "
            "(ORDER BY md5(vec_id::VARCHAR), vec_id) AS BIGINT) AS si "
            "FROM e ORDER BY md5(vec_id::VARCHAR), vec_id "
            f"LIMIT {int(K)}), "
            "cb AS (SELECT si, j, "
            "list_slice(v, (j-1)*(len(v)//" + str(int(mm)) + ")+1, "
            "j*(len(v)//" + str(int(mm)) + ")) AS cv "
            "FROM seeds CROSS JOIN js)"
        )
    qvals = []
    for p in probe:
        qr = [q[t] - cents[p][t] for t in range(len(q))]
        for j in range(mm):
            lst = "[" + ", ".join(
                sql_double(x) for x in qr[j * dsub : (j + 1) * dsub]
            ) + "]"
            qvals.append(f"({int(p)}, {j + 1}, {lst}::DOUBLE[])")
    plist = ", ".join(str(int(p)) for p in probe)
    return (
        f"WITH {_cell_sql(len(cents), len(q), cents)}, "
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"js AS (SELECT unnest(generate_series(1, {int(mm)})) AS j), "
        f"{cb}, "
        f"cent AS (SELECT * FROM (VALUES {cent_vals}) AS t(cell, cv)), "
        f"cand AS (SELECT vec_id, cell FROM cells WHERE cell IN ({plist})), "
        "re AS (SELECT e.vec_id, cand.cell, "
        "list_transform(generate_series(1, len(v)), t -> v[t] - cent.cv[t]) AS rv "
        "FROM e JOIN cand USING (vec_id) JOIN cent ON cent.cell = cand.cell), "
        "subs AS (SELECT vec_id, cell, j, "
        "list_slice(rv, (j-1)*len(cv0)+1, j*len(cv0)) AS sv "
        "FROM re CROSS JOIN js CROSS JOIN "
        "(SELECT cv AS cv0 FROM cb WHERE si = 1 AND j = 1)), "
        "d AS (SELECT vec_id, cell, j, si, list_dot_product("
        "list_transform(generate_series(1, len(cv)), t -> sv[t] - cv[t]), "
        "list_transform(generate_series(1, len(cv)), t -> sv[t] - cv[t])"
        ") AS dist FROM subs JOIN cb USING (j)), "
        "codes AS (SELECT vec_id, cell, j, si - 1 AS code FROM ("
        "SELECT vec_id, cell, j, si, row_number() OVER "
        "(PARTITION BY vec_id, j ORDER BY dist, si) AS rn FROM d) "
        "WHERE rn = 1), "
        "qsub AS (SELECT * FROM (VALUES "
        + ", ".join(qvals)
        + ") AS t(cell, j, qs)), "
        "dt AS (SELECT cb.si, qsub.cell, qsub.j, list_dot_product("
        "list_transform(generate_series(1, len(cv)), t -> qs[t] - cv[t]), "
        "list_transform(generate_series(1, len(cv)), t -> qs[t] - cv[t])"
        ") AS qd FROM cb JOIN qsub USING (j)), "
        "dist AS (SELECT c.vec_id, sum(dt.qd ORDER BY c.j) AS dist "
        "FROM codes c JOIN dt ON dt.j = c.j AND dt.si = c.code + 1 "
        "AND dt.cell = c.cell "
        "GROUP BY c.vec_id) "
        "SELECT CAST(row_number() OVER (ORDER BY dist ASC, vec_id ASC) AS INT) "
        f"AS rank, vec_id, {round6_sql('dist')} AS dist FROM dist "
        f"ORDER BY dist ASC, vec_id ASC LIMIT {int(k)}"
    )
