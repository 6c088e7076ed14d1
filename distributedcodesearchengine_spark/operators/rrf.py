"""Reciprocal Rank Fusion hybrid merge (SURVEY §2.4 J1-J3, §2.6 T2/T5).

Faithful re-expression of the reference's ``_reciprocal_rank_fusion``
(``codesearch/search/engine.py:273-392``) as a DataFrame plan:

- Each input is a ranked list (rank 0-based by list position).
- rrf side contribution: weight * 1/(k + rank + 1), k=60 (engine.py:313,324).
- FULL OUTER join on the doc key; a missing side contributes 0.
- Adaptive weight (J2): if the semantic score range < 0.05 the semantic
  weight is forced to 0.3 (engine.py:295-302).
- Boost (J3): a multiplicative CASE over metadata patterns
  (engine.py:338-367 — api.py/sessions.py/adapters.py rules; here a
  parameterized rule list so the web analog can boost on host/source).
- combined = (sem_rrf + bm25_rrf) * boost, sorted desc; TIE-BREAK is
  the reference's dict-insertion order: semantic-list order first, then
  bm25-only entries in bm25 order (engine.py:369-381 via stable sort).
- Max-normalize so the top result is 1.0 (engine.py:383-390).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_K = 60
DEFAULT_SEMANTIC_WEIGHT = 0.7
LOW_DIVERSITY_RANGE = 0.05
LOW_DIVERSITY_WEIGHT = 0.3

# (path_pattern, name_pattern, factor) CASE rules, first match wins;
# transcription of engine.py:347-367. patterns are `contains` matches;
# None = don't care. Applied only when the query mentions http/request/api.
HTTP_BOOST_RULES: List[Tuple[Optional[str], Optional[str], float]] = [
    ("api.py", "request", 1.5), ("api.py", "get", 1.5), ("api.py", "post", 1.5),
    ("api.py", "put", 1.5), ("api.py", "patch", 1.5), ("api.py", "delete", 1.5),
    ("api.py", "head", 1.5), ("api.py", "options", 1.5), ("api.py", None, 1.0),
    ("sessions.py", "send", 1.5),
    ("adapters.py", "send", 1.3),
    (None, "handle_", 0.7), (None, "test_", 0.7),
]


def query_mentions_http(query: Optional[str]) -> bool:
    return bool(query) and any(
        t in query.lower() for t in ("http", "request", "api")
    )


def boost_col(path_col, name_col, rules=None):
    """Multiplicative boost CASE expression (first matching rule wins)."""
    rules = HTTP_BOOST_RULES if rules is None else rules
    expr = F.lit(1.0)
    # build the CASE from the last rule backwards so the FIRST rule wins
    for path_pat, name_pat, factor in reversed(rules):
        cond = F.lit(True)
        if path_pat is not None:
            cond = cond & F.lower(path_col).contains(path_pat)
        if name_pat is not None:
            cond = cond & F.lower(name_col).contains(name_pat)
        expr = F.when(cond, F.lit(float(factor))).otherwise(expr)
    return expr


def with_rank(df: DataFrame, id_col: str) -> DataFrame:
    """Attach the 0-based list rank. Inputs are top-2k overfetched lists
    (engine.py:207,214) — tiny, so a global window is fine here."""
    if "rank" in df.columns:  # 1-based rank from a topk operator
        return df.withColumn("rank", F.col("rank") - 1)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return df.withColumn("rank", F.row_number().over(w) - 1)


def rrf_merge(
    semantic: Optional[DataFrame],
    bm25: Optional[DataFrame],
    id_col: str = "doc_id",
    semantic_weight: float = DEFAULT_SEMANTIC_WEIGHT,
    k: int = RRF_K,
    query: Optional[str] = None,
    boost: Optional[DataFrame] = None,
    limit: Optional[int] = None,
) -> DataFrame:
    """Merge two ranked lists -> (doc_id, score, semantic_score,
    bm25_score) with the reference's combined/normalized scores.

    ``semantic``/``bm25``: (id_col, score [, rank]) ranked lists; at
    least one is required.
    ``boost``: optional (id_col, boost) DataFrame (built e.g. from
    metadata with ``boost_col``); joined in and applied only when
    ``query_mentions_http(query)``, like the reference.
    """
    sem = with_rank(semantic, id_col) if semantic is not None else None
    bm = with_rank(bm25, id_col) if bm25 is not None else None

    weight = semantic_weight
    n_sem = 0
    if sem is not None:
        sem = sem.persist()
        stats = sem.agg(
            F.count("*").alias("n"),
            F.max("score").alias("mx"),
            F.min("score").alias("mn"),
        ).first()
        n_sem = int(stats["n"])
        if n_sem > 0 and float(stats["mx"]) - float(stats["mn"]) < LOW_DIVERSITY_RANGE:
            weight = LOW_DIVERSITY_WEIGHT  # J2 adaptive rule
    bm25_weight = 1 - weight

    sem_side = (
        sem.select(
            F.col(id_col),
            (F.lit(weight) * (F.lit(1.0) / (F.lit(k) + F.col("rank") + 1))).alias("semantic_rrf"),
            F.col("score").alias("semantic_score"),
            F.col("rank").alias("_sem_rank"),
        )
        if sem is not None
        else None
    )
    bm_side = (
        bm.select(
            F.col(id_col),
            (F.lit(bm25_weight) * (F.lit(1.0) / (F.lit(k) + F.col("rank") + 1))).alias("bm25_rrf"),
            F.col("score").alias("bm25_score"),
            F.col("rank").alias("_bm_rank"),
        )
        if bm is not None
        else None
    )

    if sem_side is None and bm_side is None:
        raise ValueError("rrf_merge: at least one ranked list required")
    if sem_side is not None and bm_side is not None:
        joined = sem_side.join(bm_side, id_col, "full_outer")
    elif sem_side is not None:
        joined = sem_side.withColumn("bm25_rrf", F.lit(None).cast("double")) \
            .withColumn("bm25_score", F.lit(None).cast("double")) \
            .withColumn("_bm_rank", F.lit(None).cast("int"))
    else:
        joined = bm_side.withColumn("semantic_rrf", F.lit(None).cast("double")) \
            .withColumn("semantic_score", F.lit(None).cast("double")) \
            .withColumn("_sem_rank", F.lit(None).cast("int"))

    if boost is not None and query_mentions_http(query):
        joined = joined.join(
            boost.select(id_col, F.col("boost").alias("_boost")), id_col, "left"
        )
        joost = F.coalesce(F.col("_boost"), F.lit(1.0))
    else:
        joost = F.lit(1.0)

    merged = joined.select(
        F.col(id_col),
        (
            (F.coalesce("semantic_rrf", F.lit(0.0)) + F.coalesce("bm25_rrf", F.lit(0.0)))
            * joost
        ).alias("score"),
        F.coalesce("semantic_score", F.lit(0.0)).alias("semantic_score"),
        F.coalesce("bm25_score", F.lit(0.0)).alias("bm25_score"),
        # dict-insertion tie order: semantic entries first (by sem rank),
        # then bm25-only entries (by bm25 rank)
        F.coalesce(
            F.col("_sem_rank").cast("long"),
            F.lit(n_sem) + F.col("_bm_rank").cast("long"),
        ).alias("_tie"),
    )

    merged = merged.orderBy(F.desc("score"), F.asc("_tie"))

    if limit is not None:
        # k-row tail: materialize the TakeOrdered top-k ONCE and finish
        # (T5 max-normalization + rank) driver-side — one Spark action
        # instead of three full recomputations of the merge subtree
        # (IEEE division is identical either side; order is preserved
        # because positive scaling preserves it)
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        spark = merged.sparkSession
        id_type = merged.schema[id_col].dataType
        rows = merged.limit(limit).collect()
        if sem is not None:
            sem.unpersist()
        mx = max((r["score"] for r in rows), default=None)
        scale = mx if (mx is not None and mx > 0) else 1.0
        data = [
            (i, r[id_col], r["score"] / scale, r["semantic_score"], r["bm25_score"])
            for i, r in enumerate(
                sorted(rows, key=lambda r: (-r["score"], r["_tie"])), start=1
            )
        ]
        schema = StructType(
            [
                StructField("rank", IntegerType()),
                StructField(id_col, id_type),
                StructField("score", DoubleType()),
                StructField("semantic_score", DoubleType()),
                StructField("bm25_score", DoubleType()),
            ]
        )
        return spark.createDataFrame(data, schema)

    # unbounded merge: stay lazy (never collect an unbounded set).
    # localCheckpoint first: the mx action below materializes the merge
    # subtree, and the returned plan reads the materialized rows — the
    # old form unpersisted sem after the eager action, so the caller's
    # action recomputed the whole join/rank subtree uncached
    merged = merged.localCheckpoint(eager=False)
    mx = merged.agg(F.max("score")).first()[0]
    if mx is not None and mx > 0:
        merged = merged.withColumn("score", F.col("score") / F.lit(mx))
    if sem is not None:
        sem.unpersist()
    w = Window.orderBy(F.desc("score"), F.asc("_tie"))
    return merged.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "score", "semantic_score", "bm25_score"
    )


# ---------------------------------------------------------------------------
# linear retriever (ES 8.16): minmax-normalized weighted fusion
# ---------------------------------------------------------------------------


def linear_hybrid_topk(
    semantic: Optional[DataFrame],
    bm25: Optional[DataFrame],
    k: int = 10,
    w_sem: float = 0.5,
    w_lex: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """(rank, doc_id, score, sem_norm, lex_norm) — the ES ``linear``
    retriever: each input list minmax-normalizes its RAW scores to
    [0, 1] and the fused score is the weighted sum w_sem*sem_norm +
    w_lex*lex_norm over the full-outer union (a doc missing from one
    list contributes 0 from that side). SCORE-based fusion — the
    capability RRF's rank-based fusion deliberately discards: two
    docs 0.001 apart in cosine fuse almost identically here, where
    RRF forces a full rank-step between them. A constant list
    (max == min, e.g. the degenerate all-zero BM25 backfill)
    normalizes to 1.0 everywhere (documented; ES leaves this regime
    unspecified).

    Scale: both inputs are k-row overfetch lists; stats are 2 doubles
    per list to the driver; the join is k-row x k-row."""
    if semantic is None and bm25 is None:
        raise ValueError("linear_hybrid_topk: at least one list required")
    if float(w_sem) < 0 or float(w_lex) < 0:
        raise ValueError(f"weights must be >= 0: {w_sem!r}, {w_lex!r}")

    def _norm_side(df: Optional[DataFrame], out: str):
        if df is None:
            return None
        df = df.persist()
        st = df.agg(F.min("score").alias("mn"), F.max("score").alias("mx")).first()
        if st["mn"] is None:
            return None
        mn, mx = float(st["mn"]), float(st["mx"])
        if mx > mn:
            norm = (F.col("score") - F.lit(mn)) / (F.lit(mx) - F.lit(mn))
        else:
            norm = F.lit(1.0)
        return df.select(F.col(id_col), norm.alias(out))

    sem = _norm_side(semantic, "sem_norm")
    lex = _norm_side(bm25, "lex_norm")
    if sem is not None and lex is not None:
        joined = sem.join(lex, id_col, "full_outer")
    elif sem is not None:
        joined = sem.withColumn("lex_norm", F.lit(None).cast("double"))
    elif lex is not None:
        joined = lex.withColumn("sem_norm", F.lit(None).cast("double"))
    else:
        spark = (semantic or bm25).sparkSession
        return spark.createDataFrame(
            [], f"rank int, {id_col} long, score double, sem_norm double, "
            "lex_norm double"
        )
    ns = F.coalesce(F.col("sem_norm"), F.lit(0.0))
    nl = F.coalesce(F.col("lex_norm"), F.lit(0.0))
    fused = F.lit(float(w_sem)) * ns + F.lit(float(w_lex)) * nl
    scored = joined.select(
        F.col(id_col), fused.alias("fused"), ns.alias("ns"), nl.alias("nl")
    )
    top = scored.orderBy(F.desc("fused"), F.asc(id_col)).limit(int(k))
    w = Window.orderBy(F.desc("fused"), F.asc(id_col))
    from ..functions.rounding import round6

    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", F.col(id_col), round6("fused").alias("score"),
        round6("ns").alias("sem_norm"), round6("nl").alias("lex_norm"),
    )
