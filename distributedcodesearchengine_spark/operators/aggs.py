"""Elasticsearch-family aggregations over the BM25 kept set, beyond the
facets/histogram/stats trio in operators/explore.py:

- ``bm25_filters_agg``: the ES ``filters`` aggregation — named buckets,
  each defined by an equality predicate on a docs column, counted over
  the kept set. Every named bucket appears in the result (ES returns
  doc_count 0 for empty buckets); ``max_score`` is 0.0 for an empty
  bucket (the coalesce both engines spell identically).
- ``bm25_range_agg``: the ES ``range`` aggregation — ordered disjoint
  ranges defined by integer cut points over a numeric docs column;
  first range is unbounded below, last unbounded above, interior ranges
  are [lo, hi). All ranges appear, empty ones at n_docs 0.
- ``bm25_top_hits``: the ES ``terms`` aggregation with a ``top_hits``
  sub-aggregation — for each value of a docs column present in the kept
  set, the top-``per_bucket`` documents by (score desc, doc_id asc).
  Unlike ``bm25_collapse_topk`` (which dedups groups inside ONE global
  ranking), top_hits returns an independent ranking per bucket.
- ``bm25_rare_terms``: the ES ``rare_terms`` aggregation — terms whose
  kept-set document count is at most ``max_df``, ranked ascending by
  count (rarest first), term asc tiebreak. The long-tail complement of
  significant_terms' JLH head.

All four ride the aggregation-family spine ``explore._kept_with_cols``
(healthy regime = thresholded candidates only, a docvalues join on
survivors; degenerate all-zero regime = the whole corpus at score 0 —
the reference's result array; empty-tokenizing query = zero rows, F7).
Reference parity: the reference exposes result-set metadata through the
same post-threshold array these aggregate (bm25_index.py:149-164).

Scale notes: filters/range reduce the kept set in ONE conditional-agg
pass (a single 1-row agg job; the bucket fan-out is a driver-side
``stack`` over that row — no per-bucket scan). top_hits is a window
top-n per key: one shuffle on the key column, per-partition sort,
rank filter — the standard grouped-top-n shape at any scale. rare_terms
is a tf semi-join against the (candidate-bounded) kept doc ids plus a
map-side-combinable count; its TakeOrdered k-cut never global-sorts.

Cross-engine parity follows the house conventions: integer counts are
exact; max/score columns round via round6/round6_sql only at the output
boundary; orders and limits bind the RAW columns, never rounded
aliases; bucket names/values are validated before being embedded in
either engine's literal position.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round6
from ..oracle.tokenizer import tokenize
from .explore import _kept_with_cols
from .scorer import Index

_NAME_RE = re.compile(r"^[A-Za-z0-9_]+$")
_VALUE_RE = re.compile(r"^[A-Za-z0-9_\-./:]*$")


def _check_name(s: str, what: str) -> str:
    if not _NAME_RE.match(s):
        raise ValueError(f"unsafe {what}: {s!r}")
    return s


def _check_value(s: str) -> str:
    # values reach the DuckDB mirror inside single quotes; the engine
    # side binds them as literals — keep the two surfaces equally strict
    if not _VALUE_RE.match(s):
        raise ValueError(f"unsafe filter value: {s!r}")
    return s


# ---------------------------------------------------------------------------
# filters aggregation
# ---------------------------------------------------------------------------


def bm25_filters_agg(
    index: Index, query: str, buckets: Dict[str, Tuple[str, str]]
) -> DataFrame:
    """(bucket, n_docs, max_score) — the ES ``filters`` agg: for each
    named bucket (an equality predicate ``col == value`` on a docs
    column), the kept-set document count and best score. Every bucket
    appears (n_docs 0, max_score 0.0 when empty); rows order by bucket
    name."""
    spark = index.spark
    items = sorted(buckets.items())
    if not items:
        raise ValueError("filters aggregation requires at least one bucket")
    for name, (col, val) in items:
        _check_name(name, "bucket name")
        _check_name(col, "column name")
        # F.lit would be safe, but the SQL mirror rejects these values —
        # keep the two surfaces equally strict so a bad bucket spec
        # fails identically on both
        _check_value(val)
    if not tokenize(query):
        return spark.createDataFrame(
            [], "bucket string, n_docs long, max_score double"
        )
    cols = list(dict.fromkeys(c for _, (c, _) in items))
    kept = _kept_with_cols(index, query, cols)
    aggs = []
    for i, (_name, (col, val)) in enumerate(items):
        pred = F.col(col) == F.lit(val)
        aggs.append(
            F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"n_{i}")
        )
        aggs.append(
            F.coalesce(F.max(F.when(pred, F.col("score"))), F.lit(0.0)).alias(
                f"m_{i}"
            )
        )
    row = kept.agg(*aggs)
    stack_items = ", ".join(
        f"'{name}', n_{i}, m_{i}" for i, (name, _) in enumerate(items)
    )
    return (
        row.selectExpr(
            f"stack({len(items)}, {stack_items}) AS (bucket, n_docs, max_score)"
        )
        .select("bucket", "n_docs", round6("max_score").alias("max_score"))
        .orderBy("bucket")
    )


def bm25_filters_agg_sql(query: str, buckets: Dict[str, Tuple[str, str]]) -> str:
    """DuckDB mirror of bm25_filters_agg: the shared kept chain
    (sql_oracle.kept_cte_sql) reduced by one conditional aggregation per
    named bucket (FILTER clauses), unpivoted via UNION ALL,
    coalesce(max, 0.0) for empty buckets."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import kept_cte_sql

    items = sorted(buckets.items())
    if not items:
        raise ValueError("filters aggregation requires at least one bucket")
    cols = list(dict.fromkeys(c for _, (c, _) in items))
    for name, (col, val) in items:
        _check_name(name, "bucket name")
        _check_name(col, "column name")
        _check_value(val)
    chain = kept_cte_sql(query, cols)
    if chain is None:
        return (
            "SELECT '' AS bucket, 1::BIGINT AS n_docs, 0.0 AS max_score "
            "WHERE false"
        )
    selects = []
    for name, (col, val) in items:
        pred = f"{col} = '{val}'"
        selects.append(
            f"SELECT '{name}' AS bucket, "
            f"CAST(count(*) FILTER (WHERE {pred}) AS BIGINT) AS n_docs, "
            f"{round6_sql(f'coalesce(max(score) FILTER (WHERE {pred}), 0.0)')} "
            "AS max_score FROM kept"
        )
    union = " UNION ALL ".join(selects)
    return f"{chain} SELECT * FROM ({union}) ORDER BY bucket"


# ---------------------------------------------------------------------------
# range aggregation
# ---------------------------------------------------------------------------


def _ranges(cuts: Sequence[int]) -> List[Tuple[int, object, object]]:
    cs = [int(c) for c in cuts]
    if cs != sorted(cs) or len(set(cs)) != len(cs) or not cs:
        raise ValueError(f"cuts must be non-empty strictly increasing: {cuts!r}")
    bounds: List[Tuple[int, object, object]] = []
    lo: object = None
    for i, c in enumerate(cs):
        bounds.append((i, lo, c))
        lo = c
    bounds.append((len(cs), lo, None))
    return bounds


def bm25_range_agg(
    index: Index, query: str, col: str = "doc_len", cuts: Sequence[int] = (20, 40)
) -> DataFrame:
    """(range_idx, lo, hi, n_docs, max_score) — the ES ``range`` agg:
    the kept set bucketed by ordered integer cut points on a numeric
    docs column. Range i is [cuts[i-1], cuts[i]) with the first
    unbounded below and the last unbounded above (ES's from-inclusive /
    to-exclusive convention). All ranges appear; empty ones carry
    n_docs 0 / max_score 0.0. One conditional-agg pass; the per-range
    fan-out is a stack over the single agg row."""
    spark = index.spark
    _check_name(col, "column name")
    bounds = _ranges(cuts)
    if not tokenize(query):
        return spark.createDataFrame(
            [],
            "range_idx int, lo long, hi long, n_docs long, max_score double",
        )
    kept = _kept_with_cols(index, query, [col])
    aggs = []
    for i, lo, hi in bounds:
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col(col) >= F.lit(int(lo)))
        if hi is not None:
            pred = pred & (F.col(col) < F.lit(int(hi)))
        aggs.append(
            F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"n_{i}")
        )
        aggs.append(
            F.coalesce(F.max(F.when(pred, F.col("score"))), F.lit(0.0)).alias(
                f"m_{i}"
            )
        )
    row = kept.agg(*aggs)

    def _b(v: object) -> str:
        return "CAST(NULL AS BIGINT)" if v is None else f"CAST({int(v)} AS BIGINT)"

    stack_items = ", ".join(
        f"{i}, {_b(lo)}, {_b(hi)}, n_{i}, m_{i}" for i, lo, hi in bounds
    )
    return (
        row.selectExpr(
            f"stack({len(bounds)}, {stack_items}) "
            "AS (range_idx, lo, hi, n_docs, max_score)"
        )
        .select(
            F.col("range_idx").cast("int").alias("range_idx"),
            "lo",
            "hi",
            "n_docs",
            round6("max_score").alias("max_score"),
        )
        .orderBy("range_idx")
    )


def bm25_range_agg_sql(
    query: str, col: str = "doc_len", cuts: Sequence[int] = (20, 40)
) -> str:
    """DuckDB mirror of bm25_range_agg: the shared kept chain reduced
    by one FILTER-ed aggregate per range, unpivoted via UNION ALL.
    ``col`` must be a doclen-relation column (doc_len)."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import kept_cte_sql

    _check_name(col, "column name")
    bounds = _ranges(cuts)
    chain = kept_cte_sql(query, [col])
    if chain is None:
        return (
            "SELECT 1::INT AS range_idx, 1::BIGINT AS lo, 1::BIGINT AS hi, "
            "1::BIGINT AS n_docs, 0.0 AS max_score WHERE false"
        )
    selects = []
    for i, lo, hi in bounds:
        preds = ["true"]
        if lo is not None:
            preds.append(f"{col} >= {int(lo)}")
        if hi is not None:
            preds.append(f"{col} < {int(hi)}")
        pred = " AND ".join(preds)
        lo_s = "CAST(NULL AS BIGINT)" if lo is None else f"{int(lo)}::BIGINT"
        hi_s = "CAST(NULL AS BIGINT)" if hi is None else f"{int(hi)}::BIGINT"
        selects.append(
            f"SELECT {i}::INT AS range_idx, {lo_s} AS lo, {hi_s} AS hi, "
            f"CAST(count(*) FILTER (WHERE {pred}) AS BIGINT) AS n_docs, "
            f"{round6_sql(f'coalesce(max(score) FILTER (WHERE {pred}), 0.0)')} "
            "AS max_score FROM kept"
        )
    union = " UNION ALL ".join(selects)
    return f"{chain} SELECT * FROM ({union}) ORDER BY range_idx"


# ---------------------------------------------------------------------------
# terms + top_hits aggregation
# ---------------------------------------------------------------------------


def bm25_top_hits(
    index: Index, query: str, key: str = "lang", per_bucket: int = 3
) -> DataFrame:
    """(key, rank, doc_id, score) — the ES ``terms`` agg with a
    ``top_hits`` sub-agg: for each value of ``key`` present in the kept
    set, an independent top-``per_bucket`` ranking by (score desc,
    doc_id asc). rank restarts at 1 inside each bucket; rows order by
    (key asc, rank asc). Only values that occur appear (terms-agg
    semantics — contrast filters_agg's always-present named buckets).

    Scale: one shuffle on ``key`` + per-partition sort + rank filter —
    the standard grouped-top-n window shape; the rank predicate prunes
    to at most per_bucket rows per key before anything leaves the
    exchange."""
    spark = index.spark
    _check_name(key, "column name")
    if not tokenize(query):
        kt = index.docs.schema[key].dataType.simpleString()
        return spark.createDataFrame(
            [], f"{key} {kt}, rank int, doc_id long, score double"
        )
    kept = _kept_with_cols(index, query, [key])
    w = Window.partitionBy(key).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        kept.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(per_bucket))
        .select(
            key,
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            round6("score").alias("score"),
        )
        .orderBy(F.asc(key), F.asc("rank"))
    )


def bm25_top_hits_sql(query: str, key: str = "lang", per_bucket: int = 3) -> str:
    """DuckDB mirror of bm25_top_hits: the shared kept chain + a
    per-key row_number window on the RAW score (rounding only at the
    output projection). ``key`` must be a doclen-relation column."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import kept_cte_sql

    _check_name(key, "column name")
    chain = kept_cte_sql(query, [key])
    if chain is None:
        return (
            f"SELECT '' AS {key}, 1::INT AS rank, 1::BIGINT AS doc_id, "
            "0.0 AS score WHERE false"
        )
    return (
        f"{chain}, "
        "ranked AS ("
        f"  SELECT {key}, CAST(row_number() OVER "
        f"    (PARTITION BY {key} ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        "    doc_id, score FROM kept) "
        f"SELECT {key}, rank, doc_id, {round6_sql('score')} AS score "
        f"FROM ranked WHERE rank <= {int(per_bucket)} "
        f"ORDER BY {key} ASC, rank ASC"
    )


# ---------------------------------------------------------------------------
# rare_terms aggregation
# ---------------------------------------------------------------------------


def bm25_rare_terms(
    index: Index, query: str, max_df: int = 2, k: int = 20
) -> DataFrame:
    """(term, n_docs) — the ES ``rare_terms`` agg: terms whose kept-set
    document count is at most ``max_df``, rarest first (n_docs asc,
    term asc), top-k. The foreground count is one tf semi-join against
    the kept doc ids (candidate-bounded in the healthy regime; the
    degenerate regime's kept set is the corpus, where n_docs == df by
    construction) plus a map-side-combinable groupBy; the k-cut is a
    TakeOrdered, never a global sort."""
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame([], "term string, n_docs long")
    kept = _kept_with_cols(index, query, [])
    fg = (
        index.tf.join(kept.select("doc_id"), "doc_id", "leftsemi")
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    return (
        fg.where(F.col("n_docs") <= int(max_df))
        .orderBy(F.asc("n_docs"), F.asc("term"))
        .limit(int(k))
    )


def bm25_rare_terms_sql(query: str, max_df: int = 2, k: int = 20) -> str:
    """DuckDB mirror of bm25_rare_terms: the shared kept chain's doc
    ids semi-joined against tf, grouped, floored at max_df, ordered
    (n_docs asc, term asc) — a total order, so the LIMIT boundary is
    deterministic on both engines."""
    from ..functions.sql_oracle import kept_cte_sql

    chain = kept_cte_sql(query, [], with_score=False)
    if chain is None:
        return "SELECT '' AS term, 1::BIGINT AS n_docs WHERE false"
    return (
        f"{chain} "
        "SELECT tf.term, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM tf WHERE tf.doc_id IN (SELECT doc_id FROM kept) "
        f"GROUP BY tf.term HAVING count(*) <= {int(max_df)} "
        f"ORDER BY n_docs ASC, term ASC LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# extended_stats aggregation
# ---------------------------------------------------------------------------


def bm25_extended_stats(
    index: Index, query: str, col: str = "doc_len"
) -> DataFrame:
    """1 row (n_docs, sum_v, sum_sq, avg_v, variance, std_dev) — the ES
    ``extended_stats`` agg of an integer docs column over the BM25 kept
    set. The moments n / sum / sum-of-squares are EXACT integers; the
    float tail (avg = sum * 1.0 / n, population variance =
    sum_sq * 1.0 / n - avg * avg, std = sqrt(variance)) is one fixed
    operand sequence both engines execute identically — sqrt is
    correctly rounded per IEEE-754, so the chain is deterministic
    end-to-end. Empty kept set is impossible outside the empty-query
    guard (the degenerate branch keeps the whole corpus)."""
    spark = index.spark
    _check_name(col, "column name")
    if not tokenize(query):
        return spark.createDataFrame(
            [],
            "n_docs long, sum_v long, sum_sq long, avg_v double, "
            "variance double, std_dev double",
        )
    kept = _kept_with_cols(index, query, [col])
    one = kept.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(col).cast("long").alias("sum_v"),
        F.sum(F.col(col).cast("long") * F.col(col).cast("long"))
        .cast("long")
        .alias("sum_sq"),
    )
    avg = F.col("sum_v").cast("double") * F.lit(1.0) / F.col("n_docs")
    var = (
        F.col("sum_sq").cast("double") * F.lit(1.0) / F.col("n_docs")
        - avg * avg
    )
    return one.select(
        "n_docs",
        "sum_v",
        "sum_sq",
        round6(avg).alias("avg_v"),
        round6(var).alias("variance"),
        round6(F.sqrt(var)).alias("std_dev"),
    )


def bm25_extended_stats_sql(query: str, col: str = "doc_len") -> str:
    """DuckDB mirror of bm25_extended_stats: the shared kept chain,
    identical integer moments, identical float tail operand sequence
    (sum * 1.0 / n, sq * 1.0 / n - avg * avg, sqrt)."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import kept_cte_sql

    _check_name(col, "column name")
    chain = kept_cte_sql(query, [col], with_score=False)
    if chain is None:
        return (
            "SELECT 1::BIGINT AS n_docs, 1::BIGINT AS sum_v, "
            "1::BIGINT AS sum_sq, 0.0 AS avg_v, 0.0 AS variance, "
            "0.0 AS std_dev WHERE false"
        )
    avg = "(CAST(sum_v AS DOUBLE) * 1.0 / n_docs)"
    var = f"(CAST(sum_sq AS DOUBLE) * 1.0 / n_docs - {avg} * {avg})"
    return (
        f"{chain}, "
        "one AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST(sum({col}) AS BIGINT) AS sum_v, "
        f"CAST(sum(CAST({col} AS BIGINT) * CAST({col} AS BIGINT)) AS BIGINT) AS sum_sq "
        "FROM kept) "
        "SELECT n_docs, sum_v, sum_sq, "
        f"{round6_sql(avg)} AS avg_v, "
        f"{round6_sql(var)} AS variance, "
        f"{round6_sql(f'sqrt({var})')} AS std_dev FROM one"
    )


# ---------------------------------------------------------------------------
# percentile_ranks aggregation
# ---------------------------------------------------------------------------


def bm25_percentile_ranks(
    index: Index, query: str, col: str = "doc_len",
    values: Sequence[int] = (20, 40),
) -> DataFrame:
    """(value, pct) — the ES ``percentile_ranks`` agg, exact: for each
    probe value v, the percentage of kept documents whose ``col`` <= v
    (100.0 * count / n — one integer-count conditional-agg pass, one
    float division per probe). Rows order by value."""
    spark = index.spark
    _check_name(col, "column name")
    vals = [int(v) for v in values]
    if not vals or vals != sorted(set(vals)):
        raise ValueError(f"values must be non-empty strictly increasing: {values!r}")
    if not tokenize(query):
        return spark.createDataFrame([], "value long, pct double")
    kept = _kept_with_cols(index, query, [col])
    aggs = [F.count("*").cast("long").alias("n")]
    for i, v in enumerate(vals):
        aggs.append(
            F.sum(F.when(F.col(col) <= F.lit(v), F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"c_{i}")
        )
    row = kept.agg(*aggs)
    # CAST(100.0 AS DOUBLE) on both engines: a bare 100.0 literal is
    # typed DECIMAL first (Spark and DuckDB both), and DECIMAL
    # promotion rules differ between them — force the whole chain
    # through double arithmetic with the identical operand sequence
    stack_items = ", ".join(
        f"CAST({v} AS BIGINT), CAST(100.0 AS DOUBLE) * c_{i} / n"
        for i, v in enumerate(vals)
    )
    return (
        row.selectExpr(f"stack({len(vals)}, {stack_items}) AS (value, pct)")
        .select("value", round6("pct").alias("pct"))
        .orderBy("value")
    )


def bm25_percentile_ranks_sql(
    query: str, col: str = "doc_len", values: Sequence[int] = (20, 40)
) -> str:
    """DuckDB mirror of bm25_percentile_ranks: the shared kept chain,
    identical conditional counts, identical
    CAST(100.0 AS DOUBLE) * c / n division per probe."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import kept_cte_sql

    _check_name(col, "column name")
    vals = [int(v) for v in values]
    if not vals or vals != sorted(set(vals)):
        raise ValueError(f"values must be non-empty strictly increasing: {values!r}")
    chain = kept_cte_sql(query, [col], with_score=False)
    if chain is None:
        return "SELECT 1::BIGINT AS value, 0.0 AS pct WHERE false"
    selects = []
    for v in vals:
        selects.append(
            f"SELECT {v}::BIGINT AS value, "
            f"{round6_sql(f'CAST(100.0 AS DOUBLE) * count(*) FILTER (WHERE {col} <= {v}) / count(*)')} "
            "AS pct FROM kept"
        )
    union = " UNION ALL ".join(selects)
    return f"{chain} SELECT * FROM ({union}) ORDER BY value"


# ---------------------------------------------------------------------------
# value_count / cardinality aggregation
# ---------------------------------------------------------------------------


def bm25_cardinality(
    index: Index, query: str, col: str = "source"
) -> DataFrame:
    """1 row (n_values, n_distinct) — the ES ``value_count`` +
    ``cardinality`` aggs of a docs column over the BM25 kept set,
    exact (non-null values counted; distinct over the kept set). The
    candidate-bounded kept set makes exact distinct affordable at
    query time — corpus-wide cardinality belongs to the HLL sketch
    (operators/sketch.hll_distinct), not a per-query agg."""
    spark = index.spark
    _check_name(col, "column name")
    if not tokenize(query):
        return spark.createDataFrame([], "n_values long, n_distinct long")
    kept = _kept_with_cols(index, query, [col])
    return kept.agg(
        F.count(col).cast("long").alias("n_values"),
        F.count_distinct(F.col(col)).cast("long").alias("n_distinct"),
    )


def bm25_cardinality_sql(query: str, col: str = "source") -> str:
    """DuckDB mirror of bm25_cardinality: exact integer counts over the
    shared kept chain."""
    from ..functions.sql_oracle import kept_cte_sql

    _check_name(col, "column name")
    chain = kept_cte_sql(query, [col], with_score=False)
    if chain is None:
        return "SELECT 1::BIGINT AS n_values, 1::BIGINT AS n_distinct WHERE false"
    return (
        f"{chain} "
        f"SELECT CAST(count({col}) AS BIGINT) AS n_values, "
        f"CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct FROM kept"
    )


# ---------------------------------------------------------------------------
# composite aggregation (keyset-paginated buckets)
# ---------------------------------------------------------------------------


def bm25_composite_agg(
    index: Index,
    query: str,
    keys: Sequence[str] = ("lang", "source"),
    size: int = 10,
    after: Sequence[str] = None,
) -> DataFrame:
    """(*keys, n_docs, max_score) — the ES ``composite`` agg: facet
    buckets in total (key-tuple asc) order, paginated by a keyset
    cursor exactly like search_after paginates hits. ``after`` is the
    last key tuple of the previous page (None for page 1); the next
    page is the first ``size`` buckets STRICTLY after it.

    This is the scale path for huge bucket spaces (the reason ES added
    composite): page N costs the same bucket scan + TakeOrdered as
    page 1 — no growing offset, no all-buckets collect. The bucket
    relation itself is the facets groupBy (map-side-combinable counts
    over the kept set)."""
    spark = index.spark
    keys = list(keys)
    if not keys:
        raise ValueError("composite aggregation requires at least one key")
    for c in keys:
        _check_name(c, "column name")
    if after is not None and len(after) != len(keys):
        raise ValueError(
            f"after cursor must have {len(keys)} values: {after!r}"
        )
    if not tokenize(query):
        kts = ", ".join(
            f"{c} {index.docs.schema[c].dataType.simpleString()}" for c in keys
        )
        return spark.createDataFrame(
            [], kts + ", n_docs long, max_score double"
        )
    kept = _kept_with_cols(index, query, keys)
    buckets = kept.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.max("score").alias("_raw_max"),
    )
    if after is not None:
        vals = [str(v) for v in after]
        for v in vals:
            _check_value(v)
        # lexicographic strictly-after: (k1 > a1) OR (k1 = a1 AND k2 > a2) ...
        pred = F.lit(False)
        eq_chain = F.lit(True)
        for c, v in zip(keys, vals):
            pred = pred | (eq_chain & (F.col(c) > F.lit(v)))
            eq_chain = eq_chain & (F.col(c) == F.lit(v))
        buckets = buckets.where(pred)
    return (
        buckets.orderBy(*[F.asc(c) for c in keys])
        .limit(int(size))
        .select(*keys, "n_docs", round6("_raw_max").alias("max_score"))
    )


def bm25_composite_agg_sql(
    query: str,
    keys: Sequence[str] = ("lang", "source"),
    size: int = 10,
    after: Sequence[str] = None,
) -> str:
    """DuckDB mirror of bm25_composite_agg: the shared kept chain
    grouped, cursor-cut with the identical lexicographic predicate,
    ordered by the key tuple, limited."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import kept_cte_sql

    keys = list(keys)
    if not keys:
        raise ValueError("composite aggregation requires at least one key")
    for c in keys:
        _check_name(c, "column name")
    if after is not None and len(after) != len(keys):
        raise ValueError(
            f"after cursor must have {len(keys)} values: {after!r}"
        )
    chain = kept_cte_sql(query, keys)
    if chain is None:
        return (
            "SELECT "
            + ", ".join(f"'' AS {c}" for c in keys)
            + ", 1::BIGINT AS n_docs, 0.0 AS max_score WHERE false"
        )
    key_list = ", ".join(keys)
    cursor = ""
    if after is not None:
        vals = [str(v) for v in after]
        for v in vals:
            _check_value(v)
        ors = []
        eqs = []
        for c, v in zip(keys, vals):
            ors.append(
                "(" + " AND ".join(eqs + [f"{c} > '{v}'"]) + ")"
            )
            eqs.append(f"{c} = '{v}'")
        cursor = " WHERE " + " OR ".join(ors)
    return (
        f"{chain}, "
        f"buckets AS (SELECT {key_list}, CAST(count(*) AS BIGINT) AS n_docs, "
        f"max(score) AS _raw_max FROM kept GROUP BY {key_list})"
        f" SELECT {key_list}, n_docs, {round6_sql('_raw_max')} AS max_score "
        f"FROM (SELECT * FROM buckets{cursor}) "
        f"ORDER BY {key_list} LIMIT {int(size)}"
    )

# ---------------------------------------------------------------------------
# multi_terms aggregation
# ---------------------------------------------------------------------------


def bm25_multi_terms(
    index: Index, query: str, keys: Sequence[str] = ("lang", "source"),
    k: int = 10,
) -> DataFrame:
    """(*keys, n_docs) — the ES ``multi_terms`` agg: buckets keyed by a
    COMPOUND key tuple, ordered by doc_count desc (the terms-agg order,
    contrast composite's key-tuple order), key-tuple asc tiebreak,
    top-k. Only tuples that occur in the kept set appear (terms-agg
    semantics).

    Scale: one map-side-combinable groupBy on the kept set + a
    TakeOrdered k-cut — page-deep bucket spaces belong to
    ``bm25_composite_agg`` (keyset pagination); multi_terms is the
    head-of-distribution view."""
    spark = index.spark
    keys = list(keys)
    if not keys:
        raise ValueError("multi_terms aggregation requires at least one key")
    for c in keys:
        _check_name(c, "column name")
    if not tokenize(query):
        kts = ", ".join(
            f"{c} {index.docs.schema[c].dataType.simpleString()}" for c in keys
        )
        return spark.createDataFrame([], kts + ", n_docs long")
    kept = _kept_with_cols(index, query, keys)
    return (
        kept.groupBy(*keys)
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), *[F.asc(c) for c in keys])
        .limit(int(k))
    )


def bm25_multi_terms_sql(
    query: str, keys: Sequence[str] = ("lang", "source"), k: int = 10
) -> str:
    """DuckDB mirror of bm25_multi_terms: the shared kept chain grouped
    by the compound key, ordered (n_docs desc, keys asc) — a total
    order, so the LIMIT boundary is deterministic on both engines."""
    from ..functions.sql_oracle import kept_cte_sql

    keys = list(keys)
    if not keys:
        raise ValueError("multi_terms aggregation requires at least one key")
    for c in keys:
        _check_name(c, "column name")
    chain = kept_cte_sql(query, keys, with_score=False)
    if chain is None:
        return (
            "SELECT "
            + ", ".join(f"'' AS {c}" for c in keys)
            + ", 1::BIGINT AS n_docs WHERE false"
        )
    key_list = ", ".join(keys)
    order_keys = ", ".join(f"{c} ASC" for c in keys)
    return (
        f"{chain} "
        f"SELECT {key_list}, CAST(count(*) AS BIGINT) AS n_docs FROM kept "
        f"GROUP BY {key_list} ORDER BY n_docs DESC, {order_keys} LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# adjacency_matrix aggregation
# ---------------------------------------------------------------------------


def bm25_adjacency_matrix(
    index: Index, query: str, filters: Dict[str, Tuple[str, str]]
) -> DataFrame:
    """(key, n_docs) — the ES ``adjacency_matrix`` agg: for named
    equality predicates, one bucket per filter name plus one per pair
    ``a&b`` (names joined in sorted order, the ES convention) counting
    kept docs matching BOTH. Empty buckets are OMITTED (ES semantics —
    contrast filters_agg's always-present buckets); rows order by key.

    Scale: the names + pairs reduce in ONE conditional-agg pass over
    the kept set (a single 1-row agg job; the bucket fan-out is a
    driver-side stack over that row). ES caps the filter count for the
    same n + n*(n-1)/2 reason — enforced here at 8."""
    spark = index.spark
    items = sorted(filters.items())
    if not items:
        raise ValueError("adjacency_matrix requires at least one filter")
    if len(items) > 8:
        raise ValueError("adjacency_matrix supports at most 8 filters")
    for name, (col, val) in items:
        _check_name(name, "filter name")
        _check_name(col, "column name")
        _check_value(val)
    if not tokenize(query):
        return spark.createDataFrame([], "key string, n_docs long")
    cols = list(dict.fromkeys(c for _, (c, _) in items))
    kept = _kept_with_cols(index, query, cols)
    preds = {
        name: (F.col(col) == F.lit(val)) for name, (col, val) in items
    }
    buckets: List[Tuple[str, object]] = [(n, preds[n]) for n, _ in items]
    names = [n for n, _ in items]
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            buckets.append(
                (f"{names[i]}&{names[j]}", preds[names[i]] & preds[names[j]])
            )
    aggs = [
        F.sum(F.when(p, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias(f"n_{i}")
        for i, (_k, p) in enumerate(buckets)
    ]
    row = kept.agg(*aggs)
    stack_items = ", ".join(
        f"'{name}', n_{i}" for i, (name, _p) in enumerate(buckets)
    )
    return (
        row.selectExpr(
            f"stack({len(buckets)}, {stack_items}) AS (key, n_docs)"
        )
        .where(F.col("n_docs") > 0)
        .orderBy("key")
    )


def bm25_adjacency_matrix_sql(
    query: str, filters: Dict[str, Tuple[str, str]]
) -> str:
    """DuckDB mirror of bm25_adjacency_matrix: the shared kept chain
    reduced by one FILTER-ed count per name/pair, unpivoted via UNION
    ALL, empty buckets dropped."""
    from ..functions.sql_oracle import kept_cte_sql

    items = sorted(filters.items())
    if not items:
        raise ValueError("adjacency_matrix requires at least one filter")
    if len(items) > 8:
        raise ValueError("adjacency_matrix supports at most 8 filters")
    for name, (col, val) in items:
        _check_name(name, "filter name")
        _check_name(col, "column name")
        _check_value(val)
    chain = kept_cte_sql(query, list(dict.fromkeys(c for _, (c, _) in items)),
                         with_score=False)
    if chain is None:
        return "SELECT '' AS key, 1::BIGINT AS n_docs WHERE false"
    preds = {name: f"{col} = '{val}'" for name, (col, val) in items}
    buckets = [(n, preds[n]) for n, _ in items]
    names = [n for n, _ in items]
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            buckets.append(
                (f"{names[i]}&{names[j]}",
                 f"({preds[names[i]]}) AND ({preds[names[j]]})")
            )
    selects = [
        f"SELECT '{name}' AS key, "
        f"CAST(count(*) FILTER (WHERE {pred}) AS BIGINT) AS n_docs FROM kept"
        for name, pred in buckets
    ]
    union = " UNION ALL ".join(selects)
    return (
        f"{chain} SELECT * FROM ({union}) WHERE n_docs > 0 ORDER BY key"
    )


# ---------------------------------------------------------------------------
# weighted_avg aggregation
# ---------------------------------------------------------------------------


def bm25_weighted_avg(index: Index, query: str) -> DataFrame:
    """1 row (n_docs, sum_w, sum_wx, wavg) — the ES ``weighted_avg``
    agg over the BM25 kept set: doc_len (value) weighted by the doc's
    DISTINCT-term count (weight) — average length weighted toward
    lexically diverse documents. The moments sum(w) and sum(w*x) are
    EXACT integers (tf is unique per (term, doc_id) — fsck-verified —
    so count(*) per doc_id IS the distinct-term count); the single
    float division CAST(sum_wx AS DOUBLE) * 1.0 / sum_w is the house
    avg idiom both engines execute identically.

    Scale: the weight relation is one map-side-combinable groupBy of tf
    semi-joined against the kept doc ids (candidate-bounded in the
    healthy regime), then a 1-row agg."""
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [], "n_docs long, sum_w long, sum_wx long, wavg double"
        )
    kept = _kept_with_cols(index, query, ["doc_len"])
    uniq = (
        index.tf.join(kept.select("doc_id"), "doc_id", "leftsemi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("w"))
    )
    j = kept.join(uniq, "doc_id", "left").withColumn(
        "w", F.coalesce(F.col("w"), F.lit(0).cast("long"))
    )
    one = j.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("sum_w"),
        F.sum(F.col("w") * F.col("doc_len").cast("long"))
        .cast("long")
        .alias("sum_wx"),
    )
    wavg = F.col("sum_wx").cast("double") * F.lit(1.0) / F.col("sum_w")
    return one.select("n_docs", "sum_w", "sum_wx", round6(wavg).alias("wavg"))


def bm25_weighted_avg_sql(query: str) -> str:
    """DuckDB mirror of bm25_weighted_avg: identical integer moments
    (the uniq relation recounts tf per doc) and the identical division
    operand sequence."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import kept_cte_sql

    chain = kept_cte_sql(query, ["doc_len"], with_score=False)
    if chain is None:
        return (
            "SELECT 1::BIGINT AS n_docs, 1::BIGINT AS sum_w, "
            "1::BIGINT AS sum_wx, 0.0 AS wavg WHERE false"
        )
    return (
        f"{chain}, "
        "uniq AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS w FROM tf "
        "  WHERE doc_id IN (SELECT doc_id FROM kept) GROUP BY doc_id), "
        "one AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        "  CAST(sum(coalesce(u.w, 0)) AS BIGINT) AS sum_w, "
        "  CAST(sum(coalesce(u.w, 0) * CAST(k.doc_len AS BIGINT)) AS BIGINT) AS sum_wx "
        "  FROM kept k LEFT JOIN uniq u USING (doc_id)) "
        "SELECT n_docs, sum_w, sum_wx, "
        f"{round6_sql('CAST(sum_wx AS DOUBLE) * 1.0 / sum_w')} AS wavg FROM one"
    )


# ---------------------------------------------------------------------------
# matrix_stats aggregation
# ---------------------------------------------------------------------------


def bm25_matrix_stats(index: Index, query: str) -> DataFrame:
    """1 row (n_docs, mean_x, mean_y, var_x, var_y, cov_xy, corr) — the
    ES ``matrix_stats`` agg over the BM25 kept set, for the field pair
    x = doc_len, y = distinct-term count (lexical diversity): exact
    integer moments (n, sx, sy, sxx, syy, sxy) reduced in ONE agg pass,
    then a fixed float tail — mean = CAST(s AS DOUBLE) * 1.0 / n,
    population variance = sq * 1.0 / n - mean * mean, covariance =
    sxy * 1.0 / n - mean_x * mean_y, correlation = cov /
    sqrt(var_x * var_y) — the identical operand sequence on both
    engines (sqrt is IEEE-correctly-rounded, the extended_stats
    precedent). A constant field (zero variance) yields a NULL/NaN
    correlation on both engines; the gate corpus is non-constant."""
    spark = index.spark
    if not tokenize(query):
        return spark.createDataFrame(
            [],
            "n_docs long, mean_x double, mean_y double, var_x double, "
            "var_y double, cov_xy double, corr double",
        )
    kept = _kept_with_cols(index, query, ["doc_len"])
    uniq = (
        index.tf.join(kept.select("doc_id"), "doc_id", "leftsemi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("w"))
    )
    j = kept.join(uniq, "doc_id", "left").select(
        F.col("doc_len").cast("long").alias("x"),
        F.coalesce(F.col("w"), F.lit(0).cast("long")).alias("y"),
    )
    one = j.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    mean_x = F.col("sx").cast("double") * F.lit(1.0) / F.col("n_docs")
    mean_y = F.col("sy").cast("double") * F.lit(1.0) / F.col("n_docs")
    var_x = (
        F.col("sxx").cast("double") * F.lit(1.0) / F.col("n_docs")
        - mean_x * mean_x
    )
    var_y = (
        F.col("syy").cast("double") * F.lit(1.0) / F.col("n_docs")
        - mean_y * mean_y
    )
    cov = (
        F.col("sxy").cast("double") * F.lit(1.0) / F.col("n_docs")
        - mean_x * mean_y
    )
    corr = cov / F.sqrt(var_x * var_y)
    return one.select(
        "n_docs",
        round6(mean_x).alias("mean_x"),
        round6(mean_y).alias("mean_y"),
        round6(var_x).alias("var_x"),
        round6(var_y).alias("var_y"),
        round6(cov).alias("cov_xy"),
        round6(corr).alias("corr"),
    )


def bm25_matrix_stats_sql(query: str) -> str:
    """DuckDB mirror of bm25_matrix_stats: identical integer moments
    and the identical float tail operand sequence."""
    from ..functions.rounding import round6_sql
    from ..functions.sql_oracle import kept_cte_sql

    chain = kept_cte_sql(query, ["doc_len"], with_score=False)
    if chain is None:
        return (
            "SELECT 1::BIGINT AS n_docs, 0.0 AS mean_x, 0.0 AS mean_y, "
            "0.0 AS var_x, 0.0 AS var_y, 0.0 AS cov_xy, 0.0 AS corr "
            "WHERE false"
        )
    mx = "(CAST(sx AS DOUBLE) * 1.0 / n_docs)"
    my = "(CAST(sy AS DOUBLE) * 1.0 / n_docs)"
    vx = f"(CAST(sxx AS DOUBLE) * 1.0 / n_docs - {mx} * {mx})"
    vy = f"(CAST(syy AS DOUBLE) * 1.0 / n_docs - {my} * {my})"
    cv = f"(CAST(sxy AS DOUBLE) * 1.0 / n_docs - {mx} * {my})"
    return (
        f"{chain}, "
        "uniq AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS w FROM tf "
        "  WHERE doc_id IN (SELECT doc_id FROM kept) GROUP BY doc_id), "
        "xy AS (SELECT CAST(k.doc_len AS BIGINT) AS x, "
        "  coalesce(u.w, 0) AS y FROM kept k LEFT JOIN uniq u USING (doc_id)), "
        "one AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        "  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, "
        "  CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy, "
        "  CAST(sum(x * y) AS BIGINT) AS sxy FROM xy) "
        "SELECT n_docs, "
        f"{round6_sql(mx)} AS mean_x, {round6_sql(my)} AS mean_y, "
        f"{round6_sql(vx)} AS var_x, {round6_sql(vy)} AS var_y, "
        f"{round6_sql(cv)} AS cov_xy, "
        f"{round6_sql(f'{cv} / sqrt({vx} * {vy})')} AS corr FROM one"
    )


# ---------------------------------------------------------------------------
# boxplot aggregation (exact type-1 quantiles)
# ---------------------------------------------------------------------------


def bm25_boxplot(index: Index, query: str, col: str = "doc_len") -> DataFrame:
    """(stat, value) — the ES ``boxplot`` agg of an integer docs column
    over the BM25 kept set, EXACT: min / q1 / q2 / q3 / max where the
    quartiles are type-1 (lower) quantiles — value at rank ceil(q*n) of
    the sorted column. ES's boxplot is TDigest-approximate; the exact
    type-1 choice keeps every output an integer actually present in
    the data and the cross-engine surface float-free (ranks are pure
    integer arithmetic: ceil(n/4) = (n+3) DIV 4 etc.).

    Scale: the rank lookup runs over the GROUPED value distribution —
    one map-side-combinable count per distinct value, a cumulative
    window over the value space (bounded by the column's cardinality,
    not the corpus — the calendar-bounded pipeline-aggs precedent),
    and one conditional-min agg. No corpus-wide sort anywhere."""
    spark = index.spark
    _check_name(col, "column name")
    if not tokenize(query):
        return spark.createDataFrame([], "stat string, value long")
    kept = _kept_with_cols(index, query, [col])
    grouped = kept.groupBy(F.col(col).cast("long").alias("v")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = grouped.withColumn("cum", F.sum("cnt").over(w))
    n1 = cum.agg(F.sum("cnt").cast("long").alias("n"))
    j = cum.crossJoin(F.broadcast(n1))
    # type-1 quantile: min v with cum >= ceil(q*n); ceil via integer DIV
    ranks = {
        "min": "1",
        "q1": "(n + 3) DIV 4",
        "q2": "(n + 1) DIV 2",
        "q3": "(3 * n + 3) DIV 4",
        "max": "n",
    }
    aggs = [
        F.min(F.when(F.col("cum") >= F.expr(expr), F.col("v")))
        .cast("long")
        .alias(f"v_{name}")
        for name, expr in ranks.items()
    ]
    row = j.agg(*aggs)
    stack_items = ", ".join(f"'{name}', v_{name}" for name in ranks)
    return row.selectExpr(
        f"stack({len(ranks)}, {stack_items}) AS (stat, value)"
    ).orderBy("stat")


def bm25_boxplot_sql(query: str, col: str = "doc_len") -> str:
    """DuckDB mirror of bm25_boxplot: identical grouped cumulative
    distribution and the identical integer rank arithmetic (DuckDB's
    // is the DIV analog for positive integers)."""
    from ..functions.sql_oracle import kept_cte_sql

    _check_name(col, "column name")
    chain = kept_cte_sql(query, [col], with_score=False)
    if chain is None:
        return "SELECT '' AS stat, 1::BIGINT AS value WHERE false"
    ranks = {
        "min": "1",
        "q1": "(n + 3) // 4",
        "q2": "(n + 1) // 2",
        "q3": "(3 * n + 3) // 4",
        "max": "n",
    }
    selects = [
        f"SELECT '{name}' AS stat, CAST(min(v) FILTER (WHERE cum >= "
        f"(SELECT {expr} FROM nrow)) AS BIGINT) AS value FROM cdist"
        for name, expr in ranks.items()
    ]
    union = " UNION ALL ".join(selects)
    return (
        f"{chain}, "
        f"grouped AS (SELECT CAST({col} AS BIGINT) AS v, "
        "  CAST(count(*) AS BIGINT) AS cnt FROM kept GROUP BY 1), "
        "cdist AS (SELECT v, sum(cnt) OVER (ORDER BY v "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
        "  FROM grouped), "
        "nrow AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM grouped) "
        f"SELECT * FROM ({union}) ORDER BY stat"
    )


# ---------------------------------------------------------------------------
# t_test aggregation (Welch's unpaired two-sample t)
# ---------------------------------------------------------------------------


def t_test_docs(
    docs: DataFrame,
    col: str = "n_chars",
    group_col: str = "lang",
    a: str = "en",
    b: str = "de",
) -> DataFrame:
    """1 row (n_a, n_b, mean_a, mean_b, t_stat, df) — the ES ``t_test``
    agg (heteroscedastic / Welch's unpaired variant, the ES default)
    between two equality buckets of a numeric docs column: is the
    column's mean different between the groups?

    ES returns the p-value; the engine returns the t statistic and the
    Welch–Satterthwaite degrees of freedom instead — the p-value needs
    the regularized incomplete beta, which neither engine evaluates
    with a portable bit-identical lane, while t and df are a fixed
    float tail over exact integer moments (the matrix_stats contract):
    mean = CAST(s AS DOUBLE) * 1.0 / n, sample variance s2 =
    (CAST(sq AS DOUBLE) - mean * CAST(s AS DOUBLE)) * 1.0 / (n - 1),
    se2 = s2a/na + s2b/nb, t = (mean_a - mean_b) / sqrt(se2),
    df = se2^2 / ((s2a/na)^2/(na-1) + (s2b/nb)^2/(nb-1)) — the
    identical operand sequence on both engines. Groups need n >= 2
    (sample variance); smaller groups raise rather than divide by 0.

    Scale shape: ONE conditional-agg pass over the group-pruned scan
    (both equality predicates reach the parquet scan as pushed
    filters); six integer moments cross the exchange, nothing else.
    """
    _check_name(col, "column name")
    _check_name(group_col, "column name")
    g = F.col(group_col)
    x = F.col(col).cast("long")
    one = docs.where(g.isin([a, b])).agg(
        F.count(F.when(g == a, 1)).cast("long").alias("na"),
        F.count(F.when(g == b, 1)).cast("long").alias("nb"),
        F.coalesce(F.sum(F.when(g == a, x)), F.lit(0)).cast("long").alias("sa"),
        F.coalesce(F.sum(F.when(g == b, x)), F.lit(0)).cast("long").alias("sb"),
        F.coalesce(F.sum(F.when(g == a, x * x)), F.lit(0)).cast("long").alias("qa"),
        F.coalesce(F.sum(F.when(g == b, x * x)), F.lit(0)).cast("long").alias("qb"),
    )
    row = one.first()
    if int(row["na"]) < 2 or int(row["nb"]) < 2:
        raise ValueError(
            f"t_test needs n >= 2 per group: n_a={row['na']}, n_b={row['nb']}"
        )
    ma = F.col("sa").cast("double") * F.lit(1.0) / F.col("na")
    mb = F.col("sb").cast("double") * F.lit(1.0) / F.col("nb")
    s2a = (
        (F.col("qa").cast("double") - ma * F.col("sa").cast("double"))
        * F.lit(1.0) / (F.col("na") - F.lit(1))
    )
    s2b = (
        (F.col("qb").cast("double") - mb * F.col("sb").cast("double"))
        * F.lit(1.0) / (F.col("nb") - F.lit(1))
    )
    va = s2a * F.lit(1.0) / F.col("na")
    vb = s2b * F.lit(1.0) / F.col("nb")
    se2 = va + vb
    t = (ma - mb) / F.sqrt(se2)
    df = (se2 * se2) / (
        va * va / (F.col("na") - F.lit(1)) + vb * vb / (F.col("nb") - F.lit(1))
    )
    return one.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        round6(ma).alias("mean_a"),
        round6(mb).alias("mean_b"),
        round6(t).alias("t_stat"),
        round6(df).alias("df"),
    )


def t_test_docs_sql(
    col: str = "n_chars",
    group_col: str = "lang",
    a: str = "en",
    b: str = "de",
) -> str:
    """DuckDB mirror of t_test_docs: identical integer moments and the
    identical Welch float tail."""
    from ..functions.rounding import round6_sql

    _check_name(col, "column name")
    _check_name(group_col, "column name")
    ea, eb = a.replace("'", "''"), b.replace("'", "''")
    ma = "(CAST(sa AS DOUBLE) * 1.0 / na)"
    mb = "(CAST(sb AS DOUBLE) * 1.0 / nb)"
    s2a = f"((CAST(qa AS DOUBLE) - {ma} * CAST(sa AS DOUBLE)) * 1.0 / (na - 1))"
    s2b = f"((CAST(qb AS DOUBLE) - {mb} * CAST(sb AS DOUBLE)) * 1.0 / (nb - 1))"
    va = f"({s2a} * 1.0 / na)"
    vb = f"({s2b} * 1.0 / nb)"
    se2 = f"({va} + {vb})"
    t = f"(({ma} - {mb}) / sqrt({se2}))"
    df = f"(({se2} * {se2}) / ({va} * {va} / (na - 1) + {vb} * {vb} / (nb - 1)))"
    return (
        "WITH one AS (SELECT "
        f"CAST(count(*) FILTER (WHERE {group_col} = '{ea}') AS BIGINT) AS na, "
        f"CAST(count(*) FILTER (WHERE {group_col} = '{eb}') AS BIGINT) AS nb, "
        f"CAST(coalesce(sum(CAST({col} AS BIGINT)) FILTER (WHERE {group_col} = '{ea}'), 0) AS BIGINT) AS sa, "
        f"CAST(coalesce(sum(CAST({col} AS BIGINT)) FILTER (WHERE {group_col} = '{eb}'), 0) AS BIGINT) AS sb, "
        f"CAST(coalesce(sum(CAST({col} AS BIGINT) * CAST({col} AS BIGINT)) FILTER (WHERE {group_col} = '{ea}'), 0) AS BIGINT) AS qa, "
        f"CAST(coalesce(sum(CAST({col} AS BIGINT) * CAST({col} AS BIGINT)) FILTER (WHERE {group_col} = '{eb}'), 0) AS BIGINT) AS qb "
        f"FROM documents WHERE {group_col} IN ('{ea}', '{eb}')) "
        "SELECT na AS n_a, nb AS n_b, "
        f"{round6_sql(ma)} AS mean_a, {round6_sql(mb)} AS mean_b, "
        f"{round6_sql(t)} AS t_stat, {round6_sql(df)} AS df FROM one"
    )


# ---------------------------------------------------------------------------
# random_sampler aggregation (ES 8.2 probability sampling)
# ---------------------------------------------------------------------------


def random_sampler_agg(
    docs: DataFrame, probability: float = 0.1, seed: str = "rs1"
) -> DataFrame:
    """(n_sampled, est_total, sum_len_sampled, est_sum_len) — the ES
    ``random_sampler`` aggregation: run the (expensive) child
    aggregation on a probability sample and SCALE the results back by
    1/p — the constant-cost way to aggregate a 10^12-doc corpus.
    Deterministic sampling: doc included iff the md5(seed|doc_id)
    first-8-hex integer < p * 2^32 (the mixture_sample hash-threshold
    lane — an integer comparison, layout-independent, identical on
    both engines). Child agg here: doc count + total token count;
    estimates are the two sampled integers scaled by the exact 1/p
    division once on the 1-row result."""
    p = float(probability)
    if not (0.0 < p <= 1.0):
        raise ValueError(f"probability must be in (0, 1]: {probability!r}")
    thr = int(p * 4294967296.0)
    h = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat(F.lit(f"{seed}|"), F.col("doc_id").cast("string")),
                    "utf-8",
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    toks = F.expr(
        "CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT)"
    )
    s = docs.where(h < F.lit(thr)).agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.sum(toks).cast("long").alias("sum_len_sampled"),
    )
    inv = F.lit(1.0) / F.lit(p)
    return s.select(
        "n_sampled",
        round6(F.col("n_sampled").cast("double") * inv).alias("est_total"),
        F.coalesce("sum_len_sampled", F.lit(0)).cast("long").alias(
            "sum_len_sampled"
        ),
        round6(
            F.coalesce("sum_len_sampled", F.lit(0)).cast("double") * inv
        ).alias("est_sum_len"),
    )


def random_sampler_agg_sql(
    probability: float = 0.1, seed: str = "rs1"
) -> str:
    from ..functions.rounding import round6_sql, sql_double

    p = float(probability)
    if not (0.0 < p <= 1.0):
        raise ValueError(f"probability must be in (0, 1]: {probability!r}")
    thr = int(p * 4294967296.0)
    es = seed.replace("'", "''")
    inv = f"(1.0 / {sql_double(p)})"
    return (
        "WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n_sampled, "
        "CAST(coalesce(sum(len(list_filter(string_split(text, ' '), "
        "x -> x != ''))), 0) AS BIGINT) AS sum_len_sampled "
        "FROM documents WHERE "
        f"('0x' || substr(md5('{es}|' || doc_id::VARCHAR), 1, 8))::BIGINT < {thr}) "
        "SELECT n_sampled, "
        f"{round6_sql(f'CAST(n_sampled AS DOUBLE) * {inv}')} AS est_total, "
        "sum_len_sampled, "
        f"{round6_sql(f'CAST(sum_len_sampled AS DOUBLE) * {inv}')} AS est_sum_len "
        "FROM s"
    )
