"""Corpus-curation operators for a training-data pipeline:
benchmark decontamination, deterministic mixture sampling, sequence
packing, PII scrubbing, token-window chunking, chunk-level semantic
search, and the composed curation funnel (``curate_corpus``).

Like the rest of the training-data suite (textstats/dedup), every
operator has a Spark implementation and a colocated DuckDB SQL builder
mirroring it operand-for-operand for the driver's side-by-side gate,
and everything stays in JVM column expressions — no Python UDFs, with
one justified exception: ``normalize_text``'s NFC step has no JVM
built-in, so its whole cleanup chain runs in a single Arrow-batched
pandas UDF (the same budget class as the extract/tokenize hot path).

Scale shapes (the 100 TB story for each):

- ``decontaminate``: the benchmark n-gram set is *intrinsically small*
  (an eval suite, not a corpus), so the plan is a map-side gram
  generation + broadcast semi-join + one per-doc count shuffle. The
  corpus side never shuffles its grams. For the self-contained gate the
  benchmark slice is carved deterministically out of the corpus itself
  (``doc_id % bench_mod == 0``) — at production scale you'd pass the
  eval-suite table as ``bench_docs``.
- ``mixture_sample``: hash-threshold Bernoulli sampling per stratum is
  a pure per-row filter — ZERO shuffles to materialize the sample at
  any scale (the summary is one small groupBy). This is why the quota
  is expressed as a rate, not an exact count: an exact per-stratum
  count needs a global rank (a sort) that a rate does not.
- ``pack_sequences``: the classic two-level cumulative sum. Per-range
  partial sums shuffle once on ``range_id``; the range-level prefix sum
  runs over ``n_docs / range_width`` rows (thousands, not billions) in
  a single tiny window; per-doc offsets then compose range offset +
  within-range window cumsum, which parallelizes per range. A naive
  global ``Window.orderBy(doc_id)`` cumsum would serialize the corpus
  through one task — the composed form is numerically identical.
- ``pii_scrub``: per-row regexp counts/replacements, embarrassingly
  parallel. The corpus itself is synthetic word-soup with no PII, so
  the gate entry augments each row with deterministic doc_id-derived
  PII (identically on both engines) — the redaction is exercised on
  every row, not vacuously green.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import round6, round6_sql, sql_double

# ---------------------------------------------------------------------------
# benchmark decontamination


def _gram_expr(n: int) -> str:
    gram = " || ' ' || ".join(f"tokens[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN size(tokens) >= {n} THEN "
        f"transform(sequence(0, size(tokens) - {n}), i -> {gram}) "
        "ELSE array() END"
    )


def decontaminate(
    docs: DataFrame,
    n: int = 8,
    bench_mod: int = 7,
    bench_docs: Optional[DataFrame] = None,
) -> DataFrame:
    """(doc_id, n_hit_grams) — candidate documents sharing at least one
    token ``n``-gram with the benchmark set, with the count of distinct
    overlapping grams; the training-data decontamination filter (flag /
    drop documents that would leak eval data into the train set).

    ``bench_docs`` (doc_id, tokens) is the eval suite; when None, the
    deterministic corpus slice ``doc_id % bench_mod == 0`` stands in for
    it and those rows are excluded from the candidate side.
    """
    grams = docs.select(
        "doc_id", F.explode(F.expr(_gram_expr(n))).alias("gram")
    )
    if bench_docs is None:
        bench = grams.filter(F.col("doc_id") % bench_mod == 0)
        cand = grams.filter(F.col("doc_id") % bench_mod != 0)
    else:
        bench = bench_docs.select(
            "doc_id", F.explode(F.expr(_gram_expr(n))).alias("gram")
        )
        cand = grams
    bench_set = bench.select("gram").distinct()
    hits = (
        cand.select("doc_id", "gram")
        .distinct()
        .join(F.broadcast(bench_set), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hit_grams"))
    )
    return hits.orderBy("doc_id")


def decontaminate_sql(table_toks_cte: str, n: int = 8, bench_mod: int = 7) -> str:
    gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return (
        f"WITH {table_toks_cte}, "
        f"g AS (SELECT doc_id, {gram} AS gram FROM docs, "
        f"unnest(generate_series(1, len(toks) - {n - 1})) AS _t(i)), "
        f"bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {bench_mod} = 0), "
        f"cand AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % {bench_mod} <> 0) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams "
        "FROM cand JOIN bench USING (gram) GROUP BY doc_id ORDER BY doc_id"
    )


def split_leakage(docs: DataFrame, n: int = 8) -> DataFrame:
    """(split, n_docs, n_leaked, leak_frac) — the train/holdout leakage
    audit: for each non-train split of the deterministic dataset split
    (``split_label_col``), how many of its documents share at least one
    token ``n``-gram with the TRAIN split. The cross-check a pipeline
    runs after export: near-duplicate pages straddling the split are
    exactly how eval numbers get silently inflated, and the hash split
    alone cannot see content-level leakage.

    Scale shape: one gram explode, train grams distinct into the join's
    build side, candidate (doc, gram) distinct semi-joined against it
    — the decontaminate skeleton keyed by the split label instead of
    the bench slice; the summary is a 2-row rollup."""
    d = docs.withColumn("split", split_label_col())
    grams = d.select(
        "doc_id", "split", F.explode(F.expr(_gram_expr(n))).alias("gram")
    )
    train_set = grams.where(F.col("split") == "train").select("gram").distinct()
    holdout = grams.where(F.col("split") != "train")
    leaked = (
        holdout.select("doc_id", "split", "gram")
        .join(train_set, "gram", "left_semi")
        .select("doc_id", "split")
        .distinct()
        .groupBy("split")
        .agg(F.count("*").cast("long").alias("n_leaked"))
    )
    totals = (
        d.where(F.col("split") != "train")
        .groupBy("split")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    return (
        totals.join(leaked, "split", "left")
        .select(
            "split",
            "n_docs",
            F.coalesce(F.col("n_leaked"), F.lit(0)).cast("long").alias("n_leaked"),
            round6(
                F.coalesce(F.col("n_leaked"), F.lit(0)) * F.lit(1.0) / F.col("n_docs")
            ).alias("leak_frac"),
        )
        .orderBy("split")
    )


def split_leakage_sql(table_toks_cte: str, n: int = 8) -> str:
    # the split CASE inline, same literals as dataset_split_sql
    buckets = _MIX_BUCKETS
    bucket = (
        f"('0x' || substr(md5('{_SPLIT_SALT}|' || doc_id::VARCHAR), 1, 8))::BIGINT "
        f"% {buckets}"
    )
    whens = []
    cum = 0.0
    for name, w in _SPLIT_WEIGHTS:
        cum += float(w)
        whens.append(f"WHEN {bucket} < {sql_double(cum * buckets)} THEN '{name}'")
    case = "CASE " + " ".join(whens) + " ELSE 'test' END"
    gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return (
        f"WITH {table_toks_cte}, "
        f"s AS (SELECT doc_id, {case} AS split, toks FROM docs), "
        f"g AS (SELECT doc_id, split, {gram} AS gram FROM s, "
        f"unnest(generate_series(1, len(toks) - {n - 1})) AS _t(i)), "
        "tr AS (SELECT DISTINCT gram FROM g WHERE split = 'train'), "
        "lk AS (SELECT split, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_leaked "
        "FROM g JOIN tr USING (gram) WHERE split <> 'train' GROUP BY split), "
        "tot AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs FROM s "
        "WHERE split <> 'train' GROUP BY split) "
        "SELECT tot.split, tot.n_docs, "
        "CAST(coalesce(lk.n_leaked, 0) AS BIGINT) AS n_leaked, "
        f"{round6_sql('coalesce(lk.n_leaked, 0) * 1.0 / tot.n_docs')} AS leak_frac "
        "FROM tot LEFT JOIN lk USING (split) ORDER BY tot.split"
    )


# ---------------------------------------------------------------------------
# deterministic mixture sampling

# target per-language sampling rates for the train-mix (basis points of
# the md5 bucket space so both engines compare integers, not floats)
MIXTURE_RATES: Dict[str, float] = {
    "en": 1.0,
    "de": 0.6,
    "fr": 0.6,
    "es": 0.25,
    "zh": 0.25,
}
_MIX_DEFAULT_RATE = 0.1
_MIX_BUCKETS = 10000


def _rate_case(col: str = "lang") -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in sorted(MIXTURE_RATES.items())
    )
    return f"CASE {col} {whens} ELSE {_MIX_DEFAULT_RATE} END"


def mixture_keep_col() -> F.Column:
    """Boolean keep-decision per row: md5(doc_id) bucket under the
    stratum's rate threshold — deterministic, shuffle-free, and
    portable (same md5-hex-prefix trick as the minhash/simhash ops,
    dedup.py)."""
    bucket = (
        F.conv(
            F.substring(F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8")), 1, 8),
            16,
            10,
        ).cast("long")
        % _MIX_BUCKETS
    )
    return bucket < (F.expr(_rate_case()) * _MIX_BUCKETS)


def mixture_sample(documents: DataFrame) -> DataFrame:
    """(lang, n_total, n_kept, kept_frac, target_rate) — per-stratum
    summary of the deterministic hash-threshold sample that shapes the
    corpus toward the ``MIXTURE_RATES`` language mix."""
    d = documents.withColumn("keep", mixture_keep_col())
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept"),
        )
        .select(
            "lang",
            "n_total",
            "n_kept",
            round6(F.col("n_kept") / F.col("n_total")).alias("kept_frac"),
            # cast the DECIMAL rate literal to double so both engines
            # round the same IEEE value (DuckDB's CASE is DECIMAL too)
            round6(F.expr(_rate_case()).cast("double")).alias("target_rate"),
        )
        .orderBy("lang")
    )


def mixture_sample_sql(table: str = "documents") -> str:
    bucket = f"('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % {_MIX_BUCKETS}"
    return (
        f"WITH k AS (SELECT lang, "
        f"CASE WHEN {bucket} < {_rate_case()} * {_MIX_BUCKETS} THEN 1 ELSE 0 END AS keep "
        f"FROM {table}) "
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_total, "
        "CAST(sum(keep) AS BIGINT) AS n_kept, "
        f"{round6_sql('sum(keep) * 1.0 / count(*)')} AS kept_frac, "
        f"{round6_sql(f'CAST({_rate_case()} AS DOUBLE)')} AS target_rate "
        "FROM k GROUP BY lang ORDER BY lang"
    )


# ---------------------------------------------------------------------------
# train/val/test split

_SPLIT_WEIGHTS = (("train", 0.9), ("val", 0.05))  # remainder -> test
_SPLIT_SALT = "split"


def split_label_col(
    weights=_SPLIT_WEIGHTS, salt: str = _SPLIT_SALT, buckets: int = _MIX_BUCKETS
) -> F.Column:
    """Deterministic dataset-split label per row: the md5 bucket of
    ``salt|doc_id`` against cumulative weight thresholds. Salted so the
    split hash is INDEPENDENT of the mixture-sampling hash (an unsalted
    doc_id hash would make 'val' a biased slice of the sampled corpus);
    zero-shuffle, stable across runs and cluster sizes, and a doc can
    never change split when the corpus grows — the holdout stays
    holdout (the leakage property train/test contamination checks
    assume)."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat(
                            F.lit(salt + "|"), F.col("doc_id").cast("string")
                        ),
                        "utf-8",
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % buckets
    )
    expr = None
    cum = 0.0
    for name, w in weights:
        cum += float(w)
        cond = bucket < F.lit(cum * buckets)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise("test")


def dataset_split(documents: DataFrame) -> DataFrame:
    """(lang, split, n_docs, frac) — per-stratum summary of the
    deterministic split (frac within the language)."""
    d = documents.withColumn("split", split_label_col())
    counts = d.groupBy("lang", "split").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return (
        counts.withColumn("_tot", F.sum("n_docs").over(w))
        .select(
            "lang",
            "split",
            "n_docs",
            round6(F.col("n_docs") * F.lit(1.0) / F.col("_tot")).alias("frac"),
        )
        .orderBy("lang", "split")
    )


def dataset_split_sql(table: str = "documents") -> str:
    buckets = _MIX_BUCKETS
    bucket = (
        f"('0x' || substr(md5('{_SPLIT_SALT}|' || doc_id::VARCHAR), 1, 8))::BIGINT "
        f"% {buckets}"
    )
    whens = []
    cum = 0.0
    for name, w in _SPLIT_WEIGHTS:
        cum += float(w)
        whens.append(f"WHEN {bucket} < {sql_double(cum * buckets)} THEN '{name}'")
    case = "CASE " + " ".join(whens) + " ELSE 'test' END"
    return (
        f"WITH s AS (SELECT lang, {case} AS split FROM {table}), "
        "c AS (SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM s GROUP BY lang, split) "
        "SELECT lang, split, n_docs, "
        f"{round6_sql('n_docs * 1.0 / sum(n_docs) OVER (PARTITION BY lang)')} AS frac "
        "FROM c ORDER BY lang, split"
    )


# ---------------------------------------------------------------------------
# sequence packing

_PACK_RANGE_WIDTH = 1 << 20


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    carry: tuple = (),
    materialize: bool = True,
    range_width: int = _PACK_RANGE_WIDTH,
) -> DataFrame:
    """(doc_id, *carry, n_tokens, start_offset, bin_id) — contiguous
    token-budget packing plan: documents in doc_id order are laid into
    fixed-size training windows of ``budget`` tokens; ``bin_id`` is the
    window the document STARTS in (documents may straddle a boundary —
    the packing plan records offsets, the batch writer slices).
    ``carry`` names passthrough columns (e.g. lang for a downstream
    mixture report) so callers don't need a re-join on doc_id.

    Two-level cumulative sum (see module docstring): within-range window
    cumsum + broadcast range-offset join, identical to the oracle's
    global prefix sum. The cumsum necessarily references its input twice
    (per-doc rows AND per-range totals) — without a lineage cut Spark
    recomputes the whole upstream subtree per reference (for
    ``curate_corpus`` that would tokenize the corpus twice), so the slim
    (doc_id, carry, n_tokens) projection is lazily localCheckpoint-ed
    first: the upstream plan runs once, both references read the
    materialized rows. ``materialize=False`` opts out for composition
    into a caller that manages its own persistence.

    ``range_width`` bounds BOTH window levels: within-range windows hold
    at most ``range_width`` rows (parallel across ranges) and the
    range-offset window holds ``max_doc_id / range_width`` rows in one
    tiny task. Size it near sqrt(max_doc_id) for the design point — the
    2^20 default keeps the offset window at ~10^6 rows for a 10^12-doc
    corpus while each range stays a bounded in-memory window. The
    decomposition is offset-invariant, so any width yields identical
    output (regression-tested across a range boundary).
    """
    d = docs.select("doc_id", *carry, F.size("tokens").cast("long").alias("n_tokens"))
    if materialize:
        d = d.localCheckpoint(eager=False)
    d = d.withColumn("range_id", F.expr(f"doc_id DIV {range_width}"))
    w_in = (
        Window.partitionBy("range_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    totals = d.groupBy("range_id").agg(F.sum("n_tokens").alias("range_total"))
    w_r = Window.orderBy("range_id").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "range_id",
        F.coalesce(F.sum("range_total").over(w_r), F.lit(0)).alias("range_offset"),
    )
    out = d.join(F.broadcast(offsets), "range_id").select(
        "doc_id",
        *carry,
        "n_tokens",
        (F.col("range_offset") + F.col("cum_in") - F.col("n_tokens"))
        .cast("long")
        .alias("start_offset"),
    )
    return out.select(
        "doc_id",
        *carry,
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset DIV {budget}").cast("long").alias("bin_id"),
    ).orderBy("doc_id")


def pack_sequences_sql(table_toks_cte: str, budget: int = 512) -> str:
    return (
        f"WITH {table_toks_cte}, "
        "d AS (SELECT doc_id, len(toks) AS n_tokens FROM docs), "
        "c AS (SELECT doc_id, n_tokens, coalesce(sum(n_tokens) OVER "
        "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS start_offset FROM d) "
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
        "CAST(start_offset AS BIGINT) AS start_offset, "
        f"CAST(start_offset // {budget} AS BIGINT) AS bin_id "
        "FROM c ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# training-data export sink


def export_manifest(
    docs: DataFrame, budget: int = 65536, assignment: Optional[DataFrame] = None
) -> DataFrame:
    """(shard_id, n_docs, n_tokens, min_doc, max_doc, content_md5) —
    the audit manifest of a token-budget sharded export: shard_id is
    the ``pack_sequences`` bin the document STARTS in (contiguous
    doc_id-ordered layout, every shard ~``budget`` tokens), content_md5
    is md5 over the doc_id-ordered concatenation of per-doc text md5s —
    the shard-level integrity line a downstream training job (or a
    re-run) verifies before trusting the files. Deterministic:
    manifest(re-export) == manifest(export) byte-for-byte.

    Scale shape: the assignment reuses pack_sequences' two-level cumsum
    (bounded windows); the rollup is one groupBy(shard) whose hash fold
    holds ~budget/avgdl per-doc digests per shard — bounded by the
    shard size the caller chose, never corpus-wide.

    ``assignment``: a precomputed pack_sequences projection
    (doc_id, n_tokens, bin_id) — export_shards passes its own so the
    two-level cumsum runs once per export, not once per consumer."""
    asg = (
        assignment
        if assignment is not None
        else pack_sequences(docs, budget=budget).select(
            "doc_id", "n_tokens", "bin_id"
        )
    )
    hashes = docs.select(
        "doc_id", F.md5(F.encode(F.col("text"), "utf-8")).alias("h")
    )
    j = asg.join(hashes, "doc_id")
    return (
        j.groupBy(F.col("bin_id").alias("shard_id"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.md5(
                F.encode(
                    F.aggregate(
                        F.array_sort(F.collect_list(F.struct("doc_id", "h"))),
                        F.lit(""),
                        lambda acc, x: F.concat(acc, x["h"]),
                    ),
                    "utf-8",
                )
            ).alias("content_md5"),
        )
        .orderBy("shard_id")
    )


def export_manifest_sql(budget: int = 65536, table: str = "documents") -> str:
    from ..functions.sql_oracle import tokenize_col

    return (
        f"WITH d AS (SELECT doc_id, len({tokenize_col('text')}) AS n_tokens, "
        f"md5(text) AS h FROM {table}), "
        "c AS (SELECT doc_id, n_tokens, h, coalesce(sum(n_tokens) OVER "
        "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS start_offset FROM d) "
        f"SELECT CAST(start_offset // {int(budget)} AS BIGINT) AS shard_id, "
        "CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens, "
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc, "
        "md5(string_agg(h, '' ORDER BY doc_id)) AS content_md5 "
        "FROM c GROUP BY 1 ORDER BY shard_id"
    )


def export_shards(
    docs: DataFrame,
    out_dir: str,
    budget: int = 65536,
    carry: tuple = ("lang", "source"),
) -> dict:
    """Write the corpus as token-budget shards + a JSON manifest.

    Layout: ``{out_dir}/data/shard_id=N/*.parquet`` (one file per
    shard: rows for a shard are clustered into one task by the
    repartition-on-key before the partitionBy writer) and
    ``{out_dir}/manifest.json`` written AFTER the data commits — the
    manifest doubles as the success marker, so a crashed export (data
    present, no manifest) is visibly incomplete and a re-run simply
    overwrites. Returns the manifest as a dict.
    """
    import json
    import os

    keep = [c for c in carry if c in docs.columns]
    # ONE packing plan for both consumers (the shard writer and the
    # manifest rollup) — the lineage cut makes the two-level cumsum run
    # once per export instead of once per consumer
    asg = (
        pack_sequences(docs, budget=budget)
        .select("doc_id", "n_tokens", "bin_id")
        .localCheckpoint(eager=False)
    )
    data = docs.select("doc_id", "text", *keep).join(
        asg.select("doc_id", F.col("bin_id").alias("shard_id")), "doc_id"
    )
    (
        data.repartition(F.col("shard_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(f"{out_dir}/data")
    )
    man_rows = [
        r.asDict()
        for r in export_manifest(docs, budget=budget, assignment=asg).collect()
    ]
    manifest = {"budget": int(budget), "n_shards": len(man_rows), "shards": man_rows}
    tmp = f"{out_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, f"{out_dir}/manifest.json")
    return manifest


# ---------------------------------------------------------------------------
# token-window chunking


def chunk_documents(docs: DataFrame, size: int = 32, overlap: int = 8) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_tokens, chunk_text) — overlapping
    token windows for an embedding pipeline (chunk → embed → ANN index):
    windows of ``size`` tokens every ``size - overlap`` tokens, last
    partial window kept. Pure per-row array expressions (sequence →
    posexplode → slice) — embarrassingly parallel, no shuffle before the
    caller's sink.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    starts = (
        f"CASE WHEN size(tokens) > 0 THEN "
        f"sequence(0, size(tokens) - 1, {stride}) ELSE array() END"
    )
    d = docs.select(
        "doc_id", "tokens", F.posexplode(F.expr(starts)).alias("chunk_id", "start_tok")
    )
    return d.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.expr(f"least({size}, size(tokens) - start_tok)").cast("long").alias("n_tokens"),
        F.expr(f"array_join(slice(tokens, start_tok + 1, {size}), ' ')").alias(
            "chunk_text"
        ),
    ).orderBy("doc_id", "chunk_id")


def chunk_documents_sql(table_toks_cte: str, size: int = 32, overlap: int = 8) -> str:
    stride = size - overlap
    return (
        f"WITH {table_toks_cte} "
        f"SELECT doc_id, CAST((s - 1) // {stride} AS BIGINT) AS chunk_id, "
        "CAST(s - 1 AS BIGINT) AS start_tok, "
        f"CAST(least({size}, len(toks) - s + 1) AS BIGINT) AS n_tokens, "
        f"array_to_string(toks[s:s + {size - 1}], ' ') AS chunk_text "
        f"FROM docs, unnest(generate_series(1, len(toks), {stride})) AS _t(s) "
        "ORDER BY doc_id, chunk_id"
    )


# ---------------------------------------------------------------------------
# chunk-level semantic search (chunk -> hash-embed -> cosine top-k)

_EMBED_LANES = 8  # sha256 = 32 bytes = 8 big-endian uint32 lanes


def _lane_exprs(engine: str, hexcol: str = "h") -> list:
    """The mock embedder's per-lane arithmetic (functions/embed.py
    mock_embed_text: uint32/2^32*2-1 per 4-byte group), written as the
    SAME expression text for both engines modulo the hex-to-int idiom —
    Spark ``conv(_, 16, 10)`` vs DuckDB ``('0x' || _)::BIGINT`` — so the
    doubles agree bit-for-bit."""
    out = []
    for i in range(_EMBED_LANES):
        sub = f"substr({hexcol}, {1 + 8 * i}, 8)"
        num = (
            f"CAST(conv({sub}, 16, 10) AS DOUBLE)"
            if engine == "spark"
            else f"CAST(('0x' || {sub})::BIGINT AS DOUBLE)"
        )
        out.append(f"(({num} / CAST(4294967296 AS DOUBLE)) * 2 - 1)")
    return out


def _q_literals(qvec) -> list:
    return [f"CAST({sql_double(q)} AS DOUBLE)" for q in qvec[:_EMBED_LANES]]


def chunk_semantic_topk(
    docs: DataFrame,
    qvec,
    k: int = 10,
    size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """(rank, doc_id, chunk_id, score) — semantic retrieval at CHUNK
    granularity: overlapping token windows, the deterministic sha256
    mock embedding computed per chunk ENTIRELY in JVM expressions
    (sha2 + base-conv — no Python in the plan at all), cosine against
    the unit query vector, global top-k with (doc_id, chunk_id)
    tiebreak. ``qvec`` is a normalized query embedding
    (functions/embed.mock_embed_text output; only the first 8 lanes are
    nonzero by construction).

    The real-model path swaps the hash-embed projection for
    functions/embed.embed_documents over chunk_text — the chunking,
    scoring, and top-k plan is unchanged.
    """
    lanes = _lane_exprs("spark")
    qs = _q_literals(qvec)
    ch = chunk_documents(docs, size=size, overlap=overlap)
    h = ch.select("doc_id", "chunk_id", F.expr("sha2(chunk_text, 256)").alias("h"))
    e = h.select(
        "doc_id", "chunk_id", *[F.expr(x).alias(f"e{i}") for i, x in enumerate(lanes)]
    )
    sq = " + ".join(f"e{i} * e{i}" for i in range(_EMBED_LANES))
    n = e.withColumn("nrm", F.expr(f"sqrt({sq})"))
    dot = " + ".join(f"(e{i} / nrm) * {q}" for i, q in enumerate(qs))
    scored = n.select(
        "doc_id",
        "chunk_id",
        F.expr(f"CASE WHEN nrm > 0 THEN {dot} ELSE 0.0 END").alias("score"),
    )
    top = scored.orderBy(F.desc("score"), "doc_id", "chunk_id").limit(k)
    w = Window.orderBy(F.desc("score"), "doc_id", "chunk_id")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "chunk_id", round6("score").alias("score")
    )


def chunk_semantic_topk_sql(
    table_toks_cte: str,
    qvec,
    k: int = 10,
    size: int = 32,
    overlap: int = 8,
) -> str:
    stride = size - overlap
    lanes = _lane_exprs("duckdb")
    qs = _q_literals(qvec)
    e_defs = ", ".join(f"{x} AS e{i}" for i, x in enumerate(lanes))
    sq = " + ".join(f"e{i} * e{i}" for i in range(_EMBED_LANES))
    dot = " + ".join(f"(e{i} / nrm) * {q}" for i, q in enumerate(qs))
    return (
        f"WITH {table_toks_cte}, "
        f"ch AS (SELECT doc_id, CAST((s - 1) // {stride} AS BIGINT) AS chunk_id, "
        f"array_to_string(toks[s:s + {size - 1}], ' ') AS chunk_text "
        f"FROM docs, unnest(generate_series(1, len(toks), {stride})) AS _t(s)), "
        "h1 AS (SELECT doc_id, chunk_id, sha256(chunk_text) AS h FROM ch), "
        f"e AS (SELECT doc_id, chunk_id, {e_defs} FROM h1), "
        f"n AS (SELECT *, sqrt({sq}) AS nrm FROM e), "
        "sc AS (SELECT doc_id, chunk_id, "
        f"CASE WHEN nrm > 0 THEN {dot} ELSE 0.0 END AS score FROM n) "
        # the outer ORDER BY names sc.score explicitly: a bare 'score'
        # binds to the rounded SELECT alias in DuckDB while the window
        # (and Spark) rank by the RAW score — a 6-dp collision at the
        # LIMIT boundary would cut a different chunk across engines
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id, chunk_id) AS INT) "
        f"AS rank, doc_id, chunk_id, {round6_sql('score')} AS score "
        f"FROM sc ORDER BY sc.score DESC, doc_id, chunk_id LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# late-interaction (ColBERT MaxSim) retrieval over chunk vectors


def maxsim_topk(
    docs: DataFrame,
    qvecs,
    k: int = 10,
    size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """(rank, doc_id, score) — late-interaction retrieval (ColBERT,
    Khattab & Zaharia SIGIR 2020; the ES 8.16 ``rank_vectors``
    maxSimDotProduct): score(q, d) = sum over the query's vectors of
    the MAX dot product against any of the document's vectors. The
    document's multi-vector representation is its chunk embeddings
    (the chunk_semantic_topk lane: token windows -> sha2 hash-embed in
    pure JVM expressions; the real-model path swaps in
    functions/embed.embed_documents per chunk unchanged).

    Parity shape: each per-(chunk, qvec) dot product folds the 8 lanes
    in fixed lane order (identical chained sum both engines); MAX over
    doubles has no ordering hazard at all; the final score chains the
    m per-qvec maxes in fixed qvec order. So the only float reductions
    are order-pinned sums of <= 8 and <= m terms plus an order-free
    max — no corpus-scale fold exists.

    Scale: one scan, m dot products per chunk inside whole-stage
    codegen, ONE map-side-combinable groupBy(doc_id) carrying m
    doubles per partial, TakeOrdered k-cut. At 10^12 docs the shuffle
    moves m doubles per doc — the same weight as the plain cosine
    path, m times wider, never a pairwise join.
    """
    m = len(qvecs)
    if m < 1:
        raise ValueError("need >= 1 query vectors")
    if int(k) < 1:
        raise ValueError(f"k must be >= 1: {k!r}")
    lanes = _lane_exprs("spark")
    ch = chunk_documents(docs, size=size, overlap=overlap)
    h = ch.select("doc_id", F.expr("sha2(chunk_text, 256)").alias("h"))
    e = h.select(
        "doc_id", *[F.expr(x).alias(f"e{i}") for i, x in enumerate(lanes)]
    )
    sq = " + ".join(f"e{i} * e{i}" for i in range(_EMBED_LANES))
    n = e.withColumn("nrm", F.expr(f"sqrt({sq})"))
    dots = []
    for j, qv in enumerate(qvecs):
        qs = _q_literals(qv)
        dot = " + ".join(f"(e{i} / nrm) * {q}" for i, q in enumerate(qs))
        dots.append(
            F.expr(f"CASE WHEN nrm > 0 THEN {dot} ELSE 0.0 END").alias(f"d{j}")
        )
    per_chunk = n.select("doc_id", *dots)
    agg = per_chunk.groupBy("doc_id").agg(
        *[F.max(f"d{j}").alias(f"m{j}") for j in range(m)]
    )
    score = F.col("m0")
    for j in range(1, m):
        score = score + F.col(f"m{j}")
    scored = agg.select("doc_id", score.alias("score"))
    top = scored.orderBy(F.desc("score"), "doc_id").limit(int(k))
    w = Window.orderBy(F.desc("score"), "doc_id")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", round6("score").alias("score")
    )


def maxsim_topk_sql(
    table_toks_cte: str,
    qvecs,
    k: int = 10,
    size: int = 32,
    overlap: int = 8,
) -> str:
    """DuckDB mirror of maxsim_topk: identical lane folds, identical
    per-qvec max, identical fixed-order final chain."""
    m = len(qvecs)
    stride = size - overlap
    lanes = _lane_exprs("duckdb")
    e_defs = ", ".join(f"{x} AS e{i}" for i, x in enumerate(lanes))
    sq = " + ".join(f"e{i} * e{i}" for i in range(_EMBED_LANES))
    dot_defs = []
    for j, qv in enumerate(qvecs):
        qs = _q_literals(qv)
        dot = " + ".join(f"(e{i} / nrm) * {q}" for i, q in enumerate(qs))
        dot_defs.append(f"CASE WHEN nrm > 0 THEN {dot} ELSE 0.0 END AS d{j}")
    maxes = ", ".join(f"max(d{j}) AS m{j}" for j in range(m))
    chain = " + ".join(f"m{j}" for j in range(m))
    return (
        f"WITH {table_toks_cte}, "
        f"ch AS (SELECT doc_id, "
        f"array_to_string(toks[s:s + {size - 1}], ' ') AS chunk_text "
        f"FROM docs, unnest(generate_series(1, len(toks), {stride})) AS _t(s)), "
        "h1 AS (SELECT doc_id, sha256(chunk_text) AS h FROM ch), "
        f"e AS (SELECT doc_id, {e_defs} FROM h1), "
        f"n AS (SELECT *, sqrt({sq}) AS nrm FROM e), "
        f"pc AS (SELECT doc_id, {', '.join(dot_defs)} FROM n), "
        f"ag AS (SELECT doc_id, {maxes} FROM pc GROUP BY doc_id), "
        f"sc AS (SELECT doc_id, {chain} AS score FROM ag) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) "
        f"AS rank, doc_id, {round6_sql('score')} AS score "
        f"FROM sc ORDER BY sc.score DESC, doc_id LIMIT {int(k)}"
    )


# ---------------------------------------------------------------------------
# the composed curation funnel

CURATE_MIN_TOKENS = 25


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = CURATE_MIN_TOKENS,
    n: int = 8,
    bench_mod: int = 7,
    budget: int = 512,
    classifier_threshold: Optional[float] = None,
    classifier_loader=None,
) -> DataFrame:
    """(doc_id, lang, n_tokens, start_offset, bin_id) — the full
    curation funnel as ONE lazy DataFrame plan:

        exact-dedup -> quality floor -> benchmark decontamination ->
        mixture sampling -> sequence packing

    ``docs`` must carry (doc_id, text, lang, tokens). Each stage is the
    standalone operator's logic inlined on the survivor set, so Catalyst
    sees the whole funnel at once: the dedup groupBy and the gram
    semi-join are the only corpus-sized shuffles; quality/mixture are
    per-row filters fused into the scans around them; packing shuffles
    only the (already thinned) survivor set. Contamination is decided
    on the candidate's full gram set, so pre-filtering the candidate
    side with the cheap stages first is result-identical (a dropped
    duplicate's grams are its retained twin's grams) and strictly less
    work — the order IS the optimization.
    """
    d = docs.withColumn("n_tokens", F.size("tokens").cast("long"))
    # exact dedup: keep the min-doc_id representative per content hash
    h = d.withColumn("h", F.md5(F.encode("text", "utf-8")))
    reps = h.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    d1 = h.join(reps, ["h", "doc_id"]).drop("h")
    # quality floor
    d2 = d1.filter(F.col("n_tokens") >= min_tokens)
    if classifier_threshold is not None:
        # model-based quality stage (functions/classify.py seam): keep
        # verdicts come from the RAW table scan, not the survivor set —
        # referencing d2 twice would recompute the dedup shuffle per
        # branch, while the raw scan is column-pruned and already
        # re-read by the bench-gram side. Result-identical either way:
        # a dedup twin shares its representative's text, hence its
        # verdict. Inference rides mapInPandas; the verdict set joins
        # back as an inner doc_id join (shuffle on the thinned key).
        from ..functions.classify import classify_documents

        verdicts = (
            classify_documents(
                docs.select("doc_id", "text"),
                threshold=classifier_threshold,
                loader=classifier_loader,
            )
            .filter("keep")
            .select("doc_id")
        )
        d2 = d2.join(verdicts, "doc_id")
    # decontamination: bench slice is eval data — drop it AND anything
    # sharing an n-gram with it
    bench_set = (
        docs.filter(F.col("doc_id") % bench_mod == 0)
        .select(F.explode(F.expr(_gram_expr(n))).alias("gram"))
        .distinct()
    )
    cand = d2.filter(F.col("doc_id") % bench_mod != 0)
    contaminated = (
        cand.select("doc_id", F.explode(F.expr(_gram_expr(n))).alias("gram"))
        .distinct()
        .join(F.broadcast(bench_set), "gram")
        .select("doc_id")
        .distinct()
    )
    d3 = cand.join(contaminated, "doc_id", "left_anti")
    # mixture sampling, then the packing plan over the survivor stream
    d4 = d3.filter(mixture_keep_col())
    return pack_sequences(
        d4.select("doc_id", "lang", "tokens"), budget=budget, carry=("lang",)
    )


def curate_corpus_sql(
    table: str = "documents",
    min_tokens: int = CURATE_MIN_TOKENS,
    n: int = 8,
    bench_mod: int = 7,
    budget: int = 512,
    classifier_threshold: Optional[float] = None,
) -> str:
    from ..functions.sql_oracle import tokenize_col

    gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    bucket = f"('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % {_MIX_BUCKETS}"
    clf = ""
    if classifier_threshold is not None:
        from ..functions.classify import mock_classify_sql_expr

        clf = (
            f" AND {mock_classify_sql_expr('text')} > "
            f"CAST({sql_double(classifier_threshold)} AS DOUBLE)"
        )
    return (
        f"WITH docs AS (SELECT doc_id, text, lang, {tokenize_col('text')} AS toks "
        f"FROM {table}), "
        "d AS (SELECT doc_id, lang, text, len(toks) AS n_tokens FROM docs), "
        "reps AS (SELECT md5(text) AS h, min(doc_id) AS doc_id FROM d GROUP BY 1), "
        "d1 AS (SELECT d.* FROM d JOIN reps ON md5(d.text) = reps.h "
        "AND d.doc_id = reps.doc_id), "
        f"d2 AS (SELECT * FROM d1 WHERE n_tokens >= {min_tokens}{clf}), "
        f"g AS (SELECT doc_id, {gram} AS gram FROM docs, "
        f"unnest(generate_series(1, len(toks) - {n - 1})) AS _t(i)), "
        f"bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {bench_mod} = 0), "
        "contaminated AS (SELECT DISTINCT doc_id FROM g JOIN bench USING (gram) "
        f"WHERE doc_id % {bench_mod} <> 0), "
        f"d3 AS (SELECT * FROM d2 WHERE doc_id % {bench_mod} <> 0 "
        "AND doc_id NOT IN (SELECT doc_id FROM contaminated)), "
        f"d4 AS (SELECT * FROM d3 WHERE {bucket} < {_rate_case()} * {_MIX_BUCKETS}), "
        "c AS (SELECT doc_id, lang, n_tokens, coalesce(sum(n_tokens) OVER "
        "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS start_offset FROM d4) "
        "SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, "
        "CAST(start_offset AS BIGINT) AS start_offset, "
        f"CAST(start_offset // {budget} AS BIGINT) AS bin_id "
        "FROM c ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# PII scrubbing

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-555-\d{4}\b"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_text_col(col: F.Column) -> F.Column:
    """Redact emails, then phone numbers, then IPv4 addresses (in that
    order: the email pattern consumes the dotted domain before the IP
    pattern can see it)."""
    c = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, PII_PHONE, "<PHONE>")
    return F.regexp_replace(c, PII_IP, "<IP>")


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, clean_hash) — PII counts and
    the md5 of the redacted text (the hash, not the full scrubbed body,
    keeps the gate rows narrow while still pinning every replaced byte).

    Counts are measured on the SAME staged text each replacement runs
    on (phones counted after the email pass, IPs after the phone pass),
    so every count equals an actual redaction — a pattern swallowed by
    an earlier stage (an IP-shaped domain inside an already-redacted
    email) is not reported as a replacement that never happened.
    """

    def _n(col: str, pat: str) -> F.Column:
        esc = pat.replace("\\", "\\\\")
        return F.expr(f"size(regexp_extract_all({col}, '{esc}', 0))").cast("long")

    s1 = docs.select(
        "doc_id",
        F.col(text_col).alias("t0"),
        F.regexp_replace(F.col(text_col), PII_EMAIL, "<EMAIL>").alias("t1"),
    )
    s2 = s1.withColumn("t2", F.regexp_replace(F.col("t1"), PII_PHONE, "<PHONE>"))
    return s2.select(
        "doc_id",
        _n("t0", PII_EMAIL).alias("n_emails"),
        _n("t1", PII_PHONE).alias("n_phones"),
        _n("t2", PII_IP).alias("n_ips"),
        F.md5(
            F.encode(F.regexp_replace(F.col("t2"), PII_IP, "<IP>"), "utf-8")
        ).alias("clean_hash"),
    ).orderBy("doc_id")


# doc_id-derived synthetic PII appended to every row, written once and
# rendered into BOTH engines' expressions so the gate exercises real
# redactions on a corpus that contains no organic PII. Counts vary by
# row: every doc gets 1 email + 1 phone + 1 ip; doc_id%3==0 adds a
# second email, doc_id%5==0 a second ip.
def _pii_augment_spark() -> F.Column:
    return F.expr(
        "concat(text, ' contact user', CAST(doc_id AS STRING), '@mail',"
        " CAST(doc_id % 7 AS STRING), '.example.com call ',"
        " CAST(200 + doc_id % 700 AS STRING), '-555-',"
        " lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), ' ip 10.',"
        " CAST(doc_id % 256 AS STRING), '.0.', CAST(doc_id % 250 + 1 AS STRING),"
        " CASE WHEN doc_id % 3 = 0 THEN concat(' cc user', CAST(doc_id AS STRING),"
        " 'b@example.org') ELSE '' END,"
        " CASE WHEN doc_id % 5 = 0 THEN concat(' via 192.168.0.',"
        " CAST(doc_id % 200 + 1 AS STRING)) ELSE '' END)"
    )


_PII_AUGMENT_SQL = (
    "text || ' contact user' || doc_id::VARCHAR || '@mail' ||"
    " (doc_id % 7)::VARCHAR || '.example.com call ' ||"
    " (200 + doc_id % 700)::VARCHAR || '-555-' ||"
    " lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' ip 10.' ||"
    " (doc_id % 256)::VARCHAR || '.0.' || (doc_id % 250 + 1)::VARCHAR ||"
    " CASE WHEN doc_id % 3 = 0 THEN ' cc user' || doc_id::VARCHAR ||"
    " 'b@example.org' ELSE '' END ||"
    " CASE WHEN doc_id % 5 = 0 THEN ' via 192.168.0.' ||"
    " (doc_id % 200 + 1)::VARCHAR ELSE '' END"
)


def pii_scrub_augmented(documents: DataFrame) -> DataFrame:
    """Gate wrapper: augment each corpus row with deterministic
    doc_id-derived PII, then run the scrubber."""
    return pii_scrub(
        documents.select("doc_id", _pii_augment_spark().alias("text"))
    )


def pii_scrub_sql(table: str = "documents") -> str:
    def _n(col: str, pat: str) -> str:
        return f"len(regexp_extract_all({col}, '{pat}'))"

    return (
        f"WITH a AS (SELECT doc_id, {_PII_AUGMENT_SQL} AS aug FROM {table}), "
        f"s1 AS (SELECT doc_id, aug AS t0, "
        f"regexp_replace(aug, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1 FROM a), "
        f"s2 AS (SELECT *, regexp_replace(t1, '{PII_PHONE}', '<PHONE>', 'g') AS t2 "
        "FROM s1) "
        f"SELECT doc_id, CAST({_n('t0', PII_EMAIL)} AS BIGINT) AS n_emails, "
        f"CAST({_n('t1', PII_PHONE)} AS BIGINT) AS n_phones, "
        f"CAST({_n('t2', PII_IP)} AS BIGINT) AS n_ips, "
        f"md5(regexp_replace(t2, '{PII_IP}', '<IP>', 'g')) AS clean_hash "
        "FROM s2 ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# per-domain contribution caps (spam-domain thinning)

DOMAIN_CAP = 7


def apply_domain_cap(
    documents: DataFrame, cap: int = DOMAIN_CAP, key: str = "source"
) -> DataFrame:
    """Keep at most ``cap`` documents per domain (lowest doc_id wins) —
    the anti-spam / anti-SEO-farm thinning pass every web-corpus
    pipeline runs so no single domain dominates the train mix.

    Scale shape: a naive ``row_number() OVER (PARTITION BY domain ORDER
    BY doc_id)`` sorts EVERY domain's rows, including the overwhelming
    majority that are under the cap. Here the per-domain counts (one
    groupBy, map-side combined) split the corpus first, and ONLY the
    over-cap (hot) key set is ever broadcast — at web scale the
    under-cap domains are the majority of keys (hundreds of millions),
    so the under side is the hot set's anti-join, guaranteed-small
    broadcast on one side only. Only the hot tail — the handful of
    mega-domains the cap exists for — pays the rank window. AQE handles
    their skew; the union is result-identical to the naive window.
    """
    g = documents.groupBy(key).agg(F.count("*").alias("_n"))
    hot_keys = g.filter(F.col("_n") > cap).select(F.col(key).alias("_hk"))
    # null-safe split: a NULL domain is a group too (the SQL window the
    # result must match partitions NULLs together), and a plain equality
    # anti-join would wave every null-key row through uncapped — the
    # exact flood the cap exists to stop
    cond = documents[key].eqNullSafe(hot_keys["_hk"])
    under = documents.join(F.broadcast(hot_keys), cond, "left_anti")
    hot = documents.join(F.broadcast(hot_keys), cond, "leftsemi")
    w = Window.partitionBy(key).orderBy("doc_id")
    capped = (
        hot.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return under.unionByName(capped)


def domain_cap(
    documents: DataFrame, cap: int = DOMAIN_CAP, key: str = "source"
) -> DataFrame:
    """(source, n_docs, n_kept, at_cap) — the cap decision per domain,
    with the surviving doc set pinned by the min/max doc_id actually
    kept (so the gate checks WHICH rows survive, not just how many)."""
    kept = apply_domain_cap(documents, cap=cap, key=key)
    g = documents.groupBy(key).agg(F.count("*").cast("long").alias("n_docs"))
    k = kept.groupBy(key).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.min("doc_id").alias("first_kept"),
        F.max("doc_id").alias("last_kept"),
    )
    return (
        g.join(k, key)
        .select(
            key, "n_docs", "n_kept", (F.col("n_docs") > cap).alias("at_cap"),
            "first_kept", "last_kept",
        )
        .orderBy(key)
    )


def domain_cap_sql(
    table: str = "documents", cap: int = DOMAIN_CAP, key: str = "source"
) -> str:
    return (
        f"WITH r AS (SELECT {key}, doc_id, row_number() OVER "
        f"(PARTITION BY {key} ORDER BY doc_id) AS rn FROM {table}), "
        f"k AS (SELECT {key}, count(*) AS n_kept, min(doc_id) AS first_kept, "
        f"max(doc_id) AS last_kept FROM r WHERE rn <= {cap} GROUP BY {key}), "
        f"g AS (SELECT {key}, count(*) AS n_docs FROM {table} GROUP BY {key}) "
        f"SELECT g.{key}, CAST(g.n_docs AS BIGINT) AS n_docs, "
        "CAST(k.n_kept AS BIGINT) AS n_kept, "
        f"g.n_docs > {cap} AS at_cap, k.first_kept, k.last_kept "
        f"FROM g JOIN k USING ({key}) ORDER BY {key}"
    )


# ---------------------------------------------------------------------------
# unicode text normalization (web-corpus cleanup)


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_norm, changed, n_chars_raw, n_chars_norm) — the
    standard web-text cleanup pass that runs before tokenization /
    dedup at corpus scale: NFC canonical composition (so 'e'+combining
    acute and precomposed 'é' hash/dedup/tokenize identically), strip
    zero-width characters (U+200B/C/D, BOM) and C0/DEL controls, map
    NBSP to space, collapse ASCII whitespace runs, trim.

    NFC is the one step with no JVM built-in, so the whole chain runs
    in one Arrow-batched pandas UDF (functions/udfs.normalize_text_udf)
    — a single Python crossing per batch, embarrassingly parallel,
    zero shuffles. The two-step select keeps the UDF evaluated ONCE
    (CollapseProject will not inline a multi-referenced non-trivial
    expression), with changed/length derived from the alias JVM-side.
    """
    from ..functions.udfs import normalize_text_udf

    base = docs.select(
        "doc_id",
        F.col(text_col).alias("_raw"),
        normalize_text_udf(F.col(text_col)).alias("text_norm"),
    )
    return base.select(
        "doc_id",
        "text_norm",
        (F.col("text_norm") != F.col("_raw")).alias("changed"),
        F.length("_raw").cast("long").alias("n_chars_raw"),
        F.length("text_norm").cast("long").alias("n_chars_norm"),
    ).orderBy("doc_id")


def _mess_augment_spark() -> F.Column:
    """Deterministic doc_id-derived 'messy web text' augmentation: the
    corpus is plain ASCII, so the gate entry grafts an NFD sequence
    (e + combining acute), NBSP, zero-width space, a control char, tab
    runs and edge spaces onto every row — byte-identically on both
    engines (mirrors _MESS_AUGMENT_SQL's chr() chain) — so every
    normalization lane is exercised on every row, not vacuously
    green."""
    return F.concat(
        F.col("text"),
        F.lit("\u00a0cafe\u0301\u200b v"),
        F.col("doc_id").cast("string"),
        F.lit("\x07 tab\t\tend  "),
    )


_MESS_AUGMENT_SQL = (
    "text || chr(160) || 'cafe' || chr(769) || chr(8203) || ' v' || "
    "doc_id::VARCHAR || chr(7) || ' tab' || chr(9) || chr(9) || 'end  '"
)


def normalize_text_augmented(documents: DataFrame) -> DataFrame:
    """Gate wrapper: graft deterministic mess onto each row, then
    normalize."""
    return normalize_text(
        documents.select("doc_id", _mess_augment_spark().alias("text"))
    )


def normalize_text_sql(table: str = "documents") -> str:
    norm = (
        "trim(regexp_replace(regexp_replace(regexp_replace("
        "replace(nfc_normalize(aug), chr(160), ' '), "
        r"'[\x{200b}\x{200c}\x{200d}\x{feff}]', '', 'g'), "
        r"'[\x00-\x08\x0b\x0e-\x1f\x7f]', '', 'g'), "
        r"'[ \t\n\r\f]+', ' ', 'g'), ' ')"
    )
    return (
        f"WITH a AS (SELECT doc_id, {_MESS_AUGMENT_SQL} AS aug FROM {table}), "
        f"n AS (SELECT doc_id, aug, {norm} AS text_norm FROM a) "
        "SELECT doc_id, text_norm, text_norm <> aug AS changed, "
        "CAST(length(aug) AS BIGINT) AS n_chars_raw, "
        "CAST(length(text_norm) AS BIGINT) AS n_chars_norm "
        "FROM n ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# temperature-based mixture resampling (UniMax / mT5-style)


def temperature_rates(
    documents: DataFrame, alpha: float = 0.5, target_frac: float = 0.5
) -> DataFrame:
    """(lang, n_l, rate) — per-language keep rates for temperature
    sampling: target share q_l ∝ p_l^alpha over observed shares p_l,
    keep rate r_l = min(1, q_l * T / n_l) for a T = target_frac * N
    doc budget. alpha < 1 flattens the mixture toward low-resource
    languages (mT5/UniMax practice); alpha = 1 is proportional
    (no-op rates when target_frac = 1).

    Engine-portable arithmetic: p^alpha is written exp(alpha * ln(p))
    on BOTH engines (the ln/exp lanes whose bit-parity unigram_logppl
    establishes), the cross-language normalizer folds in canonical
    lang order, and all operand orders mirror the oracle text. The
    rates relation is k rows (k = #languages) — the only aggregation
    is one count per language; no corpus-wide shuffle beyond it.
    """
    counts = documents.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_l")
    )
    tot = counts.agg(F.sum("n_l").cast("long").alias("n_tot"))
    c2 = counts.crossJoin(F.broadcast(tot)).withColumn(
        "num",
        F.exp(F.lit(float(alpha)) * F.log(F.col("n_l") * F.lit(1.0) / F.col("n_tot"))),
    )
    denom = c2.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("lang", "num"))),
            F.lit(0.0),
            lambda acc, x: acc + x["num"],
        ).alias("denom")
    )
    rate = F.least(
        F.lit(1.0),
        F.col("num") / F.col("denom")
        * (F.lit(float(target_frac)) * F.col("n_tot"))
        / F.col("n_l"),
    )
    return (
        c2.crossJoin(F.broadcast(denom))
        .select("lang", "n_l", rate.alias("rate"))
    )


def temperature_sample(
    documents: DataFrame, alpha: float = 0.5, target_frac: float = 0.5
) -> DataFrame:
    """(lang, n_total, n_kept, rate) — summary of the deterministic
    hash-threshold temperature sample: doc kept iff its md5 bucket
    falls under the language's temperature rate (same portable bucket
    lane as mixture_sample, zero shuffle on the corpus side — the
    k-row rates relation broadcasts)."""
    rates = temperature_rates(documents, alpha, target_frac)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _MIX_BUCKETS
    )
    d = documents.join(F.broadcast(rates), "lang").withColumn(
        "keep", (bucket < F.col("rate") * _MIX_BUCKETS).cast("int")
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum("keep").cast("long").alias("n_kept"),
            round6(F.first("rate")).alias("rate"),
        )
        .orderBy("lang")
    )


def temperature_sample_sql(
    table: str = "documents", alpha: float = 0.5, target_frac: float = 0.5
) -> str:
    bucket = f"('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % {_MIX_BUCKETS}"
    return (
        f"WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_l FROM {table} GROUP BY lang), "
        "t AS (SELECT CAST(sum(n_l) AS BIGINT) AS n_tot FROM c), "
        f"c2 AS (SELECT lang, n_l, exp({sql_double(alpha)} * ln(n_l * 1.0 / (SELECT n_tot FROM t))) AS num FROM c), "
        "d AS (SELECT sum(num ORDER BY lang) AS denom FROM c2), "
        "r AS (SELECT lang, least(1.0, num / (SELECT denom FROM d) * "
        f"({sql_double(target_frac)} * (SELECT n_tot FROM t)) / n_l) AS rate FROM c2), "
        f"k AS (SELECT lang, rate, CASE WHEN {bucket} < rate * {_MIX_BUCKETS} "
        f"THEN 1 ELSE 0 END AS keep FROM {table} JOIN r USING (lang)) "
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_total, "
        "CAST(sum(keep) AS BIGINT) AS n_kept, "
        f"{round6_sql('any_value(rate)')} AS rate "
        "FROM k GROUP BY lang ORDER BY lang"
    )


# ---------------------------------------------------------------------------
# C4-style rule-based page cleaning (Raffel et al. 2020, the heuristic
# filter every web-scale training corpus starts from; FineWeb/RefinedWeb
# run the same shapes with tuned thresholds)

C4_MIN_WORDS = 5  # a kept line needs this many whitespace words
C4_MIN_KEPT = 3  # a kept page needs this many surviving lines


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = C4_MIN_WORDS,
    min_kept: int = C4_MIN_KEPT,
) -> DataFrame:
    """(doc_id, n_lines, n_kept, page_keep, clean_hash) — the C4
    line/page heuristics as one pure-expression pass:

    line rules (a line survives only if ALL hold):
      - ends in a terminal punctuation mark (``. ! ? "``),
      - has >= ``min_words`` whitespace-separated words,
      - does not mention ``javascript`` (case-insensitive);
    page rules (the page is dropped entirely if ANY holds):
      - fewer than ``min_kept`` surviving lines (C4's "at least three
        sentences"),
      - contains ``lorem ipsum`` (case-insensitive),
      - contains ``{`` (the code-leak guard). C4's bad-words page rule
        is this same contains() shape over a list.

    ``clean_hash`` pins the surviving lines in original order (md5 of
    the reassembly — the dedup_lines narrow-row precedent), so the gate
    pins every kept byte, not just the counts.

    Scale: per-row JVM expressions only (split + filter HOF + md5) —
    zero shuffle, zero Python; the one-pass shape survives any corpus
    size because no corpus-wide state exists."""
    t = F.col(text_col)
    lines = F.split(t, "\n", -1)
    kept = F.filter(
        lines,
        lambda l: (F.size(F.split(l, " ", -1)) >= int(min_words))
        & l.rlike('[.!?"]$')
        & (~F.lower(l).contains("javascript")),
    )
    n_kept = F.size(kept)
    page_keep = (
        (~F.lower(t).contains("lorem ipsum"))
        & (~t.contains("{"))
        & (n_kept >= int(min_kept))
    )
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        page_keep.alias("page_keep"),
        F.md5(F.encode(F.array_join(kept, "\n"), "utf-8")).alias(
            "clean_hash"
        ),
    ).orderBy("doc_id")


# Gate augmentation: the corpus is single-line word-soup, so each doc
# renders as a page exercising every rule IDENTICALLY in both engines —
# a short nav line (always dropped: 1 word, no punctuation), 6-token
# body lines where alternate lines get a terminal '.' (the others drop
# by the punctuation rule; the tail line usually drops by min-words),
# and doc_id-conditional hazard lines: a javascript notice (line rule),
# a lorem-ipsum line and a brace line (page rules).
_C4_GROUP = 6


def _c4_augment_spark() -> F.Column:
    g = _C4_GROUP
    return F.expr(
        "concat('home', chr(10), "
        f"array_join(transform(sequence(0, (size(w) - 1) DIV {g}), "
        f"g -> CASE WHEN (doc_id + g) % 2 = 0 "
        f"THEN concat(array_join(slice(w, g * {g} + 1, {g}), ' '), '.') "
        f"ELSE array_join(slice(w, g * {g} + 1, {g}), ' ') END), chr(10)), "
        "CASE WHEN doc_id % 4 = 0 THEN concat(chr(10), "
        "'please enable javascript to view this site.') ELSE '' END, "
        "CASE WHEN doc_id % 17 = 0 THEN concat(chr(10), "
        "'lorem ipsum dolor sit amet.') ELSE '' END, "
        "CASE WHEN doc_id % 23 = 0 THEN concat(chr(10), "
        "'var config = { debug: false };') ELSE '' END)"
    )


def _c4_augment_sql(table: str = "documents") -> str:
    g = _C4_GROUP
    return (
        f"w0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}), "
        "a AS (SELECT doc_id, 'home' || chr(10) || "
        f"array_to_string(list_transform(generate_series(0, (len(w) - 1) // {g}), "
        f"g -> CASE WHEN (doc_id + g) % 2 = 0 "
        f"THEN array_to_string(w[g * {g} + 1:g * {g} + {g}], ' ') || '.' "
        f"ELSE array_to_string(w[g * {g} + 1:g * {g} + {g}], ' ') END), chr(10)) "
        "|| CASE WHEN doc_id % 4 = 0 THEN chr(10) || "
        "'please enable javascript to view this site.' ELSE '' END "
        "|| CASE WHEN doc_id % 17 = 0 THEN chr(10) || "
        "'lorem ipsum dolor sit amet.' ELSE '' END "
        "|| CASE WHEN doc_id % 23 = 0 THEN chr(10) || "
        "'var config = { debug: false };' ELSE '' END AS txt FROM w0)"
    )


def c4_clean_augmented(documents: DataFrame) -> DataFrame:
    """Gate wrapper: render each corpus row as a multi-line page, then
    run the C4 cleaner."""
    return c4_clean(
        documents.select(
            "doc_id",
            F.expr("split(text, ' ')").alias("w"),
        ).select("doc_id", _c4_augment_spark().alias("text"))
    )


def c4_clean_sql(
    table: str = "documents",
    min_words: int = C4_MIN_WORDS,
    min_kept: int = C4_MIN_KEPT,
) -> str:
    return (
        f"WITH {_c4_augment_sql(table)}, "
        "l0 AS (SELECT doc_id, txt, string_split(txt, chr(10)) AS ls FROM a), "
        "k AS (SELECT doc_id, txt, len(ls) AS n_lines, list_filter(ls, "
        f"l -> len(string_split(l, ' ')) >= {int(min_words)} "
        "AND regexp_matches(l, '[.!?\"]$') "
        "AND NOT contains(lower(l), 'javascript')) AS kept FROM l0) "
        "SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines, "
        "CAST(len(kept) AS BIGINT) AS n_kept, "
        "(NOT contains(lower(txt), 'lorem ipsum') AND NOT contains(txt, '{') "
        f"AND len(kept) >= {int(min_kept)}) AS page_keep, "
        # array_to_string(NULL-on-empty) vs Spark array_join('' on
        # empty): coalesce, the dedup_lines precedent
        "md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_hash "
        "FROM k ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# fuzzy decontamination (minhash-LSH vs the eval suite)


def decontaminate_fuzzy(
    docs: DataFrame,
    bench_mod: int = 7,
    jaccard_min: float = 0.5,
) -> DataFrame:
    """(doc_id, bench_id, jaccard) — FUZZY decontamination: training
    docs that are near-duplicates of an eval-suite document by shingle
    Jaccard, found via minhash-LSH band buckets (the GPT-3-style
    fuzzy-overlap pass that catches paraphrased/reformatted leakage
    the exact 8-gram filter misses — the two compose: exact
    ``decontaminate`` for verbatim grams, this for near-dup pages).

    The eval side is the deterministic ``doc_id % bench_mod == 0``
    slice (the ``decontaminate`` stand-in convention; a real eval
    suite swaps in unchanged). Scale shape: signatures are the shared
    minhash lane; the band join is corpus-bands x BROADCAST
    bench-bands (eval suites are tiny — no self-join exists, so no
    mega-bucket cap is needed: a boilerplate band bucket pairs with
    at most |bench| rows); the exact-Jaccard verify touches candidate
    pairs only (the crossdedup discipline)."""
    from .dedup import N_BANDS, _band_cols, _jaccard_verify, minhash_signatures

    if int(bench_mod) < 2:
        raise ValueError(f"bench_mod must be >= 2: {bench_mod!r}")
    sigs = minhash_signatures(docs, ordered=False).select(
        "doc_id", *_band_cols()
    )
    bands = None
    for b in range(N_BANDS):
        part = sigs.select(
            F.lit(b).alias("band_id"), F.col(f"band{b}").alias("sig"), "doc_id"
        )
        bands = part if bands is None else bands.unionByName(part)
    is_bench = F.col("doc_id") % int(bench_mod) == 0
    corpus_b = bands.where(~is_bench)
    bench_b = bands.where(is_bench)
    cand = (
        corpus_b.alias("c")
        .join(
            F.broadcast(bench_b.alias("e")),
            (F.col("c.band_id") == F.col("e.band_id"))
            & (F.col("c.sig") == F.col("e.sig")),
        )
        .select(
            F.col("c.doc_id").alias("doc_a"), F.col("e.doc_id").alias("doc_b")
        )
        .distinct()
    )
    out = _jaccard_verify(docs, cand, float(jaccard_min))
    return out.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("bench_id"),
        "jaccard",
    ).orderBy("doc_id", "bench_id")


def decontaminate_fuzzy_sql(
    table_toks_cte: str, bench_mod: int = 7, jaccard_min: float = 0.5
) -> str:
    """DuckDB mirror of decontaminate_fuzzy: shared minhash/band
    spellings, the corpus x bench band join, exact-Jaccard verify."""
    from .dedup import N_BANDS, N_HASHES, SHINGLES_SQL

    rows = N_HASHES // N_BANDS
    mins = ", ".join(f"min(md5('{i}|' || sh)) AS mh{i}" for i in range(N_HASHES))
    band_select = ", ".join(
        "(" + " || ".join(f"mh{b * rows + r}" for r in range(rows)) + f") AS band{b}"
        for b in range(N_BANDS)
    )
    band_union = " UNION ALL ".join(
        f"SELECT {b} AS band_id, band{b} AS sig, doc_id FROM sigs"
        for b in range(N_BANDS)
    )
    jm = sql_double(float(jaccard_min))
    return (
        f"WITH {table_toks_cte}, "
        f"shd AS (SELECT doc_id, {SHINGLES_SQL} AS shingles FROM docs), "
        "sh AS (SELECT doc_id, unnest(shingles) AS sh FROM shd WHERE len(shingles) > 0), "
        f"sig0 AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id), "
        f"sigs AS (SELECT doc_id, {band_select} FROM sig0), "
        f"bands AS ({band_union}), "
        f"cand AS (SELECT DISTINCT c.doc_id AS doc_a, e.doc_id AS doc_b "
        "FROM (SELECT * FROM bands WHERE doc_id % " + str(int(bench_mod)) + " <> 0) c "
        "JOIN (SELECT * FROM bands WHERE doc_id % " + str(int(bench_mod)) + " = 0) e "
        "ON c.band_id = e.band_id AND c.sig = e.sig), "
        "dsh AS (SELECT doc_id, unnest(list_distinct(shingles)) AS sh FROM shd), "
        "sizes AS (SELECT doc_id, count(*) AS n_sh FROM dsh GROUP BY doc_id), "
        "inter AS (SELECT cand.doc_a, cand.doc_b, count(*) AS i FROM cand "
        "JOIN dsh sa ON sa.doc_id = cand.doc_a "
        "JOIN dsh sb ON sb.doc_id = cand.doc_b AND sb.sh = sa.sh "
        "GROUP BY cand.doc_a, cand.doc_b), "
        "j AS (SELECT doc_a, doc_b, "
        "CAST(i AS DOUBLE) / (na.n_sh + nb.n_sh - i) AS jaccard FROM inter "
        "JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b) "
        f"SELECT doc_a AS doc_id, doc_b AS bench_id, {round6_sql('jaccard')} AS jaccard "
        f"FROM j WHERE jaccard >= {jm} ORDER BY doc_id, bench_id"
    )
