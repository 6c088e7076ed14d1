"""Index fsck — offline integrity verification of a persisted index.

The operational check a serving index needs before an atomic swap (the
Lucene ``CheckIndex`` analog): every invariant the query paths ASSUME
is verified against the actual on-disk relations, so a partial write,
a manual mutation, or a version-skewed builder is caught at deploy
time instead of as silently-wrong rankings.

Invariants (each an independent named check; all must hold for ok):

- layout: every required stage dir exists and is readable parquet;
- stats: the stats row's ``n_docs`` equals count(docs) and ``avgdl``
  equals the exact recomputation sum(doc_len)/n_docs (bit-equal — the
  builder computes it with the same arithmetic);
- doc_ids: dense 0..n_docs-1, unique (the range-sharded serving
  layouts and the federation id offsets both assume density);
- tf: (term, doc_id) unique, every doc_id refers to a docs row, and
  per-doc sum(tf) equals docs.doc_len (the BM25 length normalization
  reads doc_len; a drift here skews every score);
- terms: term unique, 1 <= df <= n_docs, and df equals the recount
  from tf (idf is a pure function of df — a drift here shifts idf);
- buckets: term_bucket values fall in [0, n_buckets) of _meta.json on
  every bucketed relation present (postings/positional/fuzzy_keys —
  the query-time partition pruning assumes the build's bucket fn);
- extras: doc ids of the sharded/positional layouts fall inside
  [0, n_docs) via their range arithmetic.

Cost: a handful of scans + hash aggregations over the index relations
(no corpus re-tokenization, no posting decode) — the same order as one
cold stats query. Run it from the CLI: ``fsck --index DIR``.
"""

from __future__ import annotations

import json
import os
from typing import List

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REQUIRED = ("docs", "tf", "terms", "stats")


def _check(name: str, ok: bool, detail: str) -> dict:
    return {"name": name, "ok": bool(ok), "detail": detail}


def fsck_index(spark: SparkSession, index_dir: str) -> dict:
    """-> {"ok": bool, "checks": [{name, ok, detail}, ...]}."""
    checks: List[dict] = []

    missing = [
        s for s in REQUIRED
        if not os.path.isdir(os.path.join(index_dir, s))
    ]
    checks.append(
        _check(
            "layout",
            not missing,
            "all stage dirs present" if not missing else f"missing: {missing}",
        )
    )
    if missing:
        return {"ok": False, "checks": checks}

    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    tf = spark.read.parquet(os.path.join(index_dir, "tf"))
    terms = spark.read.parquet(os.path.join(index_dir, "terms"))
    srow = spark.read.parquet(os.path.join(index_dir, "stats")).first()

    # --- stats vs docs -----------------------------------------------------
    agg = docs.agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("nd"),
        F.min("doc_id").alias("mn"),
        F.max("doc_id").alias("mx"),
        F.sum("doc_len").alias("sl"),
    ).first()
    n = int(agg["n"])
    checks.append(
        _check(
            "stats.n_docs",
            int(srow["n_docs"]) == n,
            f"stats={int(srow['n_docs'])} docs={n}",
        )
    )
    avgdl = (float(agg["sl"]) * 1.0 / n) if n else 0.0
    checks.append(
        _check(
            "stats.avgdl",
            float(srow["avgdl"]) == avgdl,
            f"stats={float(srow['avgdl'])!r} recomputed={avgdl!r}",
        )
    )

    # --- doc id density ----------------------------------------------------
    dense = (
        n == 0
        or (int(agg["nd"]) == n and int(agg["mn"]) == 0 and int(agg["mx"]) == n - 1)
    )
    checks.append(
        _check(
            "doc_ids.dense",
            dense,
            f"n={n} distinct={int(agg['nd'])} min={agg['mn']} max={agg['mx']}",
        )
    )

    # --- tf integrity ------------------------------------------------------
    dup_tf = (
        tf.groupBy("term", "doc_id").count().where(F.col("count") > 1).count()
    )
    checks.append(_check("tf.unique", dup_tf == 0, f"{dup_tf} duplicate (term, doc_id) rows"))
    orphan = tf.join(docs.select("doc_id"), "doc_id", "left_anti").count()
    checks.append(_check("tf.doc_refs", orphan == 0, f"{orphan} tf rows with unknown doc_id"))
    # doc_len must equal the per-doc tf sum (docs with no tokens carry
    # doc_len 0 and no tf rows — coalesce covers them)
    len_bad = (
        docs.select("doc_id", "doc_len")
        .join(
            tf.groupBy("doc_id").agg(F.sum("tf").alias("_s")), "doc_id", "left"
        )
        .where(F.col("doc_len") != F.coalesce(F.col("_s"), F.lit(0)))
        .count()
    )
    checks.append(_check("tf.doc_len", len_bad == 0, f"{len_bad} docs with doc_len != sum(tf)"))

    # --- terms integrity ---------------------------------------------------
    dup_terms = terms.groupBy("term").count().where(F.col("count") > 1).count()
    checks.append(_check("terms.unique", dup_terms == 0, f"{dup_terms} duplicate terms"))
    df_oob = terms.where((F.col("df") < 1) | (F.col("df") > n)).count()
    checks.append(_check("terms.df_bounds", df_oob == 0, f"{df_oob} terms with df outside [1, n_docs]"))
    recount = tf.groupBy("term").agg(F.count("*").alias("_df"))
    df_drift = (
        terms.select("term", "df")
        .join(recount, "term", "full")
        .where(
            F.col("df").isNull()
            | F.col("_df").isNull()
            | (F.col("df") != F.col("_df"))
        )
        .count()
    )
    checks.append(_check("terms.df_recount", df_drift == 0, f"{df_drift} terms with df != recount(tf)"))

    # --- bucket ranges of every bucketed relation present -------------------
    meta_path = os.path.join(index_dir, "_meta.json")
    n_buckets = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        n_buckets = meta.get("n_buckets")
    if n_buckets is not None:
        for rel in ("postings", "positional", "fuzzy_keys"):
            d = os.path.join(index_dir, rel)
            if not os.path.isdir(d):
                continue
            r = spark.read.parquet(d)
            if "term_bucket" not in r.columns:
                continue
            oob = r.where(
                (F.col("term_bucket") < 0)
                | (F.col("term_bucket") >= int(n_buckets))
            ).count()
            checks.append(
                _check(
                    f"{rel}.bucket_range",
                    oob == 0,
                    f"{oob} rows outside [0, {n_buckets})",
                )
            )

    # --- extras doc-id ranges ----------------------------------------------
    shard_dir = os.path.join(index_dir, "sharded")
    if os.path.isdir(shard_dir) and n > 0:
        sh = spark.read.parquet(shard_dir)
        width = 65536
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                width = int(json.load(f).get("sharded_width", 65536))
        # every shard's range must start inside the corpus id space
        oob = sh.select("range_id").distinct().where(
            (F.col("range_id") < 0) | (F.col("range_id") * width >= n)
        ).count()
        checks.append(
            _check("sharded.range_ids", oob == 0, f"{oob} shard ranges outside the id space")
        )

    return {"ok": all(c["ok"] for c in checks), "checks": checks}
