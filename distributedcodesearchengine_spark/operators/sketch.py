"""Distributed frequency / cardinality sketches (Count-Min, KMV).

The reference keeps exact corpus statistics only (tf/df/N maps,
``codesearch/storage/bm25_index.py:84-115``) — fine at 10^5 docs,
impossible at 10^12, where pipeline bookkeeping (df estimation before
an index exists, vocab-size tracking across shards, heavy-hitter
detection for stop lists) wants MERGEABLE fixed-size sketches. Both
sketches here are built with the engine-portable md5 lanes the dedup
suite established, so the DuckDB oracles agree bit-for-bit — no
"approximately equal" testing, the sketch itself is deterministic.

* Count-Min (Cormode & Muthukrishnan): ``depth x width`` counter
  matrix; every token occurrence increments one bucket per depth row
  (bucket = md5(d|term) mod width). Built with ONE explode + ONE
  map-side-combinable groupBy — the sketch is a sum, so partitions
  combine before the shuffle and sketches of different corpus shards
  merge by addition. Point estimate = min over depths of the bucket
  count; always an over-estimate (one-sided error), proven per-term
  against the exact counts in the gate entry.

* KMV / bottom-k (Bar-Yossef et al.): cardinality from the k smallest
  hash values of the distinct key set. est = (k-1) / (h_k / 2^32) with
  h_k the k-th minimum of the 32-bit md5-prefix lane. The k-row
  bottom is a distributed TakeOrdered (no global sort); shard sketches
  merge by keeping the k smallest of the union.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round6, round6_sql

CMS_DEPTH = 4
CMS_WIDTH = 256
KMV_K = 64
_HASH_SPACE = float(1 << 32)


def _bucket_col(depth_col, term_col, width: int):
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat(
                            depth_col.cast("string"), F.lit("|"), term_col
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
        % width
    )


def cms_build(
    docs: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """docs(doc_id, tokens) -> (d, bucket, cnt) — the CMS counter
    matrix over token OCCURRENCES (ctf). depth*width rows max."""
    tok = docs.select(F.explode("tokens").alias("term"))
    deep = tok.select(
        "term", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    )
    return (
        deep.select("d", _bucket_col(F.col("d"), F.col("term"), width).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimates(
    docs: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(term, ctf, est) for every dictionary term: exact corpus
    frequency beside its CMS point estimate (min over depths). The
    one-sided bound est >= ctf is asserted in tests and visible in the
    gate artifact. The dictionary join probes the depth*width matrix —
    broadcastable at any corpus size (the sketch is fixed-size)."""
    cms = cms_build(docs, depth, width)
    tok = docs.select(F.explode("tokens").alias("term"))
    truth = tok.groupBy("term").agg(F.count("*").cast("long").alias("ctf"))
    probes = truth.select(
        "term", "ctf",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    probes = probes.withColumn(
        "bucket", _bucket_col(F.col("d"), F.col("term"), width)
    )
    joined = probes.join(F.broadcast(cms), ["d", "bucket"])
    return (
        joined.groupBy("term", "ctf")
        .agg(F.min("cnt").cast("long").alias("est"))
        .orderBy("term")
    )


def cms_estimates_sql(
    toks_cte: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> str:
    return (
        f"WITH {toks_cte}, "
        "tok AS (SELECT unnest(toks) AS term FROM docs), "
        f"deep AS (SELECT term, unnest(range({depth})) AS d FROM tok), "
        "cms AS (SELECT d, ('0x' || substr(md5(d::VARCHAR || '|' || term), 1, 8))::BIGINT "
        f"% {width} AS bucket, CAST(count(*) AS BIGINT) AS cnt FROM deep GROUP BY 1, 2), "
        "truth AS (SELECT term, CAST(count(*) AS BIGINT) AS ctf FROM tok GROUP BY term), "
        f"probes AS (SELECT term, ctf, unnest(range({depth})) AS d FROM truth), "
        "pb AS (SELECT term, ctf, d, ('0x' || substr(md5(d::VARCHAR || '|' || term), 1, 8))::BIGINT "
        f"% {width} AS bucket FROM probes) "
        "SELECT pb.term, pb.ctf, CAST(min(cms.cnt) AS BIGINT) AS est "
        "FROM pb JOIN cms ON cms.d = pb.d AND cms.bucket = pb.bucket "
        "GROUP BY pb.term, pb.ctf ORDER BY pb.term"
    )


def kmv_distinct(docs: DataFrame, k: int = KMV_K) -> DataFrame:
    """1 row (n_distinct, est) — exact distinct token count beside the
    bottom-k (KMV) estimate from the k smallest 32-bit hash values of
    the distinct term set. The bottom-k is a TakeOrdered (distributed
    partial top-k, no global sort); the exact count is one agg and is
    reported for the gate's side-by-side only — a production sketch
    run would keep just the k-row bottom."""
    terms = docs.select(F.explode("tokens").alias("term")).distinct()
    hashed = terms.select(
        F.conv(F.substring(F.md5(F.encode(F.col("term"), "utf-8")), 1, 8), 16, 10)
        .cast("long")
        .alias("h")
    )
    n = terms.count()
    bottom = [r["h"] for r in hashed.orderBy("h").limit(k).collect()]
    if len(bottom) >= k:
        est = (k - 1) / (float(bottom[-1]) / _HASH_SPACE)
    else:
        est = float(len(bottom))  # fewer keys than k: bottom is exact
    spark = docs.sparkSession
    from ..functions.rounding import round6_py

    return spark.createDataFrame(
        [(int(n), float(round6_py(est)))], "n_distinct long, est double"
    )


def kmv_distinct_sql(toks_cte: str, k: int = KMV_K) -> str:
    return (
        f"WITH {toks_cte}, "
        "terms AS (SELECT DISTINCT unnest(toks) AS term FROM docs), "
        "hashed AS (SELECT ('0x' || substr(md5(term), 1, 8))::BIGINT AS h FROM terms), "
        f"bottom AS (SELECT h FROM hashed ORDER BY h LIMIT {k}), "
        "kth AS (SELECT max(h) AS hk, count(*) AS nb FROM bottom) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM terms) AS n_distinct, "
        f"{round6_sql(f'CASE WHEN (SELECT nb FROM kth) >= {k} THEN ({k} - 1) / (CAST((SELECT hk FROM kth) AS DOUBLE) / {_HASH_SPACE!r}) ELSE CAST((SELECT nb FROM kth) AS DOUBLE) END')} AS est"
    )
