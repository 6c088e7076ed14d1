"""IP-address analytics over derived addresses — the crawl-politeness
surfaces a web-scale fetcher budget-plans with: the ES ``ip_range``
aggregation and the per-subnet concentration rollup (the /16 ledger a
crawler rate-limits against; reference parity class: the ES ip field
family, re-expressed for the webtext pipeline).

The corpus carries no ip column, so — the geo/PII/terms_set
augmentation precedent — both engines derive a deterministic IPv4 from
the parquet alone: ip32 = third md5(doc_id) hex slice (chars 17-24;
slices 1-8 / 9-16 are the geo family's — an independent window keeps
the augmentations uncorrelated), a uniform integer in [0, 2^32). The
ENTIRE family is integer comparisons and integer division on that
value, so cross-engine parity is exact by construction; a real corpus
swaps in a materialized ip column unchanged.

Scale shapes:
- ip_range: one conditional-agg pass over len(edges)+1 always-present
  buckets (the geo_distance_rings / filters-agg stack shape) — one
  comparison chain per row, a 1-row partial-agg reduce, a tiny
  bucket-relation fan-out;
- subnet rollup: map-side-combinable integer groupBy on ip32 DIV
  2^(32-bits) + TakeOrderedAndProject — a billion docs in one subnet
  collapse per map task before the shuffle, and the top-k cut never
  sorts the subnet space.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IP_MAX = 1 << 32


def _ip32_col() -> F.Column:
    return F.conv(
        F.substring(
            F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8")), 17, 8
        ),
        16,
        10,
    ).cast("long")


def _ip32_sql() -> str:
    return (
        "ips AS (SELECT doc_id, "
        "('0x' || substr(md5(doc_id::VARCHAR), 17, 8))::BIGINT AS ip32 "
        "FROM documents)"
    )


def _dotted(col: F.Column) -> F.Column:
    return F.concat_ws(
        ".",
        (col.bitwiseAND(F.lit(0xFF000000)) / F.lit(1 << 24)).cast("long"),
        (col.bitwiseAND(F.lit(0x00FF0000)) / F.lit(1 << 16)).cast("long"),
        (col.bitwiseAND(F.lit(0x0000FF00)) / F.lit(1 << 8)).cast("long"),
        col.bitwiseAND(F.lit(0x000000FF)).cast("long"),
    )


def _dotted_sql(expr: str) -> str:
    return (
        f"(({expr}) // 16777216)::VARCHAR || '.' || "
        f"((({expr}) // 65536) % 256)::VARCHAR || '.' || "
        f"((({expr}) // 256) % 256)::VARCHAR || '.' || "
        f"(({expr}) % 256)::VARCHAR"
    )


def ip_points(docs: DataFrame) -> DataFrame:
    """(doc_id, ip32) — the derived addresses."""
    return docs.select("doc_id", _ip32_col().alias("ip32"))


def subnet_rollup(docs: DataFrame, prefix_bits: int = 16, k: int = 20) -> DataFrame:
    """(subnet, cidr, n_docs, min_doc_id) — top-k /prefix_bits subnets
    by document count, (n desc, subnet asc) total order: the host-
    concentration ledger a polite crawler budgets fetch slots against
    (and a dedup pipeline reads for mirror farms). ``cidr`` is the
    dotted base address + '/bits', derived from the same integer on
    both engines; min_doc_id pins bucket membership."""
    bits = int(prefix_bits)
    if not 1 <= bits <= 32:
        raise ValueError(f"prefix_bits must be in [1, 32]: {prefix_bits!r}")
    if int(k) < 1:
        raise ValueError(f"k must be >= 1: {k!r}")
    shift = 1 << (32 - bits)
    sub = (
        ip_points(docs)
        .select(F.expr(f"ip32 DIV {shift}").alias("subnet"), "doc_id")
        .groupBy("subnet")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
    )
    return (
        sub.select(
            "subnet",
            F.concat(
                _dotted(F.col("subnet") * F.lit(shift)), F.lit(f"/{bits}")
            ).alias("cidr"),
            "n_docs",
            "min_doc_id",
        )
        .orderBy(F.desc("n_docs"), F.asc("subnet"))
        .limit(int(k))
    )


def subnet_rollup_sql(prefix_bits: int = 16, k: int = 20) -> str:
    bits = int(prefix_bits)
    shift = 1 << (32 - bits)
    return (
        f"WITH {_ip32_sql()}, "
        f"sub AS (SELECT ip32 // {shift} AS subnet, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(min(doc_id) AS BIGINT) AS min_doc_id FROM ips GROUP BY 1) "
        f"SELECT subnet, {_dotted_sql(f'subnet * {shift}')} || '/{bits}' AS cidr, "
        "n_docs, min_doc_id FROM sub "
        f"ORDER BY n_docs DESC, subnet ASC LIMIT {int(k)}"
    )


def ip_range_buckets(
    docs: DataFrame, edges: Sequence[int] = (1 << 30, 1 << 31, 3 << 30)
) -> DataFrame:
    """(bucket, from_ip, to_ip, n, min_doc_id) — the ES ``ip_range``
    aggregation: always-present [from, to) address buckets (bucket i
    covers [edges[i-1], edges[i]), bucket 0 starts at 0.0.0.0, the last
    is unbounded to 2^32). One integer comparison chain per row + ONE
    conditional-agg pass; empty buckets report n=0 / NULL min_doc_id
    (ES always-present semantics). from_ip/to_ip are dotted quads
    derived from the edge integers."""
    es = [int(x) for x in edges]
    if not es or any(es[i] >= es[i + 1] for i in range(len(es) - 1)) or es[0] <= 0 or es[-1] >= _IP_MAX:
        raise ValueError(f"edges must be ascending in (0, 2^32): {edges!r}")
    pts = ip_points(docs)
    bounds = [0] + es + [_IP_MAX]
    aggs = []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        cond = (F.col("ip32") >= F.lit(lo)) & (F.col("ip32") < F.lit(hi))
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_n{i}"))
        aggs.append(F.min(F.when(cond, F.col("doc_id"))).cast("long").alias(f"_m{i}"))
    row = pts.agg(*aggs)
    spark = docs.sparkSession
    meta = spark.createDataFrame(
        [(i, bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)],
        "bucket int, lo long, hi long",
    )
    n_case = "CASE " + " ".join(
        f"WHEN bucket = {i} THEN _n{i}" for i in range(len(bounds) - 1)
    ) + " END"
    m_case = "CASE " + " ".join(
        f"WHEN bucket = {i} THEN _m{i}" for i in range(len(bounds) - 1)
    ) + " END"
    return (
        meta.crossJoin(F.broadcast(row))
        .select(
            "bucket",
            _dotted(F.col("lo")).alias("from_ip"),
            _dotted(F.col("hi") - F.lit(1)).alias("to_ip"),
            F.expr(n_case).cast("long").alias("n"),
            F.expr(m_case).cast("long").alias("min_doc_id"),
        )
        .orderBy("bucket")
    )


def ip_range_buckets_sql(edges: Sequence[int] = (1 << 30, 1 << 31, 3 << 30)) -> str:
    es = [int(x) for x in edges]
    bounds = [0] + es + [_IP_MAX]
    conds = []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        conds.append(
            f"CAST(sum(CASE WHEN ip32 >= {lo} AND ip32 < {hi} THEN 1 ELSE 0 END) AS BIGINT) AS n{i}, "
            f"CAST(min(CASE WHEN ip32 >= {lo} AND ip32 < {hi} THEN doc_id END) AS BIGINT) AS m{i}"
        )
    sel = ", ".join(conds)
    rows = ", ".join(
        f"({i}, {bounds[i]}, {bounds[i + 1]})" for i in range(len(bounds) - 1)
    )
    n_case = "CASE " + " ".join(
        f"WHEN bucket = {i} THEN n{i}" for i in range(len(bounds) - 1)
    ) + " END"
    m_case = "CASE " + " ".join(
        f"WHEN bucket = {i} THEN m{i}" for i in range(len(bounds) - 1)
    ) + " END"
    return (
        f"WITH {_ip32_sql()}, "
        f"agg AS (SELECT {sel} FROM ips), "
        f"meta(bucket, lo, hi) AS (VALUES {rows}) "
        f"SELECT CAST(bucket AS INT) AS bucket, {_dotted_sql('lo')} AS from_ip, "
        f"{_dotted_sql('hi - 1')} AS to_ip, "
        f"CAST({n_case} AS BIGINT) AS n, CAST({m_case} AS BIGINT) AS min_doc_id "
        "FROM meta CROSS JOIN agg ORDER BY bucket"
    )
