"""Session transition graph + fixed-iteration PageRank — the link-graph
authority signal a web-corpus curation pipeline ranks domains with
(Common-Crawl-style pipelines filter by centrality over the host graph;
Page, Brin, Motwani & Winograd 1999 — public paper).

The reference is a bag-of-words ranker with no graph surface
(codesearch/storage/bm25_index.py) — this is a beyond-reference
training-data-pipeline operator, built Spark-first:

* **Graph**: nodes are the ``props.k`` values of the events table;
  an edge (src, dst, w) counts the transitions between CONSECUTIVE
  k-bearing events of one user within a session (inter-event gap <=
  ``gap_us``, the events_sessions definition). At web scale the same
  shape is the host link graph: nodes = domains, edges = hyperlink
  counts — the operator only assumes (src, dst, w).
* **PageRank**: ``iters`` fixed synchronous iterations of
  r'(v) = (1-d)/N + d * (sum_{(u,v)} r(u) * w(u,v)/outw(u) + dang/N)
  with the dangling mass redistributed uniformly (the standard
  stochastic-completion form, rank mass conserved at 1.0 every
  iteration — tested).

Determinism / cross-engine bit-identity: every float reduction is the
house canonical two-level md5-bucket fold (per-bucket fold ordered by
source node, then a fold over the <=4096 bucket sums ordered by
bucket — operators/stats.idf_detail_from_df's shape), spelled
``sum(x ORDER BY ...)`` in the DuckDB mirror. No task ever holds more
than ~in-degree/4096 contributions of one target, so a hub page with
10^8 in-links does not funnel into a single task — the same reason the
idf fold is two-level. Per-iteration ``localCheckpoint`` cuts the
lineage exactly like dedup's connected components (dedup.py): an
iterative plan never re-executes iteration 1 under iteration 5.

Scale shape: edges aggregate map-side (groupBy count over the lagged
pairs); the per-iteration join is ranks ⋈ edges on src (both keyed,
AQE-shufflable; ranks is node-sized, never corpus-sized); the dangling
mass is a 1-row broadcast (the house scalar-fold shape); the final
rank window runs over the node relation, bounded by the node space,
not the event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round6, round6_sql, sql_double

SESSION_GAP_US = 30 * 60 * 1_000_000  # timeseries.SESSION_GAP_US

# the events_json parity spelling: Spark get_json_object returns NULL
# on a missing key; the mirror TRY_CASTs the regexp capture (JSON-spec
# whitespace class — see timeseries.events_json_extract_sql)
_K_SQL = r"""TRY_CAST(regexp_extract(props, '"k":[ \t\n\r]*(\d+)', 1) AS BIGINT)"""


def _k_col():
    return F.get_json_object("props", "$.k").cast("bigint")


def session_edges(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """(src, dst, w) — transition counts between consecutive k-bearing
    events of one user within a session (gap <= ``gap_us``). Events
    without a ``k`` prop never join the graph."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    ev = (
        events.select(
            "user_id", "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            _k_col().alias("k"),
        )
        .where(F.col("k").isNotNull())
    )
    d = ev.select(
        F.col("k").alias("dst"),
        F.lag("k").over(w).alias("src"),
        (F.col("us") - F.lag("us").over(w)).alias("gap"),
    )
    return (
        d.where(F.col("src").isNotNull() & (F.col("gap") <= int(gap_us)))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("w"))
    )


def session_edges_sql(gap_us: int = SESSION_GAP_US) -> str:
    return (
        f"WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, "
        f"{_K_SQL} AS k FROM events), "
        "kv AS (SELECT * FROM ev WHERE k IS NOT NULL), "
        "d AS (SELECT k AS dst, "
        "lag(k) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src, "
        "us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap "
        "FROM kv) "
        "SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM d "
        f"WHERE src IS NOT NULL AND gap <= {int(gap_us)} "
        "GROUP BY src, dst ORDER BY src, dst"
    )


def session_graph_summary(events: DataFrame,
                          gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Gate surface for the graph itself: the full ordered edge list."""
    return session_edges(events, gap_us).orderBy("src", "dst")


def _bucket(col: str):
    # canonical fold bucket: first 3 hex chars of md5(str(node))
    return F.substring(
        F.md5(F.encode(F.col(col).cast("string"), "utf-8")), 1, 3
    )


def _fold2(df: DataFrame, group_cols, ord_col: str, val_col: str,
           out_col: str) -> DataFrame:
    """Canonical two-level fold of ``val_col`` ordered by ``ord_col``
    within ``group_cols`` (stats.idf_detail_from_df's shape): fold per
    md5-prefix bucket in ord order, then fold the <=4096 bucket sums in
    bucket order. Bit-stable under any partitioning; no task holds more
    than ~group-size/4096 values."""
    lvl1 = df.groupBy(*group_cols, _bucket(ord_col).alias("_b")).agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col(ord_col).alias("o"),
                                        F.col(val_col).alias("v")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("_s")
    )
    agg = F.aggregate(
        F.array_sort(F.collect_list(F.struct("_b", "_s"))),
        F.lit(0.0),
        lambda acc, x: acc + x["_s"],
    ).alias(out_col)
    if group_cols:
        return lvl1.groupBy(*group_cols).agg(agg)
    return lvl1.agg(agg)


def pagerank(
    events: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    gap_us: int = SESSION_GAP_US,
) -> DataFrame:
    """(rank, node, pr) — ``iters`` synchronous PageRank iterations over
    the session transition graph, dangling mass redistributed
    uniformly. Ordering binds the RAW final rank value (pr desc,
    node asc); pr is rounded for display only."""
    if not (0.0 <= float(damping) < 1.0):
        raise ValueError(f"damping must be in [0, 1): {damping!r}")
    if int(iters) < 1:
        raise ValueError(f"iters must be >= 1: {iters!r}")
    spark = events.sparkSession
    d = float(damping)

    edges = session_edges(events, gap_us)
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("outw"))
    ew = edges.join(outw, "src").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "rank int, node long, pr double")
    invn = 1.0 / float(n)
    base = (1.0 - d) / float(n)
    # dangling = edge endpoints with no out-edge (dst-only nodes)
    dang_nodes = nodes.join(
        outw.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint()

    ranks = nodes.select("node", F.lit(invn).alias("pr")).localCheckpoint()
    for _ in range(int(iters)):
        contrib = _fold2(
            ew.join(ranks, ew["src"] == ranks["node"]).select(
                "dst", "src",
                ((F.col("pr") * F.col("w").cast("double"))
                 / F.col("outw").cast("double")).alias("c"),
            ),
            ["dst"], "src", "c", "contrib",
        )
        dang = (
            _fold2(ranks.join(dang_nodes, "node", "left_semi"),
                   [], "node", "pr", "dm")
            .select(F.coalesce(F.col("dm"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(d)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0))
                       + F.col("dm") * F.lit(invn))
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    w = Window.orderBy(F.desc("pr"), F.asc("node"))
    return (
        ranks.withColumn("rank", F.row_number().over(w))
        .select("rank", "node", round6("pr").alias("pr"))
        .orderBy("rank")
    )


def pagerank_sql(
    iters: int = 5,
    damping: float = 0.85,
    gap_us: int = SESSION_GAP_US,
) -> str:
    """DuckDB mirror: the identical edge derivation + one unrolled CTE
    pair per iteration, every float reduction the identical two-level
    ``sum(x ORDER BY ...)`` fold and the identical
    ``base + d * (contrib + dang * (1.0/N))`` operand sequence."""
    if not (0.0 <= float(damping) < 1.0):
        raise ValueError(f"damping must be in [0, 1): {damping!r}")
    if int(iters) < 1:
        raise ValueError(f"iters must be >= 1: {iters!r}")
    d = sql_double(float(damping))
    parts = [
        f"WITH ev AS MATERIALIZED (SELECT user_id, event_id, epoch_us(ts) AS us, "
        f"{_K_SQL} AS k FROM events)",
        "kv AS MATERIALIZED (SELECT * FROM ev WHERE k IS NOT NULL)",
        "dd AS MATERIALIZED (SELECT k AS dst, "
        "lag(k) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src, "
        "us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap "
        "FROM kv)",
        "edges AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM dd "
        f"WHERE src IS NOT NULL AND gap <= {int(gap_us)} GROUP BY src, dst)",
        "ow AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY src)",
        "ew AS MATERIALIZED (SELECT e.src, e.dst, e.w, o.outw FROM edges e JOIN ow o USING (src))",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))",
        "ncnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes)",
        "dang AS MATERIALIZED (SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM edges))",
        "r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT nn FROM ncnt) AS pr FROM nodes)",
    ]
    for i in range(1, int(iters) + 1):
        p = i - 1
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT dst, sum(s ORDER BY b) AS contrib FROM "
            f"(SELECT e.dst AS dst, substr(md5(CAST(e.src AS VARCHAR)), 1, 3) AS b, "
            f"sum((r.pr * CAST(e.w AS DOUBLE)) / CAST(e.outw AS DOUBLE) "
            f"ORDER BY e.src) AS s "
            f"FROM ew e JOIN r{p} r ON r.node = e.src "
            f"GROUP BY e.dst, substr(md5(CAST(e.src AS VARCHAR)), 1, 3)) "
            f"GROUP BY dst)"
        )
        parts.append(
            f"dg{i} AS MATERIALIZED (SELECT coalesce(sum(s ORDER BY b), 0.0) AS dm FROM "
            f"(SELECT substr(md5(CAST(r.node AS VARCHAR)), 1, 3) AS b, "
            f"sum(r.pr ORDER BY r.node) AS s "
            f"FROM r{p} r JOIN dang USING (node) GROUP BY 1))"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT n.node, "
            f"(1.0 - {d}) / (SELECT nn FROM ncnt) + {d} * "
            f"(coalesce(c.contrib, 0.0) + (SELECT dm FROM dg{i}) * "
            f"(1.0 / (SELECT nn FROM ncnt))) AS pr "
            f"FROM nodes n LEFT JOIN c{i} c ON c.dst = n.node)"
        )
    last = f"r{int(iters)}"
    return (
        ", ".join(parts) + " "
        f"SELECT CAST(row_number() OVER (ORDER BY pr DESC, node ASC) AS INT) AS rank, "
        f"node, {round6_sql('pr')} AS pr FROM {last} ORDER BY pr DESC, node ASC"
    )
