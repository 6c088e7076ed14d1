"""Deterministic dense doc-id assignment at scale.

The reference's docID is the corpus insertion position
(``codesearch/storage/bm25_index.py:38-41,97-99``). For a distributed,
re-runnable build we define ``doc_id = rank of url`` in the global url
order (urls are unique after dedup) — deterministic regardless of input
partitioning, and it pins the rank tie-break order (SURVEY §7.1 M1).

A naive ``row_number() OVER (ORDER BY url)`` funnels 10^12 rows through
a single partition. ``repartitionByRange`` fixes the funnel but its
RangePartitioner SAMPLES THE CHILD PLAN — re-executing every upstream
operator (measured: the extract+tokenize UDF ran twice per build) — and
the later ``Window.partitionBy(_pid)`` adds a SECOND full shuffle
because range partitioning doesn't satisfy the window's hash-clustered
distribution. Instead:

1. boundary job: sample ONLY the order column (a column-pruned parquet
   scan — callers attach expensive columns AFTER id assignment), pick
   ``num_partitions - 1`` boundary keys on the driver;
2. ``_pid`` = count of boundaries <= key (a tiny JVM array filter,
   monotonic in the key, so equal keys share a pid);
3. ONE hash shuffle on ``_pid`` — the dedup lag-window, the rank
   window, and the per-pid count aggregation all reuse that clustering
   with no further exchange;
4. per-pid counts -> cumulative offsets (small collect),
   ``doc_id = row_number within pid - 1 + offset``.

At ~10^5+ partitions replace the per-row array filter with a broadcast
range join against a boundaries table; up to a few thousand partitions
the literal array is cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assign_doc_ids(
    df: DataFrame,
    order_col: str = "url",
    num_partitions: int | None = None,
    dedup: bool = False,
    samples_per_partition: int = 200,
    dedup_tie=None,
) -> DataFrame:
    """Add a dense 0-based ``doc_id`` = rank of ``order_col``.

    ``dedup=True`` also drops duplicate keys inside the same shuffle
    (equal keys share a ``_pid``, so a lag window finds them locally) —
    the reference's add-time identity dedup (bm25_index.py:91-92).
    "First wins" has no stable meaning under distributed evaluation, so
    the survivor among equal keys is pinned by ``dedup_tie`` (a Column;
    the MIN tie value wins — pass e.g. ``F.md5(F.col('html'))`` to keep
    the min-content-hash variant, the same rule the streaming ingest
    uses, streaming/incremental.py:_dedup_urls). Without a tie column
    the pick among differing duplicate rows is arbitrary (only safe when
    duplicates are full-row identical). The tie key extends the rank
    window's sort too — a no-op for ranks, since keys are unique after
    dedup — so both window functions ride ONE sort.

    Returns a persisted DataFrame (caller should write it out or
    unpersist when done).
    """
    spark = df.sparkSession
    n_part = max(1, num_partitions or spark.sparkContext.defaultParallelism)

    keys = df.select(order_col)
    total = keys.count()
    boundaries: list = []
    if total > 0 and n_part > 1:
        frac = min(1.0, samples_per_partition * n_part / total)
        smp = sorted(
            r[0] for r in keys.sample(False, frac, seed=42).collect()
            if r[0] is not None
        )
        if smp:
            raw = [smp[int(len(smp) * i / n_part)] for i in range(1, n_part)]
            boundaries = sorted(set(raw))

    if boundaries:
        barr = F.array(*[F.lit(b) for b in boundaries])
        pid = F.size(F.filter(barr, lambda b: b <= F.col(order_col)))
    else:
        pid = F.lit(0)

    d = df.withColumn("_pid", pid).repartition(n_part, F.col("_pid"))
    sort_cols = [F.col(order_col)]
    if dedup and dedup_tie is not None:
        sort_cols.append(dedup_tie)
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    if dedup:
        d = d.withColumn("_prev", F.lag(order_col).over(w)).where(
            F.col("_prev").isNull() | (F.col("_prev") != F.col(order_col))
        ).drop("_prev")
    d = d.persist()
    counts = d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["cnt"]
    offmap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    return (
        d.withColumn(
            "doc_id",
            (F.row_number().over(w) - 1 + offmap[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
    )
