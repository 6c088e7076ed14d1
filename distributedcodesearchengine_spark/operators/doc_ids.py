"""Deterministic dense doc-id assignment at scale.

The reference's docID is the corpus insertion position
(``codesearch/storage/bm25_index.py:38-41,97-99``). For a distributed,
re-runnable build we define ``doc_id = rank of url`` in the global url
order (urls are unique after dedup) — deterministic regardless of input
partitioning, and it pins the rank tie-break order (SURVEY §7.1 M1).

A naive ``row_number() OVER (ORDER BY url)`` funnels 10^12 rows through a
single partition. Instead: range-repartition by url (disjoint sorted
ranges), count rows per partition (small job), turn counts into
cumulative offsets, then ``row_number`` windowed *per partition* plus the
broadcast offset — fully parallel, one extra small job. The intermediate
is persisted so the range boundaries (sampled by RangePartitioner) are
identical across the two jobs.
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
) -> DataFrame:
    """Add a dense 0-based ``doc_id`` = rank of ``order_col``.

    ``dedup=True`` also drops duplicate keys INSIDE the same range
    shuffle (equal keys land in the same range partition, so a lag
    window finds them locally) — one shuffle where dropDuplicates +
    repartitionByRange would take two, and the dedup shuffle never
    carries payload columns the caller already projected away. Matches
    the reference's first-wins add-time dedup (bm25_index.py:91-92);
    which duplicate survives is arbitrary-but-single, like the
    reference's dict insert.

    Returns a persisted DataFrame (caller should write it out or
    unpersist when done).
    """
    spark = df.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    if dedup:
        wlag = Window.partitionBy("_pid").orderBy(order_col)
        ranged = ranged.withColumn("_prev", F.lag(order_col).over(wlag)).where(
            F.col("_prev").isNull() | (F.col("_prev") != F.col(order_col))
        ).drop("_prev")
    ranged = ranged.persist()
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["cnt"]
    offmap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        ranged.withColumn(
            "doc_id",
            (F.row_number().over(w) - 1 + offmap[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
    )
