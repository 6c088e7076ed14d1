"""Loaders for the driver-provided parquet testdata tables.

Tables at ``/root/testdata/sf{0.001,0.01,0.1}/``:
``region nation customer supplier part orders lineitem events documents
embeddings`` (TESTDATA.md). ``documents(doc_id, text, lang, source,
n_chars)`` doubles as a second corpus for the DuckDB-oracle operator
checks in ``__spark_entry__.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_input_table(
    spark: SparkSession,
    path_or_ident: str,
    snapshot_id: int = None,
    as_of_ts_ms: int = None,
) -> DataFrame:
    """Corpus-input reader (north rule: Iceberg tables of web pages).

    ``DCSE_TABLE_FORMAT=iceberg`` reads through the Iceberg DataSource
    (catalog identifiers like ``prod.web.pages`` or path-based tables —
    Catalyst then gets Iceberg's partition/file pruning and snapshot
    isolation for free); the sandbox default is plain parquet (no
    Iceberg runtime jars here). The engine's own index layout stays
    parquet-partitioned regardless — segment files are engine-internal,
    like Lucene's, and never read by user SQL.

    ``snapshot_id`` / ``as_of_ts_ms`` pin an Iceberg SNAPSHOT (time
    travel — the public ``snapshot-id`` / ``as-of-timestamp`` read
    options): a rebuild over yesterday's corpus state is then exactly
    reproducible even while the crawl keeps appending, which is what
    makes an index build auditable against a moving table. Ignored on
    the parquet path (plain directories have no snapshot lineage)."""
    fmt = os.environ.get("DCSE_TABLE_FORMAT", "parquet")
    if fmt == "iceberg":
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", int(snapshot_id))
        elif as_of_ts_ms is not None:
            reader = reader.option("as-of-timestamp", int(as_of_ts_ms))
        if "/" in path_or_ident:
            return reader.load(path_or_ident)
        if snapshot_id is not None or as_of_ts_ms is not None:
            return reader.load(path_or_ident)
        return spark.read.table(path_or_ident)
    return spark.read.parquet(path_or_ident)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_input_table(spark, f"{sf_dir}/{name}.parquet")


def documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents`` table to the pages shape.

    ``url`` := a deterministic per-doc key that preserves doc_id order
    (zero-padded doc_id), so the engine's url-rank doc ids equal the
    table's own doc_id — which keeps the DuckDB oracles simple.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.format_string("doc://corpus/%012d", F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><head><title>doc</title></head><body><p>"),
                          F.col("text"), F.lit("</p></body></html>")), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("source"),
    )
