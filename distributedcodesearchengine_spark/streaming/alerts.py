"""Streaming percolator — alert routing over the crawl stream.

The percolator (operators/percolate: docs matched against a REGISTERED
query set) turned into its natural serving form: every arriving
micro-batch of pages is percolated against the saved searches and the
(doc, query) hits append to an alerts directory — "which topic
monitors does this new page trigger?", evaluated as pages arrive
instead of per user query. This is the ES percolate + watcher
composition (reference analog: the repo serves forward search only;
alerting is the standard production sibling).

Shape per batch (all the batch-mode guarantees carried over):
- tokenize once (the Arrow-batched UDF lane);
- percolate / percolate_phrase — the stored-query relation broadcasts,
  the doc side explodes distinct tokens once, phrase verification
  touches candidates only;
- idempotent append: hits write under ``batch=<id>`` so a redelivered
  micro-batch overwrites its own subdirectory instead of duplicating
  alerts (the IncrementalIndexer overwrite-by-batch discipline);
- ``alerts()`` reads the accumulated hits as one DataFrame.

At scale each micro-batch is bounded by the trigger, the query set is
the broadcast side, and nothing ever rescans history.
"""

from __future__ import annotations

import os
from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import PAGES


class StreamingPercolator:
    """foreachBatch handler appending percolator hits per batch."""

    def __init__(
        self,
        spark: SparkSession,
        alerts_dir: str,
        queries: Dict[int, str],
        phrase: bool = True,
    ):
        if not queries:
            raise ValueError("need a non-empty stored-query set")
        self.spark = spark
        self.alerts_dir = alerts_dir
        self.queries = dict(queries)
        self.phrase = bool(phrase)
        os.makedirs(alerts_dir, exist_ok=True)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from ..functions.udfs import extract_text_udf, tokenize_udf
        from ..operators.percolate import percolate, percolate_phrase

        if batch.isEmpty():
            return
        docs = batch.select(
            "url",
            tokenize_udf(extract_text_udf(F.col("html"))).alias("tokens"),
        ).withColumn(
            # stable per-url id inside the batch: the url IS the alert
            # key; a numeric doc_id only exists for the percolate call
            "doc_id",
            F.abs(F.xxhash64("url")),
        )
        fn = percolate_phrase if self.phrase else percolate
        hits = fn(docs.select("doc_id", "tokens"), self.queries)
        out = (
            hits.join(docs.select("doc_id", "url"), "doc_id")
            .select(
                "url",
                "query_id",
                F.lit(int(batch_id)).cast("long").alias("batch"),
            )
        )
        # overwrite-by-batch idempotency: a redelivered batch id
        # replaces its own alerts instead of appending duplicates
        out.write.mode("overwrite").parquet(
            f"{self.alerts_dir}/batch={int(batch_id)}"
        )

    def alerts(self) -> DataFrame:
        subdirs = [
            f"{self.alerts_dir}/{d}"
            for d in sorted(os.listdir(self.alerts_dir))
            if d.startswith("batch=")
        ]
        if not subdirs:
            return self.spark.createDataFrame(
                [], "url string, query_id int, batch long"
            )
        return self.spark.read.parquet(*subdirs).select(
            "url", "query_id", "batch"
        )


def start_alert_stream(
    spark: SparkSession,
    input_dir: str,
    alerts_dir: str,
    checkpoint_dir: str,
    queries: Dict[int, str],
    phrase: bool = True,
    available_now: bool = True,
):
    """readStream(pages dir) -> foreachBatch percolator alerts."""
    perc = StreamingPercolator(spark, alerts_dir, queries, phrase=phrase)
    stream = (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(perc.process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), perc
