"""Custom stateful streaming operator via ``applyInPandasWithState``
(the driver brief's "applyInPandasWithState for custom stateful
operators").

``start_site_totals_stream`` maintains a RUNNING per-site corpus
counter over the pages stream: state = (n_docs, total_chars) per site,
updated per micro-batch, emitted in update mode. The state store lives
in the checkpoint, so totals survive restarts and continue across
separate stream runs — the streaming analog of the reference's
``/stats`` counters (api/server.py:250-280) kept incrementally instead
of recomputed.

State size = O(#sites), independent of stream length — the operator can
run forever. GroupStateTimeout is NoTimeout: site totals never expire
(an idle-site TTL would set a ProcessingTimeTimeout and drop state in
the timeout branch)."""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import PAGES

OUTPUT_SCHEMA = "site string, n_docs long, total_chars long"
STATE_SCHEMA = "n_docs long, total_chars long"


def _update_site_totals(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # fillna: a null text reaches the UDF as NaN from .str.len()
        # (file sources ignore nullable=False) and int(NaN) would
        # crash-loop the stream on checkpoint replay of the same file
        total += int(pdf["text"].str.len().fillna(0).sum())
    state.update((int(n), int(total)))
    yield pd.DataFrame({"site": [key[0]], "n_docs": [n], "total_chars": [total]})


def start_site_totals_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """readStream(pages dir) -> per-site running totals, written per
    micro-batch to ``out_dir/batch=<id>`` via foreachBatch (idempotent
    overwrite per batch id; the memory sink cannot recover from a
    checkpoint, a foreachBatch parquet writer can). The latest batch
    containing a site holds its current running total — totals are
    monotonic, so ``max`` per site reads the current value. Returns the
    StreamingQuery."""
    stream = spark.readStream.schema(PAGES).parquet(input_dir)
    sites = stream.select(
        F.regexp_extract("url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1).alias("site"), "text"
    )
    totals = sites.groupBy("site").applyInPandasWithState(
        _update_site_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def write_batch(batch_df, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return (
        totals.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
