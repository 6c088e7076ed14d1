"""spark-submit entry point (north rule: ``spark-submit --py-files``).

    spark-submit --master <cluster> \
        --py-files dist/distributedcodesearchengine_spark.zip \
        tools/submit_job.py build  --input <pages parquet> --index <dir>
    spark-submit ... tools/submit_job.py search "quoted or plain query" --index <dir>
    spark-submit ... tools/submit_job.py stats  --index <dir>

Thin shim over the package CLI: spark-submit owns the SparkSession
(master/executors/conf come from the submit command line), the CLI does
the work. The package itself is resolved from the --py-files zip on the
driver and every executor — no repo checkout needed on the cluster.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> int:
    # engine-standard session settings that the submit command line does
    # not own (master / memory / shuffle partitions stay with
    # spark-submit): Arrow exchanges for the pandas/mapInArrow stages,
    # and the AQE coalescing floor that keeps a single query's tiny
    # term-pruned shuffle from being squeezed onto 1-2 tasks
    # (session.get_spark uses the same values)
    b = (
        SparkSession.builder
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = b.getOrCreate()
    from distributedcodesearchengine_spark.cli import main as cli_main

    return cli_main(sys.argv[1:], spark=spark)


if __name__ == "__main__":
    sys.exit(main())
