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
    spark = SparkSession.builder.getOrCreate()
    from distributedcodesearchengine_spark.cli import main as cli_main

    return cli_main(sys.argv[1:], spark=spark)


if __name__ == "__main__":
    sys.exit(main())
