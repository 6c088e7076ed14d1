"""Iceberg source seam e2e (north rule: the corpus arrives as an
Iceberg table of Common-Crawl-style web pages; sources/tables.py:28-33
routes reads through the Iceberg DataSource when
``DCSE_TABLE_FORMAT=iceberg``).

This sandbox ships no Iceberg runtime jars, so the test is opt-in and
skips cleanly. To run it where jars exist (standalone — it builds its
own catalog-enabled session, which cannot be bolted onto the shared
test session):

    DCSE_ICEBERG_TEST=1 python -m pytest tests/test_iceberg.py -q

with the jars bootstrapped at session build, e.g. for PySpark 4.x:

    spark.jars.packages = org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0

(or pre-place the runtime jar in $SPARK_HOME/jars). The session needs:

    spark.sql.extensions = org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
    spark.sql.catalog.local = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.local.type = hadoop
    spark.sql.catalog.local.warehouse = <dir>
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("DCSE_ICEBERG_TEST"),
    reason="set DCSE_ICEBERG_TEST=1 (standalone, with Iceberg runtime "
    "jars on the classpath — see module docstring)",
)


def test_iceberg_pages_roundtrip_and_build(tmp_path):
    """Write a pages corpus as an Iceberg table, read it back through
    the DCSE_TABLE_FORMAT=iceberg seam, and run a build + query over
    it — proving the seam end-to-end, not just the dispatch branch."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dcse-iceberg-e2e")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", str(tmp_path / "warehouse"))
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        pytest.skip("Iceberg runtime jars not on the classpath")

    from distributedcodesearchengine_spark.build.indexer import build_index_inmem
    from distributedcodesearchengine_spark.operators.scorer import bm25_topk
    from distributedcodesearchengine_spark.sources.corpus import generate_pages
    from distributedcodesearchengine_spark.sources.tables import read_input_table

    pages = generate_pages(spark, 100, seed=5, parts=2)
    pages.writeTo("local.web.pages").using("iceberg").createOrReplace()

    os.environ["DCSE_TABLE_FORMAT"] = "iceberg"
    try:
        got = read_input_table(spark, "local.web.pages")
        assert got.count() == 100
        assert set(pages.columns) <= set(got.columns)
        idx = build_index_inmem(spark, got)
        res = bm25_topk(idx, "parse json", k=5).collect()
        assert len(res) == 5 and res[0]["rank"] == 1

        # snapshot time travel: append a second batch, then pin the
        # pre-append snapshot — the build input must be the original
        # 100 rows even though the live table moved
        snap = (
            spark.sql("SELECT snapshot_id FROM local.web.pages.snapshots "
                      "ORDER BY committed_at DESC LIMIT 1")
            .first()["snapshot_id"]
        )
        generate_pages(spark, 40, seed=6, parts=1).writeTo(
            "local.web.pages"
        ).append()
        assert read_input_table(spark, "local.web.pages").count() == 140
        pinned = read_input_table(spark, "local.web.pages", snapshot_id=snap)
        assert pinned.count() == 100
    finally:
        os.environ.pop("DCSE_TABLE_FORMAT", None)
        spark.stop()
