"""Index fsck (build/fsck): a freshly-built persisted index passes every
invariant; targeted corruptions trip exactly the matching named check."""

import json
import os
import shutil

import pytest

from distributedcodesearchengine_spark.build.checkpoint import (
    build_index_persisted,
)
from distributedcodesearchengine_spark.build.fsck import fsck_index
from distributedcodesearchengine_spark.sources.corpus import generate_pages


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fsckidx"))
    pages = generate_pages(spark, 120, seed=7, parts=2)
    build_index_persisted(spark, pages, d, n_buckets=8)
    return d


def _by_name(report):
    return {c["name"]: c for c in report["checks"]}


def test_clean_index_passes(spark, built):
    report = fsck_index(spark, built)
    assert report["ok"], json.dumps(report, indent=2)
    names = set(_by_name(report))
    assert {
        "layout", "stats.n_docs", "stats.avgdl", "doc_ids.dense",
        "tf.unique", "tf.doc_refs", "tf.doc_len",
        "terms.unique", "terms.df_bounds", "terms.df_recount",
    } <= names


def test_corrupted_stats_fails_named_check(spark, built, tmp_path):
    bad = str(tmp_path / "bad")
    shutil.copytree(built, bad)
    # rewrite the stats row with a wrong n_docs
    srow = spark.read.parquet(os.path.join(bad, "stats")).first().asDict()
    srow["n_docs"] = int(srow["n_docs"]) + 5
    spark.createDataFrame([srow]).write.mode("overwrite").parquet(
        os.path.join(bad, "stats")
    )
    report = fsck_index(spark, bad)
    assert not report["ok"]
    byn = _by_name(report)
    assert not byn["stats.n_docs"]["ok"]
    # the unrelated invariants still hold
    assert byn["tf.unique"]["ok"] and byn["terms.df_recount"]["ok"]


def test_corrupted_terms_df_fails_recount(spark, built, tmp_path):
    bad = str(tmp_path / "bad2")
    shutil.copytree(built, bad)
    t = spark.read.parquet(os.path.join(bad, "terms"))
    from pyspark.sql import functions as F

    t2 = t.withColumn(
        "df", F.when(F.col("term") == t.first()["term"], F.col("df") + 1)
        .otherwise(F.col("df"))
    )
    t2.write.mode("overwrite").parquet(os.path.join(bad, "terms") + "_tmp")
    shutil.rmtree(os.path.join(bad, "terms"))
    os.rename(os.path.join(bad, "terms") + "_tmp", os.path.join(bad, "terms"))
    report = fsck_index(spark, bad)
    assert not report["ok"]
    assert not _by_name(report)["terms.df_recount"]["ok"]


def test_missing_stage_fails_layout(spark, built, tmp_path):
    bad = str(tmp_path / "bad3")
    shutil.copytree(built, bad)
    shutil.rmtree(os.path.join(bad, "terms"))
    report = fsck_index(spark, bad)
    assert not report["ok"]
    assert not _by_name(report)["layout"]["ok"]


def test_cli_fsck_exit_codes(spark, built, tmp_path, capsys):
    from distributedcodesearchengine_spark.cli import main as cli_main

    assert cli_main(["fsck", "--index", built], spark=spark) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["ok"]
    bad = str(tmp_path / "bad4")
    shutil.copytree(built, bad)
    shutil.rmtree(os.path.join(bad, "terms"))
    assert cli_main(["fsck", "--index", bad], spark=spark) == 2
