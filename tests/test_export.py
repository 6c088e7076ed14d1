"""Export sink (operators/pipeline.export_shards / export_manifest):
layout, manifest integrity, determinism, re-run idempotence."""

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.functions.udfs import tokenize_udf
from distributedcodesearchengine_spark.operators.pipeline import (
    export_manifest,
    export_shards,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id", "text", "lang", "source", tokenize_udf("text").alias("tokens")
    ).persist()


def test_manifest_matches_python_recount(docs):
    man = {r["shard_id"]: r for r in export_manifest(docs, budget=4096).collect()}
    rows = sorted(
        (r["doc_id"], r["text"], len(r["tokens"])) for r in docs.collect()
    )
    # python mirror of the contiguous token-budget assignment
    off = 0
    shards = {}
    for doc_id, text, n in rows:
        sid = off // 4096
        h = hashlib.md5(text.encode()).hexdigest()
        s = shards.setdefault(sid, {"n_docs": 0, "n_tokens": 0, "h": "", "ids": []})
        s["n_docs"] += 1
        s["n_tokens"] += n
        s["h"] += h
        s["ids"].append(doc_id)
        off += n
    assert set(man) == set(shards)
    for sid, s in shards.items():
        m = man[sid]
        assert (m["n_docs"], m["n_tokens"]) == (s["n_docs"], s["n_tokens"])
        assert (m["min_doc"], m["max_doc"]) == (min(s["ids"]), max(s["ids"]))
        assert m["content_md5"] == hashlib.md5(s["h"].encode()).hexdigest()


def test_export_writes_layout_and_is_idempotent(docs, tmp_path):
    out = str(tmp_path / "exp")
    m1 = export_shards(docs, out, budget=4096)
    assert os.path.exists(f"{out}/manifest.json")
    with open(f"{out}/manifest.json") as f:
        on_disk = json.load(f)
    assert on_disk["n_shards"] == m1["n_shards"] > 1
    # every shard dir exists and holds exactly one data file
    for s in m1["shards"]:
        d = f"{out}/data/shard_id={s['shard_id']}"
        files = [x for x in os.listdir(d) if x.endswith(".parquet")]
        assert len(files) == 1, d
    # written rows == corpus, doc set per shard matches the manifest span
    spark = docs.sparkSession
    back = spark.read.parquet(f"{out}/data")
    assert back.count() == docs.count()
    got = {
        (r["shard_id"], r["n"], r["lo"], r["hi"])
        for r in back.groupBy("shard_id")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    }
    exp = {
        (s["shard_id"], s["n_docs"], s["min_doc"], s["max_doc"]) for s in m1["shards"]
    }
    assert got == exp
    # re-run: byte-identical manifest (deterministic overwrite)
    m2 = export_shards(docs, out, budget=4096)
    assert m1 == m2


def test_budget_controls_shard_count(docs):
    few = export_manifest(docs, budget=1 << 30).count()
    many = export_manifest(docs, budget=2048).count()
    assert few == 1 and many > few
