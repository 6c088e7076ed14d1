"""CLI entry point (cli/main.py:44-212 analog) + F8 entry validation:
build -> search -> stats round trip on a tiny corpus, unknown enum /
filter values error on the CLI path and drop on the API path."""

import json

import pytest

from distributedcodesearchengine_spark.api import SearchEngine
from distributedcodesearchengine_spark.build.indexer import build_index_inmem
from distributedcodesearchengine_spark.cli import main
from distributedcodesearchengine_spark.sources.corpus import generate_pages


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    pages_dir = str(base / "pages")
    index_dir = str(base / "idx")
    generate_pages(spark, 200, seed=21, parts=2).write.parquet(pages_dir)
    rc = main(["build", "--input", pages_dir, "--index", index_dir], spark=spark)
    assert rc == 0
    return index_dir


def test_cli_search(built, spark, capsys):
    rc = main(
        ["search", "parse json", "--index", built, "--limit", "5", "--json"],
        spark=spark,
    )
    assert rc == 0
    lines = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5
    assert [r["rank"] for r in lines] == [1, 2, 3, 4, 5]
    assert lines[0]["score"] >= lines[-1]["score"]


def test_cli_stats(built, spark, capsys):
    rc = main(["stats", "--index", built], spark=spark)
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_docs"] == 200 and out["vocab_size"] > 0
    stages = {b["stage"] for b in out["build"]}
    assert {"docs", "tf", "terms", "postings"} <= stages


def test_cli_unknown_scorer_errors(built, spark, capsys):
    rc = main(
        ["search", "q", "--index", built, "--scorer", "bogus"], spark=spark
    )
    assert rc == 2
    assert "unknown scorer" in capsys.readouterr().err


def test_cli_unknown_lang_errors(built, spark, capsys):
    rc = main(["search", "q", "--index", built, "--lang", "xx"], spark=spark)
    assert rc == 2
    assert "unknown lang" in capsys.readouterr().err


def test_api_drop_mode_ignores_unknown_lang(spark):
    pages = generate_pages(spark, 120, seed=22, parts=2)
    engine = SearchEngine(build_index_inmem(spark, pages))
    kept = engine.search("parse json", limit=5, on_invalid="drop", lang="xx")
    plain = engine.search("parse json", limit=5)
    assert [r["doc_id"] for r in kept.collect()] == [
        r["doc_id"] for r in plain.collect()
    ]
    with pytest.raises(ValueError, match="unknown lang"):
        engine.search("parse json", limit=5, lang="xx")


def test_cli_suggest(built, spark, capsys):
    rc = main(["suggest", "al", "--index", built, "--limit", "5"], spark=spark)
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert 0 < len(lines) <= 5
    dfs, terms = [], []
    for l in lines:
        df_s, term = l.split()
        dfs.append(int(df_s)); terms.append(term)
    assert all(t.startswith("al") for t in terms)
    assert dfs == sorted(dfs, reverse=True)


def test_cli_quoted_phrase_search(built, spark, capsys):
    rc = main(
        ["search", '"alalal alalal"', "--index", built, "--limit", "3", "--json"],
        spark=spark,
    )
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert rows and rows[0]["rank"] == 1


def test_cli_build_sharded_index_and_scorer(spark, tmp_path_factory, capsys):
    """--sharded-index persists the doc-range-sharded serving layout;
    search --scorer sharded serves from it rank- and score-identically
    to the exact scorer (healthy, unknown-token and filtered queries —
    the last two via the documented exact-path fallback)."""
    import os

    from distributedcodesearchengine_spark.build.checkpoint import (
        BuildState,
        load_index,
    )

    base = tmp_path_factory.mktemp("cli_shard")
    pages_dir = str(base / "pages")
    index_dir = str(base / "idx")
    generate_pages(spark, 200, seed=33, parts=2).write.parquet(pages_dir)
    rc = main(
        ["build", "--input", pages_dir, "--index", index_dir, "--sharded-index"],
        spark=spark,
    )
    assert rc == 0
    capsys.readouterr()
    assert os.path.exists(os.path.join(index_dir, "sharded"))

    idx = load_index(spark, index_dir)
    assert "sharded" in idx.extras and idx.extras["sharded_width"] == 65536
    engine = SearchEngine(idx)
    for q in ["parse json", "alalal alanal", "zzzznotaword"]:
        a = [
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in engine.search(q, limit=5, scorer="sharded").collect()
        ]
        b = [
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in engine.search(q, limit=5, scorer="exact").collect()
        ]
        assert a == b, q
    # metadata filters take the exact path (F4/F5 staging) — identical
    a = [
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in engine.search("parse json", limit=5, scorer="sharded", lang="en").collect()
    ]
    b = [
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in engine.search("parse json", limit=5, scorer="exact", lang="en").collect()
    ]
    assert a == b

    # CLI surface + resume no-op for the sharded stage
    rc = main(
        ["search", "parse json", "--index", index_dir, "--scorer", "sharded", "--json"],
        spark=spark,
    )
    assert rc == 0
    rows = [
        json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    assert rows and rows[0]["rank"] == 1
    rc = main(
        ["build", "--input", pages_dir, "--index", index_dir, "--sharded-index"],
        spark=spark,
    )
    assert rc == 0
    st = BuildState(spark, index_dir).read()
    assert st.where("stage = 'sharded'").count() == 1


def test_cli_build_phrase_index_and_quoted_search(spark, tmp_path_factory, capsys):
    """--phrase-index persists the compressed positional index; quoted
    search then serves from it and ranks identically to the tokens-scan
    path; a resume re-run skips the positional stage."""
    import os

    base = tmp_path_factory.mktemp("cli_pos")
    pages_dir = str(base / "pages")
    index_dir = str(base / "idx")
    generate_pages(spark, 150, seed=77, parts=2).write.parquet(pages_dir)
    rc = main(
        ["build", "--input", pages_dir, "--index", index_dir, "--phrase-index"],
        spark=spark,
    )
    assert rc == 0
    capsys.readouterr()
    assert os.path.exists(os.path.join(index_dir, "positional"))

    from distributedcodesearchengine_spark.build.checkpoint import load_index
    from distributedcodesearchengine_spark.operators.phrase import bm25_phrase_topk

    idx = load_index(spark, index_dir)
    assert "positional" in idx.extras
    served = bm25_phrase_topk(idx, "alalal alalal", k=5).collect()
    idx_scan = load_index(spark, index_dir)
    idx_scan.extras.pop("positional")
    scanned = bm25_phrase_topk(idx_scan, "alalal alalal", k=5).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in served] == [
        (r["rank"], r["doc_id"], r["score"]) for r in scanned
    ]
    assert served  # phrase exists in the generated corpus

    # resume: no stage recomputation (fast no-op incl. positional)
    rc = main(
        ["build", "--input", pages_dir, "--index", index_dir, "--phrase-index"],
        spark=spark,
    )
    assert rc == 0
    from distributedcodesearchengine_spark.build.checkpoint import BuildState

    st = BuildState(spark, index_dir).read()
    n_pos_rows = st.where("stage = 'positional'").count()
    assert n_pos_rows == 1  # second run appended no new state row


def test_cli_curate_writes_packed_survivors(spark, tmp_path_factory, capsys):
    base = tmp_path_factory.mktemp("curate")
    src, out = str(base / "docs"), str(base / "packed")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    rc = main(
        ["curate", "--input", src, "--output", out, "--budget", "256"],
        spark=spark,
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["n_input"] == 500
    assert 0 < report["n_survivors"] < 500
    packed = spark.read.parquet(out)
    assert set(packed.columns) == {"doc_id", "lang", "n_tokens", "start_offset", "bin_id"}
    rows = packed.orderBy("doc_id").collect()
    # offsets are the prefix sum of survivor lengths, bins follow offsets
    acc = 0
    for r in rows:
        assert r.start_offset == acc and r.bin_id == acc // 256
        acc += r.n_tokens
    assert report["n_tokens"] == acc


def test_cli_curate_missing_columns_errors(spark, tmp_path_factory, capsys):
    base = tmp_path_factory.mktemp("curate_bad")
    src = str(base / "docs")
    spark.range(5).write.parquet(src)
    rc = main(["curate", "--input", src, "--output", str(base / "o")], spark=spark)
    assert rc == 2
    assert "missing columns" in capsys.readouterr().err


def test_cli_version(capsys):
    rc = main(["version"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["name"] == "spark-bm25" and out["version"]


def test_cli_worker_drains_pages_dir(spark, tmp_path_factory, capsys):
    """`worker` is the reference queue-consumer loop: drain what exists
    (run_once mode) into a queryable streaming index."""
    base = tmp_path_factory.mktemp("worker")
    pages_dir = str(base / "pages")
    generate_pages(spark, 80, seed=61, parts=2).write.parquet(pages_dir)
    rc = main(
        ["worker", "--input", pages_dir, "--index", str(base / "sidx"),
         "--checkpoint", str(base / "ckpt")],
        spark=spark,
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["n_docs"] == 80


def test_cli_similar(spark, built, capsys):
    rc = main(
        ["similar", "2", "--index", built, "--limit", "5", "--json"],
        spark=spark,
    )
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.splitlines()]
    assert rows and rows[0]["rank"] == 1
    assert all(r["doc_id"] != 2 for r in rows)


def test_cli_eval_metrics(built, spark, capsys):
    import json as _json

    rc = main(
        ["eval", "--index", built, "--queries", '{"1": "parse json"}', "--k", "5"],
        spark=spark,
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    m = out["metrics"][0]
    assert m["query_id"] == 1 and 0.0 <= m["ndcg"] <= 1.0 and 0.0 <= m["recall"] <= 1.0
    # malformed queries -> exit 2 with an error line
    rc = main(["eval", "--index", built, "--queries", "not json"], spark=spark)
    assert rc == 2


def test_cli_query_string(built, spark, capsys):
    rc = main(
        ["search", '+parse "parse json" js* -zzqx json^2', "--index", built,
         "--limit", "5", "--json", "--query-string"],
        spark=spark,
    )
    assert rc == 0
    lines = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert lines and [r["rank"] for r in lines] == list(range(1, len(lines) + 1))


def test_cli_query_string_invalid_is_error(built, spark, capsys):
    rc = main(
        ["search", '-"parse json"', "--index", built, "--query-string"],
        spark=spark,
    )
    assert rc == 2
    assert "unsupported" in capsys.readouterr().err


def test_cli_similarity_models(built, spark, capsys):
    for model in ("dfr", "classic"):
        rc = main(
            ["similarity", "parse json", "--index", built, "--model", model,
             "--limit", "3"],
            spark=spark,
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 3 and out[0].lstrip().startswith("1")


def test_cli_autocomplete(built, spark, capsys):
    rc = main(
        ["autocomplete", "parse js", "--index", built, "--limit", "5"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "parse js" in out
