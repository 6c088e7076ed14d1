"""Snapshot/restore (build/snapshot): round-trip search identity, the
verify-before-trust protocol (tampered and truncated snapshots are
refused), the fsck gates on both ends, and the CLI exit codes."""

import glob
import json
import os
import shutil

import pytest

from distributedcodesearchengine_spark.build.checkpoint import (
    build_index_persisted,
    load_index,
)
from distributedcodesearchengine_spark.build.snapshot import (
    restore_index,
    snapshot_index,
    verify_snapshot,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk
from distributedcodesearchengine_spark.sources.corpus import generate_pages


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("snapidx"))
    pages = generate_pages(spark, 120, seed=7, parts=2)
    build_index_persisted(spark, pages, d + "/idx", n_buckets=8)
    return d


def _top(spark, index_dir, q="parse json"):
    idx = load_index(spark, index_dir)
    return [
        (r["doc_id"], r["score"])
        for r in bm25_topk(idx, q, k=5).collect()
    ]


def test_snapshot_restore_round_trip(spark, built):
    idx_dir, snap = f"{built}/idx", f"{built}/snap"
    baseline = _top(spark, idx_dir)
    manifest = snapshot_index(spark, idx_dir, snap)
    assert manifest["n_files"] > 0 and manifest["total_bytes"] > 0
    assert verify_snapshot(snap)["ok"]
    # destroy the live index, restore, results must be identical
    shutil.rmtree(idx_dir)
    restore_index(spark, snap, idx_dir)
    assert _top(spark, idx_dir) == baseline
    # restore over an EXISTING index also works (atomic replace)
    restore_index(spark, snap, idx_dir)
    assert _top(spark, idx_dir) == baseline
    # no stray temp/pre-restore dirs left behind
    assert not glob.glob(f"{idx_dir}.restore-tmp-*")
    assert not glob.glob(f"{idx_dir}.pre-restore-*")


def test_snapshot_refuses_existing_target(spark, built):
    with pytest.raises(FileExistsError):
        snapshot_index(spark, f"{built}/idx", f"{built}/snap")


def test_tampered_snapshot_refused(spark, built):
    snap2 = f"{built}/snap2"
    snapshot_index(spark, f"{built}/idx", snap2)
    victim = sorted(glob.glob(f"{snap2}/stats/*.parquet"))[0]
    data = open(victim, "rb").read()
    with open(victim, "wb") as f:
        f.write(data[:-1] + bytes([data[-1] ^ 0xFF]))
    rep = verify_snapshot(snap2)
    assert not rep["ok"] and any("md5 mismatch" in p for p in rep["problems"])
    with pytest.raises(RuntimeError, match="fails verification"):
        restore_index(spark, snap2, f"{built}/idx_should_not_exist")
    assert not os.path.exists(f"{built}/idx_should_not_exist")


def test_truncated_snapshot_refused(spark, built):
    snap3 = f"{built}/snap3"
    snapshot_index(spark, f"{built}/idx", snap3)
    victim = sorted(
        glob.glob(f"{snap3}/terms/**/*.parquet", recursive=True)
    )[0]
    os.remove(victim)
    rep = verify_snapshot(snap3)
    assert not rep["ok"] and any("missing file" in p for p in rep["problems"])


def test_snapshot_refuses_fsck_failing_index(spark, built, tmp_path):
    bad = str(tmp_path / "bad_idx")
    shutil.copytree(f"{built}/idx", bad)
    shutil.rmtree(f"{bad}/terms")  # layout check fails
    with pytest.raises(RuntimeError, match="fails fsck"):
        snapshot_index(spark, bad, str(tmp_path / "bad_snap"))
    assert not os.path.exists(str(tmp_path / "bad_snap"))


def test_cli_snapshot_restore(spark, built, capsys):
    from distributedcodesearchengine_spark.cli import main

    snap = f"{built}/cli_snap"
    rc = main(["snapshot", "--index", f"{built}/idx", "--out", snap])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_files"] > 0
    rc = main(["restore", "--snapshot", snap, "--index", f"{built}/idx"])
    assert rc == 0
    # failure paths exit 2 with an error line
    rc = main(["snapshot", "--index", f"{built}/idx", "--out", snap])
    assert rc == 2
    assert "error:" in capsys.readouterr().out
