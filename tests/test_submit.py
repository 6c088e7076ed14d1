"""End-to-end ``spark-submit --py-files`` run (the north rule's job
submission mode): package the engine into a zip, then build + query an
index through ``spark-submit`` from a working directory OUTSIDE the
repo, so the only source of the package is the shipped zip."""

import json
import os
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)


def test_pyfiles_zip_deterministic(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    import make_pyfiles

    a = make_pyfiles.build(tmp_path / "a.zip")
    b = make_pyfiles.build(tmp_path / "b.zip")
    assert a.read_bytes() == b.read_bytes()
    names = zipfile.ZipFile(a).namelist()
    assert "distributedcodesearchengine_spark/cli.py" in names
    assert not [n for n in names if n.startswith("tests/")]


def _submit(args, cwd, zip_path, timeout=420):
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    return subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(REPO / "tools" / "submit_job.py"),
            *args,
        ],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout,
    )


def test_spark_submit_build_and_search(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    import make_pyfiles

    zip_path = make_pyfiles.build(tmp_path / "dcse.zip")

    # corpus written by the in-process session (pure function of seed)
    from distributedcodesearchengine_spark.sources.corpus import generate_pages

    from conftest import SF_DIR  # noqa: F401 (ensures conftest import side effects)
    from distributedcodesearchengine_spark.session import get_spark

    spark = get_spark("gen-submit", master="local[4]", shuffle_partitions=8)
    pages_dir = str(tmp_path / "pages")
    generate_pages(spark, 200, seed=41, parts=4).write.mode("overwrite").parquet(
        pages_dir
    )

    idx_dir = str(tmp_path / "idx")
    r = _submit(
        ["build", "--input", pages_dir, "--index", idx_dir], tmp_path, zip_path
    )
    assert r.returncode == 0, r.stderr[-2000:]
    built = json.loads(r.stdout.strip().splitlines()[-1])
    assert built["n_docs"] == 200

    r = _submit(
        ["search", "parse json", "--index", idx_dir, "--limit", "5", "--json"],
        tmp_path, zip_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(line) for line in r.stdout.strip().splitlines() if line.startswith("{")]
    assert len(rows) == 5
    assert rows[0]["rank"] == 1 and rows[0]["score"] >= rows[-1]["score"]
