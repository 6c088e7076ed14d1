"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its paired
``oracle_sql()`` DuckDB statement on the same parquet tables, then
compares rows / schema / canonical value hash the way the driver does
(sort columns by name, sort rows by all columns, hash the values).

Usage:
    python tools/gate_check.py [sf_dir] [key ...]

Set GATE_CHECK_OUT=/path/to.json to also dump the per-key result map
as one JSON artifact (the committed GATE_r{N}_full.json evidence).
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(_canon(df), index=False).sum())


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> dict:
    res = {
        "rows_match": len(spark_pdf) == len(oracle_pdf),
        "schema_match": sorted(spark_pdf.columns) == sorted(oracle_pdf.columns),
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(oracle_pdf),
    }
    try:
        res["hash_match"] = _hash(spark_pdf) == _hash(oracle_pdf)
    except TypeError as e:
        res["hash_match"] = False
        res["err"] = f"canon: {e}"
    if res["rows_match"] and res["schema_match"] and not res["hash_match"]:
        # diagnose: exact cell diff after canonical sort
        a, b = _canon(spark_pdf), _canon(oracle_pdf)
        diffs = []
        for c in a.columns:
            if str(a[c].dtype) != str(b[c].dtype):
                diffs.append(f"dtype[{c}]: spark={a[c].dtype} oracle={b[c].dtype}")
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                neq = ~(
                    (av == bv) | (pd.isna(av) & pd.isna(bv))
                )
            else:
                neq = av != bv
            if neq.any():
                i = int(np.argmax(neq))
                diffs.append(
                    f"col[{c}] {int(neq.sum())} diffs, first@{i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r}"
                )
        res["diffs"] = diffs[:8]
    return res


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from distributedcodesearchengine_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oq = entry.oracle_sql()
    out = {}
    t_start = time.monotonic()
    for key, fn in qs.items():
        if only and key not in only:
            continue
        t0 = time.monotonic()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            out[key] = {"err": f"spark: {type(e).__name__}: {e}"}
            print(key, "->", out[key], flush=True)
            continue
        t_spark = time.monotonic() - t0
        sql = oq.get(key)
        if sql is None:
            out[key] = {"spark_rows": len(spark_pdf), "err": "no_oracle"}
        else:
            try:
                oracle_pdf = con.execute(sql).df()
            except Exception as e:  # noqa: BLE001
                out[key] = {"err": f"oracle: {type(e).__name__}: {e}"}
                print(key, "->", out[key], flush=True)
                continue
            out[key] = compare(spark_pdf, oracle_pdf)
        out[key]["spark_sec"] = round(t_spark, 2)
        out[key]["total_sec"] = round(time.monotonic() - t0, 2)
        print(key, "->", json.dumps(out[key], default=str), flush=True)

    bad = [
        k
        for k, v in out.items()
        if not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
    ]
    slow = sorted(out.items(), key=lambda kv: -kv[1].get("total_sec", 0))[:10]
    print(f"\nwall total: {time.monotonic() - t_start:.1f}s; slowest: "
          + ", ".join(f"{k}={v.get('total_sec')}s" for k, v in slow))
    print(f"{len(out) - len(bad)}/{len(out)} green; failing: {bad}")

    import os

    artifact = os.environ.get("GATE_CHECK_OUT")
    if artifact:
        payload = {
            "sf_dir": sf_dir,
            "n_keys": len(out),
            "n_green": len(out) - len(bad),
            "failing": bad,
            "wall_sec": round(time.monotonic() - t_start, 1),
            "results": out,
        }
        with open(artifact, "w") as f:
            json.dump(payload, f, indent=1, default=str)
        print(f"wrote {artifact}")

    # release the per-(sf_dir, session) persisted gate indexes — a no-op
    # for this short-lived process, but keeps the harness a correct
    # usage example for long-lived embedders of entry_queries
    from distributedcodesearchengine_spark.entry_queries import clear_index_cache

    clear_index_cache()


if __name__ == "__main__":
    main()
