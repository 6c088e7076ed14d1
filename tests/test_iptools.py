"""IP family tests (operators/iptools — derived-IPv4 ip_range agg and
subnet concentration rollup)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.operators.iptools import (
    _IP_MAX,
    ip_points,
    ip_range_buckets,
    subnet_rollup,
)


def _docs(spark, n=40):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def _py_ip(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[16:24], 16)


def test_derivation_matches_python(spark):
    rows = ip_points(_docs(spark, 25)).collect()
    for r in rows:
        assert r["ip32"] == _py_ip(r["doc_id"])
        assert 0 <= r["ip32"] < _IP_MAX


def test_subnet_rollup_exact(spark):
    n = 60
    got = subnet_rollup(_docs(spark, n), prefix_bits=4, k=100).collect()
    # python replication: /4 -> top nibble of the 32-bit address
    buckets = {}
    for i in range(n):
        s = _py_ip(i) // (1 << 28)
        buckets.setdefault(s, []).append(i)
    want = sorted(
        ((s, len(ds), min(ds)) for s, ds in buckets.items()),
        key=lambda t: (-t[1], t[0]),
    )
    assert [(r["subnet"], r["n_docs"], r["min_doc_id"]) for r in got] == want
    # cidr strings carry the right base and mask
    for r in got:
        base = r["subnet"] * (1 << 28)
        assert r["cidr"].endswith("/4")
        assert r["cidr"].split("/")[0] == ".".join(
            str((base >> sh) & 0xFF) for sh in (24, 16, 8, 0)
        )
    # count conservation
    assert sum(r["n_docs"] for r in got) == n


def test_ip_range_always_present(spark):
    edges = [1 << 30, 1 << 31, 3 << 30]
    got = ip_range_buckets(_docs(spark, 30), edges=edges).collect()
    assert [r["bucket"] for r in got] == [0, 1, 2, 3]
    bounds = [0] + edges + [_IP_MAX]
    per = {b: [] for b in range(4)}
    for i in range(30):
        ip = _py_ip(i)
        for b in range(4):
            if bounds[b] <= ip < bounds[b + 1]:
                per[b].append(i)
    for r in got:
        ds = per[r["bucket"]]
        assert r["n"] == len(ds)
        assert r["min_doc_id"] == (min(ds) if ds else None)
    assert got[0]["from_ip"] == "0.0.0.0"
    assert got[3]["to_ip"] == "255.255.255.255"
    assert sum(r["n"] for r in got) == 30


def test_empty_bucket_reports_zero(spark):
    """A razor-thin bucket no derived ip lands in still appears."""
    got = ip_range_buckets(_docs(spark, 10), edges=[1, 2]).collect()
    thin = [r for r in got if r["bucket"] == 1][0]
    assert thin["n"] == 0 and thin["min_doc_id"] is None


def test_guards(spark):
    d = _docs(spark, 5)
    with pytest.raises(ValueError):
        ip_range_buckets(d, edges=[5, 5])
    with pytest.raises(ValueError):
        ip_range_buckets(d, edges=[0, 10])
    with pytest.raises(ValueError):
        ip_range_buckets(d, edges=[1, _IP_MAX])
    with pytest.raises(ValueError):
        subnet_rollup(d, prefix_bits=0)
    with pytest.raises(ValueError):
        subnet_rollup(d, k=0)


def test_layout_independence(spark):
    a = subnet_rollup(_docs(spark, 50).repartition(7), prefix_bits=6, k=10).collect()
    b = subnet_rollup(_docs(spark, 50).coalesce(1), prefix_bits=6, k=10).collect()
    assert a == b
