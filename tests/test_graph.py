"""Session transition graph + fixed-iteration PageRank
(operators/graph.py): edge semantics, bit-identity against a pure-Python
replication of the canonical two-level folds, rank-mass conservation,
dangling handling, determinism under repartition, and the guards."""

import datetime as dt
import hashlib

import pytest

from distributedcodesearchengine_spark.functions.rounding import round6_py
from distributedcodesearchengine_spark.operators.graph import (
    pagerank,
    session_edges,
)

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _t(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


def _ev(event_id, user, minute, k, sec=0):
    props = "{}" if k is None else '{"k": %d}' % k
    return (event_id, _t(minute, sec), user, "click", 1.0, props)


def _py_pagerank(edges, iters=5, d=0.85):
    """Pure-Python replication of pagerank()'s canonical definition:
    two-level md5-bucket folds (src-ordered within bucket, bucket-ordered
    across) and the identical base + d*(contrib + dang/N) operand order."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    invn = 1.0 / float(n)
    base = (1.0 - d) / float(n)
    outw = {}
    for (s, t), w in edges.items():
        outw[s] = outw.get(s, 0) + w

    def bucket(x):
        return hashlib.md5(str(x).encode()).hexdigest()[:3]

    r = {v: invn for v in nodes}
    for _ in range(iters):
        per = {}
        for (s, t), w in edges.items():
            c = (r[s] * float(w)) / float(outw[s])
            per.setdefault((t, bucket(s)), []).append((s, c))
        bsums = {}
        for (t, b), lst in per.items():
            acc = 0.0
            for _, c in sorted(lst):
                acc += c
            bsums.setdefault(t, []).append((b, acc))
        contrib = {}
        for t, lst in bsums.items():
            acc = 0.0
            for _, sv in sorted(lst):
                acc += sv
            contrib[t] = acc
        dper = {}
        for v in nodes:
            if v not in outw:
                dper.setdefault(bucket(v), []).append(v)
        dlst = []
        for b, vs in dper.items():
            acc = 0.0
            for v in sorted(vs):
                acc += r[v]
            dlst.append((b, acc))
        dm = 0.0
        for _, sv in sorted(dlst):
            dm += sv
        r = {v: base + d * (contrib.get(v, 0.0) + dm * invn) for v in nodes}
    return r


def test_session_edges_semantics(spark):
    rows = [
        _ev(1, 1, 0, 10),
        _ev(2, 1, 1, 20),     # 10->20
        _ev(3, 1, 2, None),   # no k: never joins the graph, gap measured
                              # between the k-bearing neighbors directly
        _ev(4, 1, 3, 10),     # 20->10 (gap 2 min <= 30 min)
        _ev(5, 1, 59, 30),    # gap 56 min > 30 min: session break, no edge
        _ev(6, 2, 0, 10),
        _ev(7, 2, 1, 20),     # second 10->20 (other user)
    ]
    ev = spark.createDataFrame(rows, _SCHEMA)
    edges = {(r.src, r.dst): r.w for r in session_edges(ev).collect()}
    assert edges == {(10, 20): 2, (20, 10): 1}


def test_pagerank_matches_python_replication(spark):
    rows = [
        _ev(1, 1, 0, 1), _ev(2, 1, 1, 2), _ev(3, 1, 2, 3),
        _ev(4, 1, 3, 1), _ev(5, 1, 4, 3),
        _ev(6, 2, 0, 2), _ev(7, 2, 1, 1), _ev(8, 2, 2, 4),  # 4 is dangling
        _ev(9, 3, 0, 3), _ev(10, 3, 1, 2),
    ]
    ev = spark.createDataFrame(rows, _SCHEMA)
    edges = {(r.src, r.dst): r.w for r in session_edges(ev).collect()}
    expected = _py_pagerank(edges)
    got = {r.node: r.pr for r in pagerank(ev).collect()}
    assert set(got) == set(expected)
    for v, pr in expected.items():
        assert got[v] == round6_py(pr), v
    # rank mass conserved (on the rounded display values, to their grain)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_dangling_uniform_on_sink_only_graph(spark):
    # one edge 1->2; node 2 is dangling, its mass redistributes uniformly
    ev = spark.createDataFrame([_ev(1, 1, 0, 1), _ev(2, 1, 1, 2)], _SCHEMA)
    edges = {(1, 2): 1}
    expected = _py_pagerank(edges)
    got = {r.node: r.pr for r in pagerank(ev).collect()}
    for v, pr in expected.items():
        assert got[v] == round6_py(pr)
    # the sink holds more mass than the source
    assert got[2] > got[1]


def test_pagerank_deterministic_under_repartition(spark):
    rows = [
        _ev(i, u, m, k)
        for i, (u, m, k) in enumerate(
            [(1, 0, 5), (1, 1, 7), (1, 2, 5), (2, 0, 7), (2, 1, 9),
             (2, 2, 5), (3, 0, 9), (3, 1, 7)]
        )
    ]
    ev = spark.createDataFrame(rows, _SCHEMA)
    a = [(r.rank, r.node, r.pr) for r in pagerank(ev).collect()]
    b = [(r.rank, r.node, r.pr) for r in pagerank(ev.repartition(7)).collect()]
    assert a == b


def test_pagerank_empty_graph_and_guards(spark):
    ev = spark.createDataFrame([_ev(1, 1, 0, None)], _SCHEMA)
    out = pagerank(ev)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["rank", "node", "pr"]
    ev2 = spark.createDataFrame([_ev(1, 1, 0, 1)], _SCHEMA)
    with pytest.raises(ValueError):
        pagerank(ev2, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(ev2, iters=0)
