"""ES distance_feature query tests (operators/geo
.bm25_distance_feature_topk): final = base + boost * pivot / (pivot +
haversine_km) over the whole BM25 kept set, positions derived from the
md5 seed column.
"""

import math

import pytest

from distributedcodesearchengine_spark.operators.geo import (
    GEO_EARTH_KM,
    bm25_distance_feature_topk,
)
from distributedcodesearchengine_spark.operators.scorer import bm25_topk
from tests.test_search_after import _index

TEXTS = [
    "apple banana apple cherry",
    "banana cherry durian fig grape",
    "apple fig",
    "grape grape grape durian",
]


def _py_pos(doc_id):
    import hashlib

    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    lat_md = int(h[0:8], 16) % 180000
    lon_md = int(h[8:16], 16) % 360000
    return lat_md / 1000.0 - 90.0, lon_md / 1000.0 - 180.0


def _py_hav(lat, lon, clat, clon):
    d2r = math.pi / 180.0
    a = (
        math.sin((clat - lat) * d2r / 2.0) ** 2
        + math.cos(lat * d2r) * math.cos(clat * d2r)
        * math.sin((clon - lon) * d2r / 2.0) ** 2
    )
    return 2.0 * GEO_EARTH_KM * math.asin(math.sqrt(a))


def test_feature_is_base_plus_saturated_distance(spark):
    idx = _index(spark, TEXTS)
    base = {r["doc_id"]: r["score"]
            for r in bm25_topk(idx, "apple banana", k=10).collect()}
    got = {r["doc_id"]: r
           for r in bm25_distance_feature_topk(
               idx, "apple banana", 40.0, -74.0, pivot_km=1000.0,
               boost=5.0, k=10).collect()}
    assert set(got) == set(base)
    for d, r in got.items():
        lat, lon = _py_pos(d)
        dist = _py_hav(lat, lon, 40.0, -74.0)
        assert r["dist_km"] == pytest.approx(dist, abs=1e-6)
        want = base[d] + 5.0 * (1000.0 / (1000.0 + dist))
        assert r["score"] == pytest.approx(want, abs=1e-6)


def test_degenerate_ranking_is_pure_proximity(spark):
    """OOV query: every base is 0 -> the ranking equals the geo
    nearest-neighbour order."""
    idx = _index(spark, TEXTS)
    rows = bm25_distance_feature_topk(
        idx, "zzznotaword", 40.0, -74.0, k=10).collect()
    assert all(r["base"] == 0.0 for r in rows)
    dists = [r["dist_km"] for r in rows]
    assert dists == sorted(dists)


def test_boost_zero_is_bm25_order(spark):
    idx = _index(spark, TEXTS)
    plain = [r["doc_id"] for r in bm25_topk(idx, "apple banana", k=10).collect()]
    feat = [r["doc_id"] for r in bm25_distance_feature_topk(
        idx, "apple banana", 40.0, -74.0, boost=0.0, k=10).collect()]
    assert feat == plain


def test_guards_and_empty(spark):
    idx = _index(spark, TEXTS)
    with pytest.raises(ValueError):
        bm25_distance_feature_topk(idx, "apple", 0.0, 0.0, pivot_km=0.0)
    with pytest.raises(ValueError):
        bm25_distance_feature_topk(idx, "apple", 0.0, 0.0, boost=-1.0)
    assert bm25_distance_feature_topk(idx, "!! ??", 0.0, 0.0).count() == 0
