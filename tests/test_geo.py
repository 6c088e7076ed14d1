"""Geo family (operators/geo.py): derivation ranges and layout
independence, bbox membership vs a python recheck, haversine sanity on
known geometry, grid exactness/count conservation, and guards."""

import math

import pytest
from pyspark.sql import functions as F

from distributedcodesearchengine_spark.operators import geo


def _docs(spark, n=80):
    return spark.createDataFrame(
        [(i,) for i in range(n)], "doc_id long"
    )


def test_derivation_ranges_and_layout_independence(spark):
    d = _docs(spark)
    p1 = {r.doc_id: (r.lat_md, r.lon_md, r.lat, r.lon)
          for r in geo.geo_points(d).collect()}
    p2 = {r.doc_id: (r.lat_md, r.lon_md, r.lat, r.lon)
          for r in geo.geo_points(d.repartition(7)).collect()}
    assert p1 == p2
    for lat_md, lon_md, lat, lon in p1.values():
        assert 0 <= lat_md < 180000 and 0 <= lon_md < 360000
        assert -90.0 <= lat < 90.0 and -180.0 <= lon < 180.0


def test_bbox_membership(spark):
    d = _docs(spark)
    pts = {r.doc_id: (r.lat, r.lon) for r in geo.geo_points(d).collect()}
    got = {r.doc_id for r in geo.geo_bbox(d, -30.0, 30.0, -60.0, 60.0).collect()}
    exp = {
        i for i, (la, lo) in pts.items()
        if -30.0 <= la <= 30.0 and -60.0 <= lo <= 60.0
    }
    assert got == exp
    with pytest.raises(ValueError):
        geo.geo_bbox(d, 10.0, -10.0, 0.0, 1.0)


def test_haversine_known_geometry(spark):
    # one degree of longitude along the equator
    d = spark.createDataFrame([(0,)], "doc_id long")
    pts = d.select(
        geo._haversine_col(F.lit(0.0), F.lit(0.0), 0.0, 1.0).alias("km")
    ).collect()[0]
    assert pts.km == pytest.approx(
        geo.GEO_EARTH_KM * math.pi / 180.0, rel=1e-9
    )
    # antipodal: half the circumference
    half = d.select(
        geo._haversine_col(F.lit(0.0), F.lit(0.0), 0.0, 180.0).alias("km")
    ).collect()[0]
    assert half.km == pytest.approx(geo.GEO_EARTH_KM * math.pi, rel=1e-9)


def test_distance_topk_matches_python(spark):
    d = _docs(spark, 60)
    pts = {r.doc_id: (r.lat, r.lon) for r in geo.geo_points(d).collect()}

    def hav(la, lo, cla, clo):
        f = math.pi / 180.0
        a = (
            math.sin((cla - la) * f / 2.0) ** 2
            + math.cos(la * f)
            * math.cos(cla * f)
            * math.sin((clo - lo) * f / 2.0) ** 2
        )
        return 2.0 * geo.GEO_EARTH_KM * math.asin(math.sqrt(a))

    exp = sorted(
        ((hav(la, lo, 10.0, 20.0), i) for i, (la, lo) in pts.items())
    )[:5]
    got = geo.geo_distance_topk(d, 10.0, 20.0, k=5).collect()
    assert [r.doc_id for r in got] == [i for _, i in exp]
    for r, (dist, _) in zip(got, exp):
        assert r.dist_km == pytest.approx(dist, abs=1e-6)


def test_grid_exact_and_conserves_count(spark):
    d = _docs(spark, 100)
    rows = geo.geo_grid(d, cell_milli=30000).collect()
    assert sum(r.n for r in rows) == 100
    pts = {r.doc_id: (r.lat_md, r.lon_md)
           for r in geo.geo_points(d).collect()}
    exp = {}
    for i, (la, lo) in pts.items():
        key = (la // 30000, lo // 30000)
        n, mn = exp.get(key, (0, i))
        exp[key] = (n + 1, min(mn, i))
    got = {(r.cell_lat, r.cell_lon): (r.n, r.min_doc_id) for r in rows}
    assert got == exp
    with pytest.raises(ValueError):
        geo.geo_grid(d, cell_milli=0)


# --- geohash ------------------------------------------------------------------


def _ref_geohash(lat_frac, lon_frac, precision):
    """Canonical geohash by exact bisection over Fractions — the
    textbook algorithm, no floats anywhere."""
    from fractions import Fraction

    lat_lo, lat_hi = Fraction(-90), Fraction(90)
    lon_lo, lon_hi = Fraction(-180), Fraction(180)
    bits = []
    even = True  # longitude first
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon_frac >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat_frac >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(precision):
        v = 0
        for b in bits[i * 5 : i * 5 + 5]:
            v = v * 2 + b
        out.append(geo.GEOHASH32[v])
    return "".join(out)


def test_ref_geohash_is_canonical():
    """The test reference reproduces the classic published example
    (Wikipedia: 57.64911, 10.40744 -> u4pruydqqvj)."""
    from fractions import Fraction

    got = _ref_geohash(
        Fraction(5764911, 100000), Fraction(1040744, 100000), 11
    )
    assert got == "u4pruydqqvj"


def test_geohash_matches_canonical_reference(spark):
    """Engine geohash == exact-bisection canonical geohash of the
    derived position, across precisions (incl. odd-bit splits)."""
    from fractions import Fraction

    d = _docs(spark, 60)
    pts = {r.doc_id: (r.lat_md, r.lon_md) for r in geo.geo_points(d).collect()}
    for prec in (1, 3, 5):
        got = {r.doc_id: r.geohash for r in geo.geo_geohash(d, prec).collect()}
        for i, (lat_md, lon_md) in pts.items():
            lat = Fraction(lat_md, 1000) - 90
            lon = Fraction(lon_md, 1000) - 180
            assert got[i] == _ref_geohash(lat, lon, prec), (i, prec)


def test_geohash_cells_conserve_count_and_pin_membership(spark):
    d = _docs(spark, 80)
    cells = geo.geohash_cells(d, precision=2).collect()
    assert sum(r.n for r in cells) == 80
    ghs = [r.geohash for r in cells]
    assert ghs == sorted(ghs) and len(set(ghs)) == len(ghs)
    assert all(len(g) == 2 for g in ghs)
    # min_doc_id is a member of its own cell
    per_doc = {r.doc_id: r.geohash for r in geo.geo_geohash(d, 2).collect()}
    for r in cells:
        assert per_doc[r.min_doc_id] == r.geohash


def test_geohash_layout_independent(spark):
    d = _docs(spark, 50)
    a = {r.doc_id: r.geohash for r in geo.geo_geohash(d, 4).collect()}
    b = {r.doc_id: r.geohash
         for r in geo.geo_geohash(d.repartition(9), 4).collect()}
    assert a == b


def test_geohash_precision_guard(spark):
    d = _docs(spark, 5)
    with pytest.raises(ValueError):
        geo.geo_geohash(d, 0)
    with pytest.raises(ValueError):
        geo.geohash_cells(d, 13)


# --- bounds / centroid / rings --------------------------------------------


def test_bounds_and_centroid_match_python(spark):
    d = _docs(spark, 70)
    pts = [(r.lat_md, r.lon_md) for r in geo.geo_points(d).collect()]
    b = geo.geo_bounds(d).collect()[0]
    assert b.n == 70
    assert b.lat_min == round(min(p[0] for p in pts) / 1000.0 - 90.0, 6)
    assert b.lat_max == round(max(p[0] for p in pts) / 1000.0 - 90.0, 6)
    assert b.lon_min == round(min(p[1] for p in pts) / 1000.0 - 180.0, 6)
    assert b.lon_max == round(max(p[1] for p in pts) / 1000.0 - 180.0, 6)
    c = geo.geo_centroid(d).collect()[0]
    assert c.n == 70
    assert c.lat == pytest.approx(
        sum(p[0] for p in pts) / 70 / 1000.0 - 90.0, abs=1e-6
    )
    assert c.lon == pytest.approx(
        sum(p[1] for p in pts) / 70 / 1000.0 - 180.0, abs=1e-6
    )


def test_distance_rings_conserve_and_recheck(spark):
    d = _docs(spark, 80)
    edges = (4000.0, 9000.0)
    rows = geo.geo_distance_rings(d, 10.0, 20.0, edges).collect()
    assert [r.ring for r in rows] == [0, 1, 2]
    assert (rows[0].from_km, rows[0].to_km) == (0.0, 4000.0)
    assert (rows[1].from_km, rows[1].to_km) == (4000.0, 9000.0)
    assert (rows[2].from_km, rows[2].to_km) == (9000.0, None)
    assert sum(r.n for r in rows) == 80
    # python recheck of ring membership + min_doc_id
    import math as _m

    def hav(lat, lon):
        d2r = _m.pi / 180.0
        a = (
            _m.sin((10.0 - lat) * d2r / 2.0) ** 2
            + _m.cos(lat * d2r) * _m.cos(10.0 * d2r)
            * _m.sin((20.0 - lon) * d2r / 2.0) ** 2
        )
        return 2.0 * geo.GEO_EARTH_KM * _m.asin(_m.sqrt(a))

    pts = {r.doc_id: hav(r.lat, r.lon) for r in geo.geo_points(d).collect()}
    bounds = [0.0, 4000.0, 9000.0, float("inf")]
    for i, row in enumerate(rows):
        members = [
            did for did, dist in pts.items()
            if bounds[i] <= dist < bounds[i + 1]
        ]
        assert row.n == len(members)
        assert row.min_doc_id == (min(members) if members else None)


def test_distance_rings_empty_ring_always_present(spark):
    d = _docs(spark, 10)
    # a microscopic first ring is empty but still reported
    rows = geo.geo_distance_rings(d, 0.0, 0.0, (0.001, 30000.0)).collect()
    assert rows[0].n == 0 and rows[0].min_doc_id is None
    assert len(rows) == 3


def test_distance_rings_guards(spark):
    d = _docs(spark, 5)
    with pytest.raises(ValueError):
        geo.geo_distance_rings(d, 0, 0, ())
    with pytest.raises(ValueError):
        geo.geo_distance_rings(d, 0, 0, (5.0, 5.0))
    with pytest.raises(ValueError):
        geo.geo_distance_rings(d, 0, 0, (0.0, 5.0))


# --- geo_line ----------------------------------------------------------------


def test_geo_line_hand_rendered(spark):
    import hashlib

    from distributedcodesearchengine_spark.operators.geo import geo_line

    docs = spark.createDataFrame(
        [(5, "en"), (2, "en"), (9, "de"), (7, "en")],
        "doc_id long, lang string",
    )
    out = {r["lang"]: r for r in geo_line(docs, size=2).collect()}

    def pt(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        lat = int(h[0:8], 16) % 180000 - 90000
        lon = int(h[8:16], 16) % 360000 - 180000

        def rend(v):
            s = "-" if v < 0 else ""
            return f"{s}{abs(v) // 1000}.{abs(v) % 1000:03d}"

        return f"{rend(lon)} {rend(lat)}"

    # en: doc_ids sorted 2,5,7 -> capped at 2 -> (2, 5)
    assert out["en"]["n_points"] == 2
    assert out["en"]["line"] == f"LINESTRING ({pt(2)}, {pt(5)})"
    assert out["de"]["n_points"] == 1
    assert out["de"]["line"] == f"LINESTRING ({pt(9)})"


def test_geo_line_guard(spark):
    import pytest

    from distributedcodesearchengine_spark.operators.geo import geo_line

    docs = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        geo_line(docs, size=0)
