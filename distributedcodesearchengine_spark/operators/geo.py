"""Geo queries and aggregations (the Elasticsearch geo family:
``geo_bounding_box`` filter, ``geo_distance`` sort, ``geotile_grid`` /
``geohash_grid``-class bucketing).

The corpus carries no coordinates, so — like the PII / line-dedup / C4
gates — every operator runs over DETERMINISTIC derived positions both
engines compute identically from the parquet alone: integer
milli-degrees from two md5(doc_id) hex slices (lat_md in [0, 180000),
lon_md in [0, 360000)), displayed as ``lat = lat_md/1000 - 90`` /
``lon = lon_md/1000 - 180``. Keeping the DERIVATION integer makes the
grid aggregation all-integer (exact cross-engine by construction) and
the bbox comparisons exact (identical divide/subtract on identical
integers); only the haversine distance touches transcendentals, where
the engines' libm vs JVM sin/cos/asin may differ in the last ulp — the
house exp/ln precedent (temperature_sample, unigram_logppl) with the
6-dp gate rounding absorbing it. The degree->radian factor is a shared
literal multiply on both engines (never the builtin radians(), whose
operand order differs between them).

Scale shapes:
- bbox: a sargable AND of range predicates — on a real corpus with
  materialized lat/lon columns this is parquet min/max pushdown, the
  cheapest filter class there is;
- distance top-k: per-row expression + TakeOrderedAndProject — no
  sort, no shuffle;
- grid: map-side-combinable integer groupBy — a billion points in one
  cell collapse per map task before the shuffle.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round6, round6_sql, sql_double

GEO_EARTH_KM = 6371.0088  # IUGG mean earth radius
_DEG2RAD = math.pi / 180.0


def _md(col_hex_start: int):
    """Integer milli-degrees from an md5(doc_id) hex slice."""
    return F.conv(
        F.substring(
            F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8")),
            col_hex_start,
            8,
        ),
        16,
        10,
    ).cast("long")


def _lat_md():
    return _md(1) % 180000


def _lon_md():
    return _md(9) % 360000


def _lat_lon_sql() -> str:
    """Shared CTE: integer milli-degrees + display degrees per doc."""
    return (
        "g AS (SELECT doc_id, "
        "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 180000 AS lat_md, "
        "('0x' || substr(md5(doc_id::VARCHAR), 9, 8))::BIGINT % 360000 AS lon_md "
        "FROM documents), "
        "p AS (SELECT doc_id, lat_md, lon_md, "
        "lat_md / 1000.0 - 90.0 AS lat, lon_md / 1000.0 - 180.0 AS lon FROM g)"
    )


def geo_points(docs: DataFrame) -> DataFrame:
    """(doc_id, lat_md, lon_md, lat, lon) — the derived positions."""
    return docs.select(
        "doc_id",
        _lat_md().alias("lat_md"),
        _lon_md().alias("lon_md"),
    ).select(
        "doc_id",
        "lat_md",
        "lon_md",
        (F.col("lat_md") / F.lit(1000.0) - F.lit(90.0)).alias("lat"),
        (F.col("lon_md") / F.lit(1000.0) - F.lit(180.0)).alias("lon"),
    )


def geo_bbox(
    docs: DataFrame,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
) -> DataFrame:
    """(doc_id, lat, lon) inside the box, inclusive bounds — the ES
    ``geo_bounding_box`` filter. Comparisons are exact: both engines
    derive lat/lon by the identical integer-divide-subtract chain."""
    if lat_min > lat_max or lon_min > lon_max:
        raise ValueError(
            f"empty box: [{lat_min},{lat_max}] x [{lon_min},{lon_max}]"
        )
    p = geo_points(docs)
    return (
        p.where(
            (F.col("lat") >= float(lat_min))
            & (F.col("lat") <= float(lat_max))
            & (F.col("lon") >= float(lon_min))
            & (F.col("lon") <= float(lon_max))
        )
        .select("doc_id", round6("lat").alias("lat"), round6("lon").alias("lon"))
        .orderBy("doc_id")
    )


def geo_bbox_sql(
    lat_min: float, lat_max: float, lon_min: float, lon_max: float
) -> str:
    return (
        f"WITH {_lat_lon_sql()} "
        f"SELECT doc_id, {round6_sql('lat')} AS lat, {round6_sql('lon')} AS lon "
        f"FROM p WHERE lat >= {sql_double(float(lat_min))} "
        f"AND lat <= {sql_double(float(lat_max))} "
        f"AND lon >= {sql_double(float(lon_min))} "
        f"AND lon <= {sql_double(float(lon_max))} ORDER BY doc_id"
    )


def _haversine_col(lat, lon, clat: float, clon: float):
    """Great-circle km. Operand sequence mirrored verbatim in the SQL:
    radians via one shared literal multiply, sin(x)*sin(x) (never
    pow), a = hlat + cos*cos*hlon, d = 2R * asin(sqrt(a))."""
    d2r = F.lit(_DEG2RAD)
    rlat1 = lat * d2r
    rlat2 = F.lit(float(clat)) * d2r
    dlat2 = (F.lit(float(clat)) - lat) * d2r / F.lit(2.0)
    dlon2 = (F.lit(float(clon)) - lon) * d2r / F.lit(2.0)
    a = (
        F.sin(dlat2) * F.sin(dlat2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon2) * F.sin(dlon2)
    )
    return F.lit(2.0 * GEO_EARTH_KM) * F.asin(F.sqrt(a))


def geo_distance_topk(
    docs: DataFrame, center_lat: float, center_lon: float, k: int = 10
) -> DataFrame:
    """(rank, doc_id, dist_km) — the k nearest docs to the center by
    haversine distance (the ES ``geo_distance`` sort / query),
    ties on doc_id asc. Per-row expression + TakeOrdered."""
    from pyspark.sql.window import Window

    p = geo_points(docs)
    scored = p.select(
        "doc_id",
        _haversine_col(
            F.col("lat"), F.col("lon"), center_lat, center_lon
        ).alias("dist_km"),
    )
    top = scored.orderBy(F.asc("dist_km"), F.asc("doc_id")).limit(int(k))
    w = Window.orderBy(F.asc("dist_km"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", round6("dist_km").alias("dist_km")
    )


def geo_distance_topk_sql(
    center_lat: float, center_lon: float, k: int = 10
) -> str:
    d2r = sql_double(_DEG2RAD)
    clat = sql_double(float(center_lat))
    clon = sql_double(float(center_lon))
    a = (
        f"sin(({clat} - lat) * {d2r} / 2.0) * sin(({clat} - lat) * {d2r} / 2.0) "
        f"+ cos(lat * {d2r}) * cos({clat} * {d2r}) "
        f"* sin(({clon} - lon) * {d2r} / 2.0) * sin(({clon} - lon) * {d2r} / 2.0)"
    )
    dist = f"{sql_double(2.0 * GEO_EARTH_KM)} * asin(sqrt({a}))"
    return (
        f"WITH {_lat_lon_sql()}, "
        f"d AS (SELECT doc_id, {dist} AS dist_km FROM p) "
        "SELECT CAST(row_number() OVER (ORDER BY dist_km ASC, doc_id ASC) AS INT) "
        f"AS rank, doc_id, {round6_sql('dist_km')} AS dist_km FROM d "
        f"ORDER BY dist_km ASC, doc_id ASC LIMIT {int(k)}"
    )


def geo_grid(docs: DataFrame, cell_milli: int = 15000) -> DataFrame:
    """(cell_lat, cell_lon, n, min_doc_id) — the geotile/geohash-grid
    aggregation as an ALL-INTEGER cell keyed on the milli-degree
    derivation (cell = md DIV cell_milli): exact cross-engine by
    construction (a Web-Mercator ln(tan(...)) tile key would flip
    integer cells on 1-ulp libm differences at tile boundaries — the
    reason the grid keys off the integers, not the degrees).
    min_doc_id pins membership, not just occupancy."""
    if int(cell_milli) < 1:
        raise ValueError(f"cell_milli must be >= 1: {cell_milli!r}")
    c = int(cell_milli)
    p = docs.select(
        "doc_id", _lat_md().alias("lat_md"), _lon_md().alias("lon_md")
    ).select(
        "doc_id",
        F.expr(f"lat_md DIV {c}").cast("long").alias("cell_lat"),
        F.expr(f"lon_md DIV {c}").cast("long").alias("cell_lon"),
    )
    return (
        p.groupBy("cell_lat", "cell_lon")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
        .orderBy("cell_lat", "cell_lon")
    )


def geo_grid_sql(cell_milli: int = 15000) -> str:
    c = int(cell_milli)
    return (
        f"WITH {_lat_lon_sql()} "
        f"SELECT lat_md // {c} AS cell_lat, lon_md // {c} AS cell_lon, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(min(doc_id) AS BIGINT) AS min_doc_id "
        "FROM p GROUP BY 1, 2 ORDER BY 1, 2"
    )


def geo_bounds(docs: DataFrame) -> DataFrame:
    """(n, lat_min, lat_max, lon_min, lon_max) — the ES ``geo_bounds``
    aggregation: the tightest box around the corpus positions, one
    row. ALL-INTEGER reduction (min/max over the milli-degree
    derivation, a map-side-combinable 4-long agg) with the divide/
    subtract display conversion applied once on the 1-row result —
    parity exact by construction."""
    p = docs.select(_lat_md().alias("lat_md"), _lon_md().alias("lon_md"))
    return p.agg(
        F.count("*").cast("long").alias("n"),
        F.min("lat_md").alias("_a"),
        F.max("lat_md").alias("_b"),
        F.min("lon_md").alias("_c"),
        F.max("lon_md").alias("_d"),
    ).select(
        "n",
        round6(F.col("_a") / F.lit(1000.0) - F.lit(90.0)).alias("lat_min"),
        round6(F.col("_b") / F.lit(1000.0) - F.lit(90.0)).alias("lat_max"),
        round6(F.col("_c") / F.lit(1000.0) - F.lit(180.0)).alias("lon_min"),
        round6(F.col("_d") / F.lit(1000.0) - F.lit(180.0)).alias("lon_max"),
    )


def geo_bounds_sql() -> str:
    return (
        f"WITH {_lat_lon_sql()} "
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        f"{round6_sql('min(lat_md) / 1000.0 - 90.0')} AS lat_min, "
        f"{round6_sql('max(lat_md) / 1000.0 - 90.0')} AS lat_max, "
        f"{round6_sql('min(lon_md) / 1000.0 - 180.0')} AS lon_min, "
        f"{round6_sql('max(lon_md) / 1000.0 - 180.0')} AS lon_max FROM p"
    )


def geo_centroid(docs: DataFrame) -> DataFrame:
    """(n, lat, lon) — the ES ``geo_centroid`` aggregation: the
    arithmetic mean position. The reduction is two EXACT integer sums
    (map-side combinable; at 10^12 rows sum(lat_md) < 1.8e17 fits a
    long), and the single float division sum * 1.0 / n / 1000 - 90
    happens once on the 1-row result with the identical operand
    sequence on both engines."""
    p = docs.select(_lat_md().alias("lat_md"), _lon_md().alias("lon_md"))
    return p.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("lat_md").cast("long").alias("_sa"),
        F.sum("lon_md").cast("long").alias("_so"),
    ).select(
        "n",
        round6(
            F.col("_sa").cast("double") * F.lit(1.0) / F.col("n") / F.lit(1000.0)
            - F.lit(90.0)
        ).alias("lat"),
        round6(
            F.col("_so").cast("double") * F.lit(1.0) / F.col("n") / F.lit(1000.0)
            - F.lit(180.0)
        ).alias("lon"),
    )


def geo_centroid_sql() -> str:
    return (
        f"WITH {_lat_lon_sql()} "
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        f"{round6_sql('CAST(sum(lat_md) AS DOUBLE) * 1.0 / count(*) / 1000.0 - 90.0')} AS lat, "
        f"{round6_sql('CAST(sum(lon_md) AS DOUBLE) * 1.0 / count(*) / 1000.0 - 180.0')} AS lon "
        "FROM p"
    )


def geo_distance_rings(
    docs: DataFrame,
    center_lat: float,
    center_lon: float,
    edges_km: Sequence[float] = (2000.0, 5000.0, 10000.0),
) -> DataFrame:
    """(ring, from_km, to_km, n, min_doc_id) — the ES ``geo_distance``
    aggregation: always-present concentric [from, to) distance rings
    around a center (ring i covers [edges[i-1], edges[i]), ring 0
    starts at 0, the last ring is unbounded). One haversine per row +
    ONE conditional-agg pass over len(edges)+1 rings — the
    filters/range-agg shape; the distance comparison uses the same
    expression both engines evaluate, and ring keys are integers.
    Empty rings report n=0 with min_doc_id NULL (always-present
    buckets, ES semantics)."""
    edges = [float(x) for x in edges_km]
    if not edges or any(
        edges[i] >= edges[i + 1] for i in range(len(edges) - 1)
    ) or edges[0] <= 0:
        raise ValueError(f"edges_km must be positive ascending: {edges_km!r}")
    p = geo_points(docs)
    d = p.select(
        "doc_id",
        _haversine_col(
            F.col("lat"), F.col("lon"), center_lat, center_lon
        ).alias("_d"),
    )
    bounds = [0.0] + edges + [None]
    aggs = []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        cond = F.col("_d") >= F.lit(lo)
        if hi is not None:
            cond = cond & (F.col("_d") < F.lit(hi))
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_n{i}")
        )
        aggs.append(F.min(F.when(cond, F.col("doc_id"))).alias(f"_m{i}"))
    row = d.agg(*aggs)
    spark = docs.sparkSession
    ring_meta = spark.createDataFrame(
        [
            (
                i,
                float(bounds[i]),
                float(bounds[i + 1]) if bounds[i + 1] is not None else None,
            )
            for i in range(len(bounds) - 1)
        ],
        "ring int, from_km double, to_km double",
    )
    # fan the single agg row out to one row per ring (driver-free:
    # cross join the 1-row agg against the tiny ring relation — the
    # filters-agg stack shape)
    stacked = ring_meta.crossJoin(F.broadcast(row)).select(
        "ring",
        "from_km",
        "to_km",
        F.expr(
            "CASE "
            + " ".join(
                f"WHEN ring = {i} THEN _n{i}" for i in range(len(bounds) - 1)
            )
            + " END"
        ).cast("long").alias("n"),
        F.expr(
            "CASE "
            + " ".join(
                f"WHEN ring = {i} THEN _m{i}" for i in range(len(bounds) - 1)
            )
            + " END"
        ).cast("long").alias("min_doc_id"),
    )
    return stacked.orderBy("ring")


def geo_distance_rings_sql(
    center_lat: float,
    center_lon: float,
    edges_km: Sequence[float] = (2000.0, 5000.0, 10000.0),
) -> str:
    edges = [float(x) for x in edges_km]
    d2r = sql_double(_DEG2RAD)
    clat = sql_double(float(center_lat))
    clon = sql_double(float(center_lon))
    a = (
        f"sin(({clat} - lat) * {d2r} / 2.0) * sin(({clat} - lat) * {d2r} / 2.0) "
        f"+ cos(lat * {d2r}) * cos({clat} * {d2r}) "
        f"* sin(({clon} - lon) * {d2r} / 2.0) * sin(({clon} - lon) * {d2r} / 2.0)"
    )
    dist = f"{sql_double(2.0 * GEO_EARTH_KM)} * asin(sqrt({a}))"
    bounds = [0.0] + edges + [None]
    rows = []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        cond = f"d >= {sql_double(lo)}"
        if hi is not None:
            cond += f" AND d < {sql_double(hi)}"
        to_sql = sql_double(hi) if hi is not None else "NULL::DOUBLE"
        rows.append(
            f"SELECT {i} AS ring, {sql_double(lo)} AS from_km, {to_sql} AS to_km, "
            f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS n, "
            f"CAST(min(CASE WHEN {cond} THEN doc_id END) AS BIGINT) AS min_doc_id "
            "FROM dd"
        )
    return (
        f"WITH {_lat_lon_sql()}, "
        f"dd AS (SELECT doc_id, {dist} AS d FROM p) "
        "SELECT CAST(ring AS INT) AS ring, from_km, to_km, n, min_doc_id FROM ("
        + " UNION ALL ".join(rows)
        + ") ORDER BY ring"
    )


# ---------------------------------------------------------------------------
# geohash_grid — canonical base32 geohash cells, all-integer
# ---------------------------------------------------------------------------

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_split(precision: int):
    """(latbits, lonbits) for a precision-char geohash: 5 bits per
    char, longitude first in the interleave so it takes the extra bit
    on odd totals — the canonical layout."""
    p = int(precision)
    if not 1 <= p <= 12:
        raise ValueError(f"precision must be in [1, 12]: {precision!r}")
    total = 5 * p
    lonbits = (total + 1) // 2
    return total - lonbits, lonbits


def _geohash_code_expr(
    lat_i: str, lon_i: str, latbits: int, lonbits: int, idiv: str
) -> str:
    """The interleaved 5p-bit integer as one sum of bit terms —
    output bit j (0 = MSB) takes longitude bits at even j, latitude at
    odd j. ``idiv`` is the engine's integer-divide spelling ('DIV' for
    Spark SQL, '//' for DuckDB); everything is nonnegative-integer
    arithmetic, so the two spellings are value-identical."""
    total = latbits + lonbits
    terms = []
    for j in range(total):
        w = 2 ** (total - 1 - j)
        if j % 2 == 0:
            src, bit = lon_i, lonbits - 1 - j // 2
        else:
            src, bit = lat_i, latbits - 1 - (j - 1) // 2
        terms.append(f"(({src} {idiv} {2 ** bit}) % 2) * {w}")
    return " + ".join(terms)


def _geohash_chars_expr(code: str, precision: int, idiv: str, substr_fn: str) -> str:
    """concat of precision base32 chars: char i is bits
    [5i, 5i+5) of the code from the MSB."""
    parts = []
    for i in range(int(precision)):
        shift = 2 ** (5 * (int(precision) - 1 - i))
        parts.append(
            f"{substr_fn}('{GEOHASH32}', "
            f"CAST((({code}) {idiv} {shift}) % 32 AS INT) + 1, 1)"
        )
    return "concat(" + ", ".join(parts) + ")"


def geo_geohash(docs: DataFrame, precision: int = 5) -> DataFrame:
    """(doc_id, geohash) — the canonical base32 geohash of each doc's
    derived position. The quantization is ALL-INTEGER: lat_int =
    (lat_md * 2^latbits) DIV 180000 is exactly floor((lat+90)/180 *
    2^latbits) because lat+90 == lat_md/1000 exactly — so the cell
    assignment never touches a float and is bit-identical cross-engine
    (the geo_grid design rule, extended to the interleaved key). The
    bit interleave and base32 lookup are pure integer/string
    expressions; zero Python, zero shuffle."""
    latbits, lonbits = _geohash_split(precision)
    p = docs.select(
        "doc_id", _lat_md().alias("lat_md"), _lon_md().alias("lon_md")
    ).select(
        "doc_id",
        F.expr(f"(lat_md * {2 ** latbits}) DIV 180000").cast("long").alias("lat_i"),
        F.expr(f"(lon_md * {2 ** lonbits}) DIV 360000").cast("long").alias("lon_i"),
    ).select(
        "doc_id",
        F.expr(
            _geohash_code_expr("lat_i", "lon_i", latbits, lonbits, "DIV")
        ).cast("long").alias("code"),
    )
    return p.select(
        "doc_id",
        F.expr(_geohash_chars_expr("code", precision, "DIV", "substring")).alias(
            "geohash"
        ),
    )


def geohash_cells(docs: DataFrame, precision: int = 3) -> DataFrame:
    """(geohash, n, min_doc_id) — the ES ``geohash_grid`` aggregation:
    bucket counts per canonical base32 geohash cell at the given
    precision, min_doc_id pinning membership. Same scale shape as
    geo_grid: a map-side-combinable groupBy on a per-row integer-
    derived key — a billion points in one cell collapse per map task
    before the shuffle."""
    return (
        geo_geohash(docs, precision)
        .groupBy("geohash")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
        .orderBy("geohash")
    )


def _geohash_sql_chain(precision: int) -> str:
    """Shared DuckDB CTE chain ending in gh(doc_id, geohash)."""
    latbits, lonbits = _geohash_split(precision)
    code = _geohash_code_expr("lat_i", "lon_i", latbits, lonbits, "//")
    chars = _geohash_chars_expr("code", precision, "//", "substr")
    return (
        "g AS (SELECT doc_id, "
        "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 180000 AS lat_md, "
        "('0x' || substr(md5(doc_id::VARCHAR), 9, 8))::BIGINT % 360000 AS lon_md "
        "FROM documents), "
        f"q AS (SELECT doc_id, (lat_md * {2 ** latbits}) // 180000 AS lat_i, "
        f"(lon_md * {2 ** lonbits}) // 360000 AS lon_i FROM g), "
        f"c AS (SELECT doc_id, {code} AS code FROM q), "
        f"gh AS (SELECT doc_id, {chars} AS geohash FROM c)"
    )


def geohash_cells_sql(precision: int = 3) -> str:
    return (
        f"WITH {_geohash_sql_chain(precision)} "
        "SELECT geohash, CAST(count(*) AS BIGINT) AS n, "
        "CAST(min(doc_id) AS BIGINT) AS min_doc_id "
        "FROM gh GROUP BY 1 ORDER BY 1"
    )


# --------------------------------------------------------------------------
# distance_feature query (BM25 + geo-proximity boost)
# --------------------------------------------------------------------------


def bm25_distance_feature_topk(
    index,
    query: str,
    center_lat: float,
    center_lon: float,
    pivot_km: float = 1000.0,
    boost: float = 5.0,
    k: int = 10,
    id_col: F.Column | None = None,
):
    """(rank, doc_id, base, dist_km, score) — the ES
    ``distance_feature`` query as a bool-should clause over the BM25
    match: final = base + boost * pivot / (pivot + dist), the ES
    reciprocal-saturation form, with dist the haversine km to the
    center over the derived positions (``id_col`` picks the md5 seed
    column — a real corpus swaps in materialized lat/lon unchanged).

    Unlike ``rescore``'s bounded window this applies to the WHOLE kept
    set (ES semantics: every matching doc gets the boost), which stays
    the minimal plan because the positions are a pure per-row
    expression over doc_id — the kept chain gains a projection and a
    TakeOrdered, zero joins, zero extra shuffles. In the degenerate
    all-zero regime (OOV / epsilon-floored query) every base is 0 and
    the ranking collapses to pure proximity — the distance_feature-
    only ordering, pinned by its own gate key.

    Scale: kept set as bm25_facets (candidates-only in the healthy
    regime); feature arithmetic inside whole-stage codegen; top-k is
    TakeOrderedAndProject. At 10^12 docs nothing new moves.
    """
    from pyspark.sql.window import Window

    from .explore import _kept_with_cols

    if not float(pivot_km) > 0:
        raise ValueError(f"pivot_km must be > 0: {pivot_km!r}")
    if not float(boost) >= 0:
        raise ValueError(f"boost must be >= 0: {boost!r}")
    spark = index.spark
    out = (
        "rank int, doc_id long, url string, base double, dist_km double, "
        "score double"
    )
    kept = _kept_with_cols(index, query, ["url"])
    if kept is None:
        return spark.createDataFrame([], out)
    seed = id_col if id_col is not None else F.col("doc_id")
    lat_md = _md_from(seed, 1) % 180000
    lon_md = _md_from(seed, 9) % 360000
    lat = lat_md / F.lit(1000.0) - F.lit(90.0)
    lon = lon_md / F.lit(1000.0) - F.lit(180.0)
    dist = _haversine_col(lat, lon, float(center_lat), float(center_lon))
    p = F.lit(float(pivot_km))
    final = F.col("score") + F.lit(float(boost)) * (p / (p + F.col("dist_km")))
    scored = kept.withColumn("dist_km", dist).select(
        "doc_id", "url", F.col("score").alias("base"), "dist_km",
        final.alias("final"),
    )
    w = Window.orderBy(F.desc("final"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("final"), F.asc("doc_id"))
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank", "doc_id", "url", round6("base").alias("base"),
            round6("dist_km").alias("dist_km"), round6("final").alias("score"),
        )
    )


def _md_from(seed: F.Column, hex_start: int):
    """Integer milli-degree source from an arbitrary id column."""
    return F.conv(
        F.substring(F.md5(F.encode(seed.cast("string"), "utf-8")), hex_start, 8),
        16,
        10,
    ).cast("long")


def bm25_distance_feature_sql(
    query: str,
    center_lat: float,
    center_lon: float,
    pivot_km: float = 1000.0,
    boost: float = 5.0,
    k: int = 10,
) -> str:
    """DuckDB mirror of bm25_distance_feature_topk over the kept-set
    chain: identical haversine operand sequence (the
    geo_distance_topk_sql spelling), identical saturation
    boost * (pivot / (pivot + dist))."""
    from ..functions.sql_oracle import kept_cte_sql

    chain = kept_cte_sql(query)
    if chain is None:
        return (
            "SELECT 1 AS rank, 1::BIGINT AS doc_id, 0.0 AS base, "
            "0.0 AS dist_km, 0.0 AS score WHERE false"
        )
    d2r = sql_double(_DEG2RAD)
    clat = sql_double(float(center_lat))
    clon = sql_double(float(center_lon))
    a = (
        f"sin(({clat} - lat) * {d2r} / 2.0) * sin(({clat} - lat) * {d2r} / 2.0) "
        f"+ cos(lat * {d2r}) * cos({clat} * {d2r}) "
        f"* sin(({clon} - lon) * {d2r} / 2.0) * sin(({clon} - lon) * {d2r} / 2.0)"
    )
    dist = f"{sql_double(2.0 * GEO_EARTH_KM)} * asin(sqrt({a}))"
    p = sql_double(float(pivot_km))
    b = sql_double(float(boost))
    return (
        f"{chain}, "
        "pos AS (SELECT kept.doc_id, kept.score, "
        "('0x' || substr(md5(kept.doc_id::VARCHAR), 1, 8))::BIGINT % 180000 "
        "/ 1000.0 - 90.0 AS lat, "
        "('0x' || substr(md5(kept.doc_id::VARCHAR), 9, 8))::BIGINT % 360000 "
        "/ 1000.0 - 180.0 AS lon FROM kept), "
        f"feat AS (SELECT doc_id, score AS base, {dist} AS dist_km FROM pos), "
        f"fin AS (SELECT doc_id, base, dist_km, "
        f"base + {b} * ({p} / ({p} + dist_km)) AS final FROM feat) "
        "SELECT CAST(row_number() OVER (ORDER BY final DESC, doc_id ASC) AS INT) AS rank, "
        f"doc_id, {round6_sql('base')} AS base, {round6_sql('dist_km')} AS dist_km, "
        f"{round6_sql('final')} AS score "
        f"FROM fin ORDER BY final DESC, doc_id ASC LIMIT {int(k)}"
    )


# --------------------------------------------------------------------------
# geo_line aggregation
# --------------------------------------------------------------------------


def _md_render(md_col, offset_milli: int):
    """Render an integer milli-degree (minus display offset) as its
    exact 3-decimal string WITHOUT ever formatting a float: sign /
    integer part / zero-padded fraction are all string ops on
    integers (the iptools dotted-quad precedent) — float->string
    formatting differs between engines (trailing zeros, negative
    zero), integer rendering cannot."""
    v = md_col - F.lit(int(offset_milli))
    a = F.abs(v)
    sign = F.when(v < 0, F.lit("-")).otherwise(F.lit(""))
    return F.concat(
        sign,
        (a / F.lit(1000)).cast("long").cast("string"),
        F.lit("."),
        F.lpad((a % F.lit(1000)).cast("string"), 3, "0"),
    )


def _md_render_sql(md_expr: str, offset_milli: int) -> str:
    v = f"({md_expr} - {int(offset_milli)})"
    a = f"abs({v})"
    return (
        f"(CASE WHEN {v} < 0 THEN '-' ELSE '' END || "
        f"CAST({a} // 1000 AS VARCHAR) || '.' || "
        f"lpad(CAST({a} % 1000 AS VARCHAR), 3, '0'))"
    )


def geo_line(docs: DataFrame, size: int = 20) -> DataFrame:
    """(lang, n_points, line) — the ES ``geo_line`` aggregation: per
    group (lang here; a real corpus groups by track/session id), the
    WKT LineString of the group's points in sort order (doc_id — the
    ES sort field), truncated at ``size`` points (ES's cap, default
    10k). Coordinates are 'lon lat' pairs (WKT axis order) rendered
    from the INTEGER milli-degrees via pure string arithmetic — no
    float is ever formatted, so the strings are identical across
    engines by construction.

    Scale: per-group TakeOrdered-shaped cut (min-``size`` doc_ids via
    the sorted-array slice — group state is bounded by ``size``, the
    ES semantics), one groupBy, string assembly per group row."""
    if int(size) < 1:
        raise ValueError(f"size must be >= 1: {size!r}")
    pts = docs.select(
        "lang",
        "doc_id",
        F.concat(
            _md_render(_lon_md(), 180000), F.lit(" "),
            _md_render(_lat_md(), 90000),
        ).alias("pt"),
    )
    g = pts.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_total"),
        F.slice(
            F.array_sort(F.collect_list(F.struct("doc_id", "pt"))),
            1,
            int(size),
        ).alias("head"),
    )
    return g.select(
        "lang",
        F.least(F.col("n_total"), F.lit(int(size))).cast("long").alias(
            "n_points"
        ),
        F.concat(
            F.lit("LINESTRING ("),
            F.array_join(F.transform(F.col("head"), lambda s: s["pt"]), ", "),
            F.lit(")"),
        ).alias("line"),
    ).orderBy("lang")


def geo_line_sql(size: int = 20) -> str:
    """DuckDB mirror of geo_line: rank-window cut + ordered
    string_agg, identical integer rendering."""
    if int(size) < 1:
        raise ValueError(f"size must be >= 1: {size!r}")
    lon = _md_render_sql("lon_md", 180000)
    lat = _md_render_sql("lat_md", 90000)
    return (
        "WITH g AS (SELECT doc_id, lang, "
        "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 180000 AS lat_md, "
        "('0x' || substr(md5(doc_id::VARCHAR), 9, 8))::BIGINT % 360000 AS lon_md "
        "FROM documents), "
        f"p AS (SELECT lang, doc_id, {lon} || ' ' || {lat} AS pt, "
        "row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn FROM g) "
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_points, "
        "'LINESTRING (' || string_agg(pt, ', ' ORDER BY doc_id) || ')' AS line "
        f"FROM p WHERE rn <= {int(size)} GROUP BY lang ORDER BY lang"
    )
