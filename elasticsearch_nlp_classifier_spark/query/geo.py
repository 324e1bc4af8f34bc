"""ES geo query / aggregation surface as pure Catalyst expressions.

The reference's ES cluster exposes the whole geo search surface to its
users (`utils/elasticsearch/ESClient.java` builds a stock
`RestHighLevelClient`); this module re-expresses the core of it over
plain `(lat, lon)` double columns:

- ``geo_bounding_box_query`` / ``geo_distance_query`` — filter
  predicates (pushed to the scan like any Catalyst filter).
- ``geo_distance_agg`` — ring buckets around an origin, one
  ``sum(CASE)`` scan (ES ``geo_distance`` agg).
- ``geotile_grid_agg`` — Web-Mercator slippy-map tile buckets
  (``z/x/y`` keys, identical to ES ``geotile_grid``): pure
  ``floor``/``log``/``tan`` arithmetic, so it is a plain hash
  aggregate with map-side combine — tile-count bounds the shuffle,
  not data size.
- ``geo_centroid_agg`` / ``geo_bounds_agg`` — single-row metric aggs.

Distances use the haversine great-circle formula on a spherical earth
(R = 6371 km), the same approximation ES's ``arc`` distance type uses
(ES: GeoUtils SLOPPY_ARC/ARC; we keep exact haversine since every
trig call is a JVM intrinsic inside whole-stage codegen).

All functions take *Column* inputs for lat/lon so callers can derive
coordinates from any expression; nothing here leaves the JVM.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "haversine_km",
    "geo_bounding_box_query",
    "geo_distance_query",
    "geo_distance_agg",
    "geotile_grid_agg",
    "geo_centroid_agg",
    "geo_bounds_agg",
    "geo_polygon_contains",
    "geo_polygon_sql",
    "geo_shape_query",
]

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat: Column, lon: Column, lat0: float, lon0: float,
) -> Column:
    """Great-circle distance (km) from each row's ``(lat, lon)`` to the
    fixed origin ``(lat0, lon0)`` — pure JVM trig, codegen-friendly."""
    rlat, rlon = F.radians(lat), F.radians(lon)
    rlat0, rlon0 = math.radians(lat0), math.radians(lon0)
    a = (
        F.pow(F.sin((rlat - F.lit(rlat0)) / 2), 2)
        + F.cos(rlat) * F.lit(math.cos(rlat0))
        * F.pow(F.sin((rlon - F.lit(rlon0)) / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_bounding_box_query(
    lat: Column, lon: Column,
    top: float, left: float, bottom: float, right: float,
) -> Column:
    """ES ``geo_bounding_box`` filter predicate (inclusive edges, like
    ES).  Boxes crossing the antimeridian (left > right) match the
    union of the two half-boxes, mirroring ES's dateline handling."""
    lat_ok = (lat <= F.lit(top)) & (lat >= F.lit(bottom))
    if left <= right:
        lon_ok = (lon >= F.lit(left)) & (lon <= F.lit(right))
    else:
        lon_ok = (lon >= F.lit(left)) | (lon <= F.lit(right))
    return lat_ok & lon_ok


def geo_distance_query(
    lat: Column, lon: Column, lat0: float, lon0: float, radius_km: float,
) -> Column:
    """ES ``geo_distance`` filter predicate: within ``radius_km`` of the
    origin (inclusive, ES semantics)."""
    return haversine_km(lat, lon, lat0, lon0) <= F.lit(radius_km)


def geo_distance_agg(
    df: DataFrame, lat: Column, lon: Column,
    lat0: float, lon0: float,
    ranges: list[tuple[float | None, float | None]],
) -> DataFrame:
    """ES ``geo_distance`` agg: ring buckets ``[from, to)`` (km) around
    the origin.  One ``sum(CASE)`` scan — never one pass per ring."""
    d = haversine_km(lat, lon, lat0, lon0)

    def _lbl(lo, hi):
        return f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"

    def _pred(lo, hi) -> Column:
        p = F.lit(True)
        if lo is not None:
            p = p & (d >= F.lit(lo))
        if hi is not None:
            p = p & (d < F.lit(hi))
        return p

    counts = df.agg(*[
        F.sum(F.when(_pred(lo, hi), 1).otherwise(0)).alias(_lbl(lo, hi))
        for lo, hi in ranges
    ])
    labels = [_lbl(lo, hi) for lo, hi in ranges]
    stack = ", ".join(f"'{lbl}', `{lbl}`" for lbl in labels)
    return counts.selectExpr(
        f"stack({len(labels)}, {stack}) as (key, doc_count)"
    ).select("key", F.col("doc_count").cast("bigint").alias("doc_count"))


def geotile_key(lat: Column, lon: Column, precision: int) -> Column:
    """ES ``geotile_grid`` bucket key ``"z/x/y"`` — standard
    Web-Mercator (slippy map) tiling at zoom ``precision``:
    ``x = floor((lon+180)/360 · 2^z)``,
    ``y = floor((1 − ln(tan φ + sec φ)/π)/2 · 2^z)``, clamped to the
    Mercator latitude limit like ES does."""
    n = float(1 << precision)
    # clamp to the Web-Mercator domain (ES clamps at ±85.0511°)
    clat = F.greatest(F.least(lat, F.lit(85.05112878)), F.lit(-85.05112878))
    rlat = F.radians(clat)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    y = F.floor(
        (F.lit(1.0)
         - F.log(F.tan(rlat) + F.lit(1.0) / F.cos(rlat)) / F.lit(math.pi))
        / F.lit(2.0) * F.lit(n)
    )
    # edge clamp (lon = 180 / lat at the pole limits land exactly on n)
    x = F.least(x, F.lit(int(n) - 1))
    y = F.greatest(F.least(y, F.lit(int(n) - 1)), F.lit(0))
    return F.concat_ws(
        "/", F.lit(str(precision)), x.cast("string"), y.cast("string")
    )


def geotile_grid_agg(
    df: DataFrame, lat: Column, lon: Column,
    precision: int = 7, size: int = 10,
) -> DataFrame:
    """ES ``geotile_grid`` agg: doc_count per Web-Mercator tile, top
    ``size`` tiles by count (tie → key ASC, deterministic).  A plain
    hash aggregate + TakeOrdered — the shuffle carries one row per
    occupied tile per partition."""
    return (
        df.select(geotile_key(lat, lon, precision).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def geo_centroid_agg(df: DataFrame, lat: Column, lon: Column) -> DataFrame:
    """ES ``geo_centroid``: arithmetic mean of lat/lon over matching
    docs (ES computes the centroid in the same planar way).  One agg
    row, map-side combined."""
    return df.agg(
        F.round(F.avg(lat), 6).alias("lat"),
        F.round(F.avg(lon), 6).alias("lon"),
        F.count(F.lit(1)).alias("count"),
    )


def geo_bounds_agg(df: DataFrame, lat: Column, lon: Column) -> DataFrame:
    """ES ``geo_bounds``: the minimal box covering all points
    (top-left / bottom-right, no wrap_longitude shortening)."""
    return df.agg(
        F.max(lat).alias("top"),
        F.min(lon).alias("left"),
        F.min(lat).alias("bottom"),
        F.max(lon).alias("right"),
        F.count(F.lit(1)).alias("count"),
    )


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_key(lat: Column, lon: Column, precision: int) -> Column:
    """ES ``geohash_grid`` bucket key: the standard base-32 geohash of
    ``precision`` characters (Niemeyer encoding — longitude owns the
    even interleaved bits, most significant first).

    Computed arithmetically, not by bisection: with ``b = 5·precision``
    total bits, ``nx = ceil(b/2)`` longitude bits and ``ny = b − nx``
    latitude bits, the cell ordinates are
    ``x = floor((lon+180)/360 · 2^nx)``, ``y = floor((lat+90)/180 ·
    2^ny)`` and the geohash integer interleaves their bits x-first.
    The interleave unrolls to a constant ``b``-term sum of JVM
    shift/mask expressions (b ≤ 60 at ES's max precision 12) and each
    output char is an ``element_at`` into the base-32 alphabet — the
    whole key stays inside whole-stage codegen, so the agg is a plain
    hash aggregate exactly like :func:`geotile_key`."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in [1, 12]")
    b = 5 * precision
    nx = (b + 1) // 2
    ny = b // 2
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << nx)))
    y = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << ny)))
    x = F.least(x, F.lit((1 << nx) - 1)).cast("bigint")
    y = F.least(y, F.lit((1 << ny) - 1)).cast("bigint")
    g = F.lit(0).cast("bigint")
    for i in range(b):  # bit i of the geohash, MSB first
        if i % 2 == 0:  # longitude bit i//2 (MSB first)
            src, nbits, j = x, nx, i // 2
        else:
            src, nbits, j = y, ny, i // 2
        bit = F.shiftright(src, nbits - 1 - j) % 2
        g = g + F.shiftleft(bit, b - 1 - i)
    alpha = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])
    chars = [
        F.element_at(
            alpha,
            (F.shiftright(g, 5 * (precision - 1 - c)) % 32 + 1).cast("int"),
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_grid_agg(
    df: DataFrame, lat: Column, lon: Column,
    precision: int = 5, size: int = 10,
) -> DataFrame:
    """ES ``geohash_grid`` agg: doc_count per geohash cell, top ``size``
    by count (tie → key ASC).  Same plan shape as ``geotile_grid`` —
    hash aggregate with map-side combine + TakeOrdered."""
    return (
        df.select(geohash_key(lat, lon, precision).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def geohash_key_sql(lat_expr: str, lon_expr: str, precision: int) -> str:
    """ANSI-SQL twin of :func:`geohash_key` (same unrolled interleave,
    DuckDB bit operators) — oracle generation, like
    ``operators/sampling.py:hash_uniform_sql``."""
    b = 5 * precision
    nx = (b + 1) // 2
    ny = b // 2
    x = (f"least(CAST(floor((CAST({lon_expr} AS DOUBLE) + 180.0) / 360.0"
         f" * CAST({1 << nx} AS DOUBLE)) AS BIGINT), {(1 << nx) - 1})")
    y = (f"least(CAST(floor((CAST({lat_expr} AS DOUBLE) + 90.0) / 180.0"
         f" * CAST({1 << ny} AS DOUBLE)) AS BIGINT), {(1 << ny) - 1})")
    terms = []
    for i in range(b):
        if i % 2 == 0:
            src, nbits, j = x, nx, i // 2
        else:
            src, nbits, j = y, ny, i // 2
        terms.append(f"((({src} >> {nbits - 1 - j}) % 2) << {b - 1 - i})")
    g = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST(({g} >> {5 * (precision - 1 - c)}) % 32 + 1 AS INT), 1)"
        for c in range(precision)
    ]
    return " || ".join(chars)


def geo_polygon_contains(
    lat: Column, lon: Column, polygon: list[tuple[float, float]],
) -> Column:
    """ES ``geo_shape`` (polygon, ``relation: within``) point test:
    even-odd ray casting unrolled over the polygon's edges as pure
    codegen conditionals — one CASE per edge, no UDF, pushed to the
    scan like any predicate.  ``polygon`` is ES/GeoJSON vertex order
    ``[(lon, lat), ...]`` (closing vertex optional).  Work per row is
    O(edges) arithmetic; a query-side polygon is always small, so this
    stays a scan filter at any corpus size.

    Boundary convention: the standard crossing rule (half-open edges,
    strict x comparison) — points exactly ON an edge may fall either
    side, same caveat ES documents for shape boundaries."""
    pts = list(polygon)
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    crossings = None
    n = len(pts)
    for i in range(n):
        xi, yi = pts[i]
        xj, yj = pts[(i + 1) % n]
        if yi == yj:
            continue  # horizontal edge never crosses a horizontal ray
        straddles = (F.lit(yi) > lat) != (F.lit(yj) > lat)
        x_at = (F.lit(xj - xi) * (lat - F.lit(yi)) / F.lit(yj - yi)
                + F.lit(xi))
        c = F.when(straddles & (lon < x_at), F.lit(1)).otherwise(F.lit(0))
        crossings = c if crossings is None else crossings + c
    if crossings is None:
        return F.lit(False)
    return crossings % 2 == 1


def geo_polygon_sql(
    lat_expr: str, lon_expr: str, polygon: list[tuple[float, float]],
) -> str:
    """ANSI-SQL twin of :func:`geo_polygon_contains` (same edges, same
    crossing rule) — oracle generation, like :func:`geohash_key_sql`."""
    pts = list(polygon)
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    terms = []
    n = len(pts)
    for i in range(n):
        xi, yi = pts[i]
        xj, yj = pts[(i + 1) % n]
        if yi == yj:
            continue
        terms.append(
            f"(CASE WHEN (({yi} > {lat_expr}) <> ({yj} > {lat_expr}))"
            f" AND ({lon_expr} < ({xj - xi}) * ({lat_expr} - ({yi}))"
            f" / ({yj - yi}) + ({xi})) THEN 1 ELSE 0 END)"
        )
    if not terms:
        return "FALSE"
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def geo_shape_query(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    polygon: list[tuple[float, float]],
    relation: str = "within",
) -> DataFrame:
    """ES ``geo_shape`` query over point docs: keep docs whose point is
    within (or, with ``relation="disjoint"``, outside) the polygon."""
    pred = geo_polygon_contains(F.col(lat_col), F.col(lon_col), polygon)
    if relation == "within":
        return df.where(pred)
    if relation == "disjoint":
        return df.where(~pred)
    raise ValueError(f"unsupported relation for point docs: {relation}")
