"""Spatial point queries — the LatLonPoint family, Spark-first.

Reference semantics (cited for parity, no code taken):

- ``core/document/LatLonPoint.java`` — an indexed (lat, lon) field,
  quantized to two int32s; ``newBoxQuery`` / ``newDistanceQuery`` /
  ``newDistanceSort``.
- ``core/geo/GeoEncodingUtils.java:58-148`` — encodeLatitude =
  floor(lat / LAT_DECODE) with LAT_DECODE = 180/2^32 (ceil variants for
  lower box edges); decode = encoded * LAT_DECODE. Both constants are
  binary-exact dyadics (45/2^30, 45/2^29), so encode/decode reproduce
  bit-identically on any IEEE-754 engine — which is what lets the DuckDB
  oracle twin hash-match integer-encoded coordinates.
- ``core/util/SloppyMath.java:47-75`` — haversinMeters over the DECODED
  (quantized) coordinates, earth radius TO_METERS = 6_371_008.7714.
- ``core/geo/Rectangle.java:107-143`` (fromPointDistance) — the bounding
  box a distance query prunes with before the exact haversine check
  (LUCENE-7143 7 cm pad; pole / dateline handling).
- ``core/document/LatLonPointDistanceQuery.java`` — BKD intersect =
  box prune, then exact haversine on decoded values.

Spark-first design (NOT a BKD port): the point table is written as
Parquet **sorted by the Morton interleave of the encoded coordinates**
(z-order). Parquet row-group min/max stats on ``lat_enc``/``lon_enc``
then play the BKD inner-node role: a box query is two pushed-down int
range predicates and prunes row groups exactly the way BKD prunes cells.
Distance queries prune with the reference's own bounding-box formula,
then evaluate haversine as a JVM column expression (whole-stage codegen,
no Python in the hot path). Nearest-k is haversine + TakeOrdered
(map-side partial top-k per partition, one tiny shuffle of k rows per
partition — the analog of LatLonPointDistanceFeatureQuery's best-first
BKD traversal, with the box prune optionally narrowing the scan).

Scale notes (100 TB): the build is one projection + one range
repartition/sort (z-order) — no joins; queries are scan-side pruned
range filters + a codegen'd trig expression. Nothing driver-resident,
nothing quadratic. Skewed geographies only skew the WRITE (dense cities
share z-ranges); reads stay balanced because pruning is per-row-group.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "LAT_DECODE", "LON_DECODE", "TO_METERS",
    "encode_latitude", "encode_latitude_ceil",
    "encode_longitude", "encode_longitude_ceil",
    "build_points", "read_points", "geo_box", "geo_distance", "geo_nearest",
]

# GeoEncodingUtils.java:40-43 — both are exact dyadic doubles.
LAT_DECODE = 180.0 / 4294967296.0
LON_DECODE = 360.0 / 4294967296.0
# SloppyMath.java:183 — mean earth radius used by haversinMeters.
TO_METERS = 6371008.7714
_PI = 3.141592653589793
_MIN_LAT, _MAX_LAT = -90.0, 90.0
_MIN_LON, _MAX_LON = -180.0, 180.0


def _check_lat(lat: float) -> None:
    if not (_MIN_LAT <= lat <= _MAX_LAT):
        raise ValueError(f"invalid latitude {lat}")


def _check_lon(lon: float) -> None:
    if not (_MIN_LON <= lon <= _MAX_LON):
        raise ValueError(f"invalid longitude {lon}")


def encode_latitude(lat: float) -> int:
    """GeoEncodingUtils.encodeLatitude — quantize toward -90."""
    _check_lat(lat)
    if lat == 90.0:
        lat = math.nextafter(lat, -math.inf)
    return int(math.floor(lat / LAT_DECODE))


def encode_latitude_ceil(lat: float) -> int:
    """GeoEncodingUtils.encodeLatitudeCeil — quantize toward +90."""
    _check_lat(lat)
    if lat == 90.0:
        lat = math.nextafter(lat, -math.inf)
    return int(math.ceil(lat / LAT_DECODE))


def encode_longitude(lon: float) -> int:
    _check_lon(lon)
    if lon == 180.0:
        lon = math.nextafter(lon, -math.inf)
    return int(math.floor(lon / LON_DECODE))


def encode_longitude_ceil(lon: float) -> int:
    _check_lon(lon)
    if lon == 180.0:
        lon = math.nextafter(lon, -math.inf)
    return int(math.ceil(lon / LON_DECODE))


# ---------------------------------------------------------------------------
# synthetic deterministic coordinates (gate data: no external geo data)
# ---------------------------------------------------------------------------

def synth_latlon(id_col: str = "event_id") -> tuple[F.Column, F.Column]:
    """Deterministic (lat, lon) derived from an integer id.

    Integer multiply+mod stays exact (< 2^53), the divide-by-1e4 and the
    subtraction are single correctly-rounded IEEE ops — so Spark and the
    DuckDB oracle produce bit-identical doubles from the same ids. Range
    [-85, 85) x [-175, 175): poles and dateline excluded by construction
    (they're exercised separately with explicit points in tests).
    """
    gid = F.col(id_col)
    lat = ((gid * 7919) % 1700000) / 10000.0 - 85.0
    lon = ((gid * 104729) % 3500000) / 10000.0 - 175.0
    return lat, lon


def _morton32(lat_u: "object", lon_u: "object"):
    """Interleave two uint32 arrays into uint64 Morton codes (numpy)."""
    import numpy as np

    def spread(v: "np.ndarray") -> "np.ndarray":
        # spread the 32 bits of v to the even bit positions of a uint64
        x = v.astype(np.uint64)
        x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
        x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
        return x

    return spread(lat_u) | (spread(lon_u) << __import__("numpy").uint64(1))


def build_points(
    spark: SparkSession,
    src: DataFrame,
    out_dir: str,
    id_col: str = "event_id",
    lat_col: "F.Column | None" = None,
    lon_col: "F.Column | None" = None,
    n_files: int = 8,
) -> str:
    """Write the z-ordered point table (the BKD-analog layout).

    Columns: ``gid`` (long), ``lat_enc``/``lon_enc`` (int32-ranged longs).
    Rows are range-sorted by the Morton interleave of the offset-encoded
    coordinates, so Parquet row-group min/max stats on BOTH encoded axes
    are tight — a pushed-down box predicate prunes row groups like a BKD
    inner node rejects cells (LatLonPointDistanceQuery.java intersect).
    """
    if lat_col is None or lon_col is None:
        lat_col, lon_col = synth_latlon(id_col)
    # least() clamp = GeoEncodingUtils' nextDown at the +90/+180 poles:
    # lat==90.0 / lon==180.0 would otherwise encode to 2^31 (outside
    # int32) and fall past every box whose upper edge is 2^31-1
    pts = src.select(
        F.col(id_col).cast("long").alias("gid"),
        F.least(
            F.floor(lat_col / F.lit(LAT_DECODE)), F.lit((1 << 31) - 1)
        ).cast("long").alias("lat_enc"),
        F.least(
            F.floor(lon_col / F.lit(LON_DECODE)), F.lit((1 << 31) - 1)
        ).cast("long").alias("lon_enc"),
    )

    import pandas as pd  # noqa: F401  (mapInPandas contract)

    def add_morton(batches):
        import numpy as np

        for pdf in batches:
            lat_u = (pdf["lat_enc"].to_numpy(np.int64) + (1 << 31)).astype(np.uint32)
            lon_u = (pdf["lon_enc"].to_numpy(np.int64) + (1 << 31)).astype(np.uint32)
            pdf = pdf.assign(morton=_morton32(lat_u, lon_u).astype(np.int64))
            yield pdf

    with_m = pts.mapInPandas(
        add_morton, schema="gid long, lat_enc long, lon_enc long, morton long"
    )
    (
        with_m.repartitionByRange(n_files, "morton")
        .sortWithinPartitions("morton")
        .drop("morton")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def read_points(spark: SparkSession, points_dir: str) -> DataFrame:
    return spark.read.parquet(points_dir)


def _box_pred(min_lat: float, max_lat: float, min_lon: float, max_lon: float):
    """Quantized box predicate per LatLonPoint.newBoxQuery: lower edges
    ceil-encoded, upper edges floor-encoded; minLon > maxLon = crossing
    the dateline → the union of two lon ranges (LatLonPoint.java)."""
    lat_lo = encode_latitude_ceil(min_lat)
    lat_hi = encode_latitude(max_lat)
    lat_ok = (F.col("lat_enc") >= lat_lo) & (F.col("lat_enc") <= lat_hi)
    if min_lon > max_lon:  # crosses the dateline
        lon_ok = (F.col("lon_enc") >= encode_longitude_ceil(min_lon)) | (
            F.col("lon_enc") <= encode_longitude(max_lon)
        )
    else:
        lon_ok = (F.col("lon_enc") >= encode_longitude_ceil(min_lon)) & (
            F.col("lon_enc") <= encode_longitude(max_lon)
        )
    return lat_ok & lon_ok


def geo_box(
    points: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> DataFrame:
    """LatLonPoint.newBoxQuery — two int range predicates, both pushed
    into the Parquet scan (z-order layout makes the row-group stats
    tight). Constant-score: result is the match set, no ranking."""
    return points.filter(_box_pred(min_lat, max_lat, min_lon, max_lon)).select(
        "gid", "lat_enc", "lon_enc"
    )


def _haversine_m(lat_enc, lon_enc, qlat: float, qlon: float) -> F.Column:
    """haversinMeters(decoded point, query point) as a codegen'd column
    expression — SloppyMath.java:47-75 formula, Java toRadians operation
    order (x / 180 * PI) kept so the SQL oracle can replay it verbatim."""
    lat = lat_enc * F.lit(LAT_DECODE)
    lon = lon_enc * F.lit(LON_DECODE)
    x1 = lat / 180.0 * _PI
    x2 = F.lit(qlat) / 180.0 * _PI
    h1 = 1.0 - F.cos(x1 - x2)
    h2 = 1.0 - F.cos((lon - F.lit(qlon)) / 180.0 * _PI)
    h = h1 + F.cos(x1) * F.cos(x2) * h2
    return F.lit(TO_METERS) * 2.0 * F.asin(F.least(F.lit(1.0), F.sqrt(h * 0.5)))


def distance_box(lat: float, lon: float, radius_m: float) -> tuple[float, float, float, float]:
    """Rectangle.fromPointDistance (core/geo/Rectangle.java:107-143):
    the bounding box that contains every point within radius_m of
    (lat, lon), with the reference's 7 cm pad (LUCENE-7143) and the
    pole / dateline fallbacks. Returns (minLat, maxLat, minLon, maxLon);
    minLon > maxLon means the box crosses the dateline."""
    rad_lat = math.radians(lat)
    rad_lon = math.radians(lon)
    rad_dist = (radius_m + 7e-2) / TO_METERS
    min_lat = rad_lat - rad_dist
    max_lat = rad_lat + rad_dist
    min_lat_r, max_lat_r = math.radians(_MIN_LAT), math.radians(_MAX_LAT)
    if min_lat > min_lat_r and max_lat < max_lat_r:
        delta = math.asin(math.sin(rad_dist) / math.cos(rad_lat))
        min_lon = rad_lon - delta
        if min_lon < math.radians(_MIN_LON):
            min_lon += 2 * math.pi
        max_lon = rad_lon + delta
        if max_lon > math.radians(_MAX_LON):
            max_lon -= 2 * math.pi
    else:  # a pole is inside the radius: all longitudes
        min_lat = max(min_lat, min_lat_r)
        max_lat = min(max_lat, max_lat_r)
        min_lon = math.radians(_MIN_LON)
        max_lon = math.radians(_MAX_LON)
    return (
        math.degrees(min_lat), math.degrees(max_lat),
        math.degrees(min_lon), math.degrees(max_lon),
    )


def geo_distance(
    points: DataFrame, lat: float, lon: float, radius_m: float
) -> DataFrame:
    """LatLonPoint.newDistanceQuery — box prune (pushed-down encoded
    ranges, the BKD-intersect analog) then exact haversine over the
    DECODED quantized coordinates (LatLonPointDistanceQuery.java).
    Returns the match set with the distance in float32 meters."""
    _check_lat(lat)
    _check_lon(lon)
    b = distance_box(lat, lon, radius_m)
    dist = _haversine_m(F.col("lat_enc"), F.col("lon_enc"), lat, lon)
    return (
        points.filter(_box_pred(*b))
        .withColumn("dist_m", dist)
        .filter(F.col("dist_m") <= radius_m)
        .select("gid", "lat_enc", "lon_enc", F.col("dist_m").cast("float").alias("dist_m"))
    )


def geo_nearest(
    points: DataFrame, lat: float, lon: float, k: int
) -> DataFrame:
    """LatLonPoint.nearest / newDistanceSort — global k nearest points,
    ties broken by gid. orderBy+limit compiles to TakeOrdered: each
    partition keeps its local top-k (map-side), only k rows per
    partition cross the wire — the distributed analog of the reference's
    best-first BKD traversal (LatLonPointDistanceComparator pruning)."""
    _check_lat(lat)
    _check_lon(lon)
    dist = _haversine_m(F.col("lat_enc"), F.col("lon_enc"), lat, lon)
    return (
        points.withColumn("dist_m", dist)
        .orderBy(F.col("dist_m").asc(), F.col("gid").asc())
        .limit(k)
        .select("gid", "lat_enc", "lon_enc", F.col("dist_m").cast("float").alias("dist_m"))
    )


def _polygon_edges(lats: "list[float]", lons: "list[float]"):
    """Validated closed-ring edge list [(y1, x1, y2, x2), ...] — x is
    longitude, y latitude (Polygon2D's minX/maxX are lons). Mirrors
    core/geo/Polygon.java ctor checks: >= 4 vertices, first == last,
    coords in range; no holes, no dateline crossing (the reference's
    polygons cannot cross the dateline either)."""
    if len(lats) != len(lons):
        raise ValueError("lats and lons must have the same length")
    if len(lats) < 4:
        raise ValueError("at least 4 polygon points required")
    if lats[0] != lats[-1] or lons[0] != lons[-1]:
        raise ValueError("first and last points of the polygon must be the same")
    for la in lats:
        _check_lat(la)
    for lo in lons:
        _check_lon(lo)
    return [
        (lats[i], lons[i], lats[i + 1], lons[i + 1])
        for i in range(len(lats) - 1)
    ]


def _ring_contains(lats: "list[float]", lons: "list[float]",
                   y: "F.Column | None" = None,
                   x: "F.Column | None" = None):
    """Column predicate: decoded point inside (or on) the closed ring —
    EdgeTree.containsPnPoly (core/geo/EdgeTree.java:106-138, W. R.
    Franklin's PNPOLY with Lucene's on-edge rule). ``y``/``x`` override
    the tested point (default: this table's decoded lat/lon columns):

      per edge, within the direction-insensitive y-band:
        on-edge  = x inside the edge's x-band AND orient(e1, e2, p) == 0
                   (GeoUtils.orient, the plain double cross product)
        crossing = (y1 > y) != (y2 > y) AND
                   x < (x2 - x1) * (y - y1) / (y2 - y1) + x1
      contained  = any edge on-edge  OR  XOR over edges of crossing

    Horizontal edges ((y1 > y) != (y2 > y) impossible) skip the crossing
    term at plan-build time, so no division by zero ever evaluates. The
    XOR parity compiles to sum-of-ints % 2 — pure codegen'd expressions,
    no UDF."""
    edges = _polygon_edges(lats, lons)
    if x is None:
        x = F.col("lon_enc") * F.lit(LON_DECODE)
    if y is None:
        y = F.col("lat_enc") * F.lit(LAT_DECODE)
    on_edge_any = F.lit(False)
    cross_terms = []
    for y1, x1, y2, x2 in edges:
        cond_y = ((y == y1) & (y == y2)) | (
            ((y <= y1) & (y >= y2)) != ((y >= y1) & (y <= y2))
        )
        orient_zero = (
            F.lit(x2 - x1) * (y - y1) == (x - x1) * F.lit(y2 - y1)
        )
        x_band = ((x == x1) & (x == x2)) | (
            (((x <= x1) & (x >= x2)) != ((x >= x1) & (x <= x2)))
            & orient_zero
        )
        on_edge = cond_y & x_band
        on_edge_any = on_edge_any | on_edge
        if y1 != y2:
            crossing = (
                cond_y & ~on_edge
                & ((F.lit(y1) > y) != (F.lit(y2) > y))
                & (x < F.lit(x2 - x1) * (y - y1) / F.lit(y2 - y1) + F.lit(x1))
            )
            cross_terms.append(crossing.cast("int"))
    if cross_terms:
        parity = sum(cross_terms[1:], cross_terms[0]) % 2 == 1
    else:
        parity = F.lit(False)
    return on_edge_any | parity


def geo_polygon(
    points: DataFrame, lats: "list[float]", lons: "list[float]",
    holes: "list[tuple[list[float], list[float]]] | None" = None,
) -> DataFrame:
    """LatLonPoint.newPolygonQuery — bounding-box prune pushed into the
    Parquet scan (same encoded ranges as newBoxQuery), then the EXACT
    point-in-polygon test of Polygon2D.contains (core/geo/Polygon2D.java:
    105-111) over the DECODED quantized coordinates against the RAW
    polygon vertices, entirely as codegen'd column expressions (see
    :func:`_ring_contains`).

    ``holes``: interior rings, each a (lats, lons) closed ring. A point
    inside the shell is contained unless ANY hole contains it —
    Polygon2D.java:109 ``return holes == null || holes.contains(x, y) ==
    false``; a point ON a hole's boundary counts as inside the hole and
    is therefore EXCLUDED (the hole component's contains includes its
    edges), matching the reference's code path exactly. One codegen'd
    projection, no UDF, no shuffle, holes or not."""
    pred = _ring_contains(lats, lons)
    for h_lats, h_lons in holes or ():
        pred = pred & ~_ring_contains(h_lats, h_lons)
    box = _box_pred(min(lats), max(lats), min(lons), max(lons))
    return points.filter(box & pred).select("gid", "lat_enc", "lon_enc")
