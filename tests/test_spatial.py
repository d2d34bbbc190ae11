"""LatLonPoint family: quantization semantics, brute-force equivalence,
dateline/pole handling, gate boundary-gap guarantees, plan hygiene.

Reference semantics under test: core/geo/GeoEncodingUtils.java (encode
floor / encodeCeil, 90/180 nextDown edge), core/geo/Rectangle.java:107
(fromPointDistance box is a superset of the circle),
core/util/SloppyMath.java:47 (haversinMeters on decoded coords),
core/document/LatLonPoint.java (box/distance/nearest semantics).
"""

import math
import os

import pytest

from lucene_spark.operators import spatial as sp

SF_DIR = "/root/testdata/sf0.01"


def _brute_points(n=10000):
    """Python replay of synth_latlon + encode over event ids 0..n-1."""
    pts = []
    for gid in range(n):
        lat = ((gid * 7919) % 1700000) / 10000.0 - 85.0
        lon = ((gid * 104729) % 3500000) / 10000.0 - 175.0
        pts.append((gid, sp.encode_latitude(lat), sp.encode_longitude(lon)))
    return pts


def _haversine(lat_enc, lon_enc, qlat, qlon):
    lat = lat_enc * sp.LAT_DECODE
    lon = lon_enc * sp.LON_DECODE
    x1 = lat / 180.0 * math.pi
    x2 = qlat / 180.0 * math.pi
    h1 = 1.0 - math.cos(x1 - x2)
    h2 = 1.0 - math.cos((lon - qlon) / 180.0 * math.pi)
    h = h1 + math.cos(x1) * math.cos(x2) * h2
    return sp.TO_METERS * 2.0 * math.asin(min(1.0, math.sqrt(h * 0.5)))


@pytest.fixture(scope="module")
def points_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pts") / "points")
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    sp.build_points(spark, ev, out, id_col="event_id", n_files=16)
    return out


# ---------------------------------------------------------------- encoding

def test_encode_quantization_edges():
    # floor toward -90 / ceil toward +90 (GeoEncodingUtils.java:58-81)
    assert sp.encode_latitude(0.0) == 0
    assert sp.encode_latitude_ceil(0.0) == 0
    v = 12.3456
    lo, hi = sp.encode_latitude(v), sp.encode_latitude_ceil(v)
    assert hi - lo == 1  # non-representable value straddles one step
    # decode error strictly below one quantum
    assert abs(lo * sp.LAT_DECODE - v) < sp.LAT_DECODE
    # the 90/180 maxima encode without overflow via nextDown
    assert sp.encode_latitude(90.0) == sp.encode_latitude(math.nextafter(90.0, 0))
    assert sp.encode_longitude(180.0) == sp.encode_longitude(math.nextafter(180.0, 0))
    assert sp.encode_latitude(-90.0) == -(1 << 31)
    with pytest.raises(ValueError):
        sp.encode_latitude(90.5)
    with pytest.raises(ValueError):
        sp.encode_longitude(-180.5)


# ------------------------------------------------------------------- box

def test_box_matches_brute(spark, points_dir):
    box = (-20.0, 35.0, 10.0, 120.0)
    got = {
        r.gid for r in sp.geo_box(sp.read_points(spark, points_dir), *box).collect()
    }
    lat_lo, lat_hi = sp.encode_latitude_ceil(box[0]), sp.encode_latitude(box[1])
    lon_lo, lon_hi = sp.encode_longitude_ceil(box[2]), sp.encode_longitude(box[3])
    want = {
        g for g, la, lo in _brute_points()
        if lat_lo <= la <= lat_hi and lon_lo <= lo <= lon_hi
    }
    assert got == want and len(want) > 100


def test_box_dateline_crossing(spark, points_dir):
    # minLon > maxLon: LatLonPoint.newBoxQuery splits into two lon ranges
    box = (-60.0, 60.0, 160.0, -160.0)
    got = {
        r.gid for r in sp.geo_box(sp.read_points(spark, points_dir), *box).collect()
    }
    lat_lo, lat_hi = sp.encode_latitude_ceil(box[0]), sp.encode_latitude(box[1])
    lon_lo, lon_hi = sp.encode_longitude_ceil(box[2]), sp.encode_longitude(box[3])
    want = {
        g for g, la, lo in _brute_points()
        if lat_lo <= la <= lat_hi and (lo >= lon_lo or lo <= lon_hi)
    }
    assert got == want and len(want) > 10


# -------------------------------------------------------------- distance

def test_distance_matches_brute_circle(spark, points_dir):
    """Engine (box prune + haversine) == pure haversine membership:
    proves Rectangle.fromPointDistance never excludes a true match."""
    qlat, qlon, radius = 10.0, 20.0, 3_000_000.0
    got = {
        r.gid
        for r in sp.geo_distance(
            sp.read_points(spark, points_dir), qlat, qlon, radius
        ).collect()
    }
    want = {
        g for g, la, lo in _brute_points()
        if _haversine(la, lo, qlat, qlon) <= radius
    }
    assert got == want and len(want) > 50


def test_distance_pole_box_covers_all_longitudes():
    b = sp.distance_box(88.0, 10.0, 1_000_000.0)  # north pole inside radius
    assert b[2] == -180.0 and b[3] == 180.0


def test_gate_boundary_gaps():
    """The driver gate's parameters keep every point safely away from the
    radius boundary and the rank-k boundary, so sub-ulp cross-engine trig
    differences cannot flip membership or rank (see oracle_spatial.py)."""
    import __spark_entry__ as E

    qlat, qlon = E.GEO_CENTER
    dists = sorted(
        (_haversine(la, lo, qlat, qlon), g) for g, la, lo in _brute_points()
    )
    # radius boundary: nearest point to the cut is > 1 m away
    gap = min(abs(d - E.GEO_RADIUS_M) for d, _ in dists)
    assert gap > 1.0, gap
    # rank-k boundary: kth and (k+1)th nearest differ by > 1e-3 m
    assert dists[E.GEO_K][0] - dists[E.GEO_K - 1][0] > 1e-3


def test_nearest_matches_brute(spark, points_dir):
    qlat, qlon = 10.0, 20.0
    got = [
        (r.gid, r.dist_m)
        for r in sp.geo_nearest(
            sp.read_points(spark, points_dir), qlat, qlon, 10
        ).collect()
    ]
    want = sorted(
        ((_haversine(la, lo, qlat, qlon), g) for g, la, lo in _brute_points())
    )[:10]
    assert [g for g, _ in got] == [g for _, g in want]
    for (_, dm), (d, _) in zip(got, want):
        assert dm == pytest.approx(d, rel=1e-6)


# ---------------------------------------------------------- plan hygiene

def test_box_predicates_push_to_scan(spark, points_dir):
    """The encoded range predicates must reach the Parquet scan, where the
    z-ordered layout's row-group stats prune like BKD inner nodes."""
    df = sp.geo_box(sp.read_points(spark, points_dir), -20.0, 35.0, 10.0, 120.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "lat_enc" in pushed and "lon_enc" in pushed
    assert "GreaterThanOrEqual(lat_enc" in pushed


def test_zorder_layout_prunes_row_groups(spark, points_dir):
    """Row-group min/max stats under the z-order sort are tight enough
    that a small box touches a strict subset of files/row groups."""
    import pyarrow.parquet as pq

    files = [
        os.path.join(points_dir, f)
        for f in os.listdir(points_dir)
        if f.endswith(".parquet")
    ]
    assert len(files) >= 8
    # a box confined to the (lat>0, lon<0) z-quadrant: files whose
    # z-range lies in other quadrants must be prunable by their stats
    box = (30.0, 60.0, -150.0, -60.0)
    lat_lo, lat_hi = sp.encode_latitude_ceil(box[0]), sp.encode_latitude(box[1])
    lon_lo, lon_hi = sp.encode_longitude_ceil(box[2]), sp.encode_longitude(box[3])
    overlapping = total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        for rg in range(md.num_row_groups):
            total += 1
            la = md.row_group(rg).column(cols["lat_enc"]).statistics
            lo = md.row_group(rg).column(cols["lon_enc"]).statistics
            if (la.min <= lat_hi and la.max >= lat_lo
                    and lo.min <= lon_hi and lo.max >= lon_lo):
                overlapping += 1
    # z-order keeps row-group stats tight on BOTH axes: the quadrant box
    # must skip at least half of the row groups (BKD-style cell rejection)
    assert overlapping <= total // 2, (overlapping, total)


# ---------------------------------------------------------------- polygon

POLY_LATS = [-30.0, -40.0, 10.0, 50.0, 20.0, -30.0]
POLY_LONS = [-60.0, 20.0, 70.0, 10.0, -55.0, -60.0]


def _pnpoly_contains(lats, lons, y, x):
    """Python replay of EdgeTree.containsPnPoly (plain double math,
    GeoUtils.orient cross product) — on-edge OR odd crossing parity."""
    parity = False
    for i in range(len(lats) - 1):
        y1, x1, y2, x2 = lats[i], lons[i], lats[i + 1], lons[i + 1]
        cond_y = (y == y1 and y == y2) or (
            (y <= y1 and y >= y2) != (y >= y1 and y <= y2)
        )
        if not cond_y:
            continue
        orient_zero = (x2 - x1) * (y - y1) == (x - x1) * (y2 - y1)
        if (x == x1 and x == x2) or (
            ((x <= x1 and x >= x2) != (x >= x1 and x <= x2)) and orient_zero
        ):
            return True  # ON_EDGE
        if (y1 > y) != (y2 > y):
            parity ^= x < (x2 - x1) * (y - y1) / (y2 - y1) + x1
    return parity


def test_polygon_matches_brute(spark, points_dir):
    got = {
        r.gid
        for r in sp.geo_polygon(
            sp.read_points(spark, points_dir), POLY_LATS, POLY_LONS
        ).collect()
    }
    want = {
        g
        for g, la, lo in _brute_points()
        if _pnpoly_contains(
            POLY_LATS, POLY_LONS, la * sp.LAT_DECODE, lo * sp.LON_DECODE
        )
    }
    assert got == want and len(want) > 100
    # with an interior hole (Polygon2D.java:109): shell minus hole,
    # hole boundary excluded — against the same brute PNPOLY replay
    h_lats = [-5.0, 15.0, 15.0, -5.0, -5.0]
    h_lons = [-10.0, -10.0, 20.0, 20.0, -10.0]
    got_h = {
        r.gid
        for r in sp.geo_polygon(
            sp.read_points(spark, points_dir), POLY_LATS, POLY_LONS,
            holes=[(h_lats, h_lons)],
        ).collect()
    }
    want_h = {
        g
        for g, la, lo in _brute_points()
        if _pnpoly_contains(
            POLY_LATS, POLY_LONS, la * sp.LAT_DECODE, lo * sp.LON_DECODE
        )
        and not _pnpoly_contains(
            h_lats, h_lons, la * sp.LAT_DECODE, lo * sp.LON_DECODE
        )
    }
    assert got_h == want_h
    assert got_h < got  # the hole actually removed interior points
    # the polygon is a strict subset of its bounding box
    bbox = {
        r.gid
        for r in sp.geo_box(
            sp.read_points(spark, points_dir),
            min(POLY_LATS), max(POLY_LATS), min(POLY_LONS), max(POLY_LONS),
        ).collect()
    }
    assert got < bbox


def test_polygon_on_edge_and_interior(spark, tmp_path):
    """Hand-built points: interior, exterior, vertex, on-edge, and a
    point whose horizontal ray passes through a vertex (the classic
    parity trap PNPOLY's half-open y-band rule resolves)."""
    from pyspark.sql import functions as F

    # triangle (0,0) (40,20) (0,40), closed
    lats = [0.0, 40.0, 0.0, 0.0]
    lons = [0.0, 20.0, 40.0, 0.0]
    rows = [
        (1, 10.0, 20.0, True),    # interior
        (2, 50.0, 20.0, False),   # above apex
        (3, 10.0, -5.0, False),   # left of polygon at its y
        (4, 0.0, 10.0, True),     # on the bottom edge
        (5, 0.0, 0.0, True),      # vertex
        (6, -1.0, 20.0, False),   # below
        (7, 20.0, 10.0, True),    # exactly on left slanted edge
        (8, 20.0, 35.0, False),   # right of the right edge at y=20
    ]
    src = spark.createDataFrame(
        [(i, la, lo) for i, la, lo, _ in rows], "id long, la double, lo double"
    )
    out = str(tmp_path / "pts")
    sp.build_points(
        spark, src, out, id_col="id", lat_col=F.col("la"), lon_col=F.col("lo")
    )
    got = {
        r.gid
        for r in sp.geo_polygon(sp.read_points(spark, out), lats, lons).collect()
    }
    # quantization: lat 10.0 etc. decode a hair off the exact values, but
    # every expectation here is quantization-stable EXCEPT exact on-edge
    # points, which floor-encode to just below the edge for positive
    # non-representable coords; recompute expectations on decoded coords
    want = set()
    for i, la, lo, _ in rows:
        y = sp.encode_latitude(la) * sp.LAT_DECODE
        x = sp.encode_longitude(lo) * sp.LON_DECODE
        if _pnpoly_contains(lats, lons, y, x):
            want.add(i)
    assert got == want
    # the brute replay agrees with the geometric truth for the clearly
    # inside/outside rows (quantization can only flip exact-boundary rows)
    for i, la, lo, inside in rows:
        if i in (4, 5, 7):
            continue
        assert (i in want) == inside
