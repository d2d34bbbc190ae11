"""LatLonShape subset: tessellation + box-relation tests.

Layers (SURVEY §5 shape):
  - integer-exact tessellation invariants (area conservation, CCW
    orientation, membership equivalence vs an independent exact PNPOLY),
  - handcrafted box-vs-triangle relation cases (each Rectangle2D branch),
  - end-to-end rects vs closed-interval brute (the gate's logic),
  - end-to-end STAR polygons vs an independent integer-exact
    polygon-box intersect (vertex-in / corner-in / edge-cross).
"""

import random

import numpy as np
import pytest

from lucene_spark.operators import shapes as sh
from lucene_spark.operators.spatial import encode_latitude, encode_longitude


# ------------------------------------------------------- exact int helpers

def _orient(ay, ax, by, bx, cy, cx):
    v = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
    return 1 if v > 0 else (-1 if v < 0 else 0)


def _on_edge(py, px, ay, ax, by, bx):
    return (
        _orient(ay, ax, by, bx, py, px) == 0
        and min(ax, bx) <= px <= max(ax, bx)
        and min(ay, by) <= py <= max(ay, by)
    )


def _pnpoly(verts, py, px):
    """Exact-integer ray parity over encoded verts [(y, x)...], boundary
    inclusive (mirrors the triangle union's boundary-inclusive member)."""
    n = len(verts)
    inside = False
    for i in range(n):
        (y1, x1), (y2, x2) = verts[i], verts[(i + 1) % n]
        if _on_edge(py, px, y1, x1, y2, x2):
            return True
        if (y1 > py) != (y2 > py):
            # px < x1 + (x2-x1)*(py-y1)/(y2-y1), exactly in ints
            lhs = (px - x1) * (y2 - y1)
            rhs = (x2 - x1) * (py - y1)
            if (lhs < rhs) if y2 > y1 else (lhs > rhs):
                inside = not inside
    return inside


def _tri_area2(t):
    ay, ax, by, bx, cy, cx = (int(v) for v in t)
    return abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay))


def _ring_area2(verts):
    return abs(sum(
        verts[i][1] * verts[(i + 1) % len(verts)][0]
        - verts[(i + 1) % len(verts)][1] * verts[i][0]
        for i in range(len(verts))
    ))


def _star(cid, n_arms, base_r=3.0, lat0=10.0, lon0=20.0):
    """Deterministic star-shaped (hence simple) ring around a center."""
    rng = random.Random(cid)
    lats, lons = [], []
    for i in range(2 * n_arms):
        r = base_r * (1.0 if i % 2 == 0 else rng.uniform(0.3, 0.6))
        ang = 2 * np.pi * i / (2 * n_arms)
        lats.append(lat0 + r * float(np.sin(ang)))
        lons.append(lon0 + r * float(np.cos(ang)))
    lats.append(lats[0])
    lons.append(lons[0])
    return lats, lons


# ----------------------------------------------------------- tessellation

@pytest.mark.parametrize("cid,n_arms", [(1, 3), (2, 4), (3, 5), (4, 7), (5, 9)])
def test_tessellate_star_invariants(cid, n_arms):
    lats, lons = _star(cid, n_arms)
    verts = [(encode_latitude(la), encode_longitude(lo))
             for la, lo in zip(lats[:-1], lons[:-1])]
    tris = sh.tessellate(lats, lons)
    assert len(tris) == len(verts) - 2
    # exact area conservation: sum of triangle areas == ring area
    assert sum(_tri_area2(t) for t in tris) == _ring_area2(verts)
    # every emitted triangle is CCW and non-degenerate
    for t in tris:
        ay, ax, by, bx, cy, cx = (int(v) for v in t)
        assert _orient(ay, ax, by, bx, cy, cx) == 1
    # membership equivalence on a deterministic sample grid
    ys = [v[0] for v in verts]
    xs = [v[1] for v in verts]
    rng = random.Random(99 + cid)
    for _ in range(300):
        py = rng.randrange(min(ys) - 5, max(ys) + 6)
        px = rng.randrange(min(xs) - 5, max(xs) + 6)
        in_ring = _pnpoly(verts, py, px)
        in_union = any(
            sh._point_in_tri_i(py, px, *(int(v) for v in t)) for t in tris
        )
        assert in_ring == in_union, (py, px)


def test_tessellate_orientation_and_degenerates():
    # CW input normalizes to the same triangle set (reversed ring)
    lats = [10.0, 10.0, 12.0, 12.0, 10.0]
    lons = [20.0, 25.0, 25.0, 20.0, 20.0]
    ccw = sh.tessellate(lats, lons)
    cw = sh.tessellate(lats[::-1], lons[::-1])
    # reversal may pick the other (equally valid) diagonal — the indexed
    # GEOMETRY (triangle union) must be identical: same area, same
    # membership for sampled points
    assert len(cw) == len(ccw) == 2
    assert sum(_tri_area2(t) for t in cw) == sum(_tri_area2(t) for t in ccw)
    rng = random.Random(5)
    ys = [encode_latitude(v) for v in (9.5, 10.0, 11.0, 12.0, 12.5)]
    xs = [encode_longitude(v) for v in (19.5, 20.0, 22.0, 25.0, 25.5)]
    for py in ys:
        for px in xs:
            a = any(sh._point_in_tri_i(py, px, *(int(v) for v in t))
                    for t in ccw)
            b = any(sh._point_in_tri_i(py, px, *(int(v) for v in t))
                    for t in cw)
            assert a == b
    assert len(ccw) == 2
    # collinear midpoint vertex is clipped without emitting a triangle:
    # the ring is a triangle with a redundant mid-edge vertex
    col = sh.tessellate(
        [10.0, 10.0, 10.0, 12.0, 10.0], [20.0, 22.5, 25.0, 25.0, 20.0]
    )
    plain = sh.tessellate([10.0, 10.0, 12.0, 10.0], [20.0, 25.0, 25.0, 20.0])
    assert sum(_tri_area2(t) for t in col) == sum(_tri_area2(t) for t in plain)
    # self-intersecting bowtie raises
    with pytest.raises(ValueError):
        sh.tessellate([0.0, 2.0, 0.0, 2.0, 0.0], [0.0, 2.0, 2.0, 0.0, 0.0])
    # open ring rejected
    with pytest.raises(ValueError):
        sh.tessellate([0.0, 1.0, 1.0], [0.0, 0.0, 1.0])


# ---------------------------------------------------- box-triangle relations

def _one_shape(spark, tmp_path, lats, lons, gid=7):
    src = spark.createDataFrame(
        [(gid, lats, lons)], "gid long, lats array<double>, lons array<double>"
    )
    out = str(tmp_path / "shp")
    sh.build_shapes(spark, src, out, n_files=1)
    return sh.read_shapes(spark, out)


def test_box_relation_branches(spark, tmp_path):
    # triangle-ish quad around (10, 20) +- 2 degrees
    tri = _one_shape(
        spark, tmp_path,
        [8.0, 12.0, 12.0, 8.0, 8.0], [18.0, 18.0, 22.0, 22.0, 18.0],
    )

    def rel(r, box):
        return {x.gid for x in sh.shape_box(tri, r, *box).collect()}

    # box far away: disjoint
    assert rel(sh.INTERSECTS, (50, 60, 50, 60)) == set()
    assert rel(sh.DISJOINT, (50, 60, 50, 60)) == {7}
    # box overlapping one corner: intersects, not within
    assert rel(sh.INTERSECTS, (11, 20, 21, 30)) == {7}
    assert rel(sh.WITHIN, (11, 20, 21, 30)) == set()
    # box strictly inside the shape (corner-in-triangle path only)
    assert rel(sh.INTERSECTS, (9.5, 10.5, 19.5, 20.5)) == {7}
    # box containing the whole shape: within
    assert rel(sh.WITHIN, (0, 20, 10, 30)) == {7}
    assert rel(sh.INTERSECTS, (0, 20, 10, 30)) == {7}
    # box sharing only the boundary edge: boundary-inclusive intersects
    assert rel(sh.INTERSECTS, (0.0, 8.0, 18.0, 22.0)) == {7}
    # collinear-but-disjoint: box aligned with the bottom edge's line,
    # beyond the shape's x-range (the edgesIntersect bbox shortcut)
    assert rel(sh.INTERSECTS, (8.0, 8.0, 30.0, 40.0)) == set()


# ----------------------------------------------------------- end-to-end

def test_star_polygons_end_to_end(spark, tmp_path):
    """50 star polygons; INTERSECTS/WITHIN/DISJOINT vs an independent
    integer-exact polygon-box relation (no tessellation involved)."""
    docs = []
    rings = {}
    for gid in range(50):
        lat0 = -60.0 + (gid * 37 % 120)
        lon0 = -150.0 + (gid * 61 % 300)
        lats, lons = _star(gid, 3 + gid % 4, base_r=2.0 + gid % 3,
                           lat0=lat0, lon0=lon0)
        docs.append((gid, lats, lons))
        rings[gid] = [(encode_latitude(la), encode_longitude(lo))
                      for la, lo in zip(lats[:-1], lons[:-1])]
    src = spark.createDataFrame(
        docs, "gid long, lats array<double>, lons array<double>"
    )
    out = str(tmp_path / "stars")
    sh.build_shapes(spark, src, out, n_files=4)
    tri = sh.read_shapes(spark, out)

    box = (-20.0, 30.0, -60.0, 40.0)
    from lucene_spark.operators.spatial import (
        encode_latitude_ceil, encode_longitude_ceil,
    )
    qminy = encode_latitude_ceil(box[0])
    qmaxy = encode_latitude(box[1])
    qminx = encode_longitude_ceil(box[2])
    qmaxx = encode_longitude(box[3])

    def seg_crosses_box_edge(y1, x1, y2, x2):
        # the reference's segment-bbox shortcut + boundary-inclusive
        # orient test against each box edge, exact ints
        if (max(x1, x2) < qminx or min(x1, x2) > qmaxx
                or min(y1, y2) > qmaxy or max(y1, y2) < qminy):
            return False
        corners = [(qminy, qminx), (qminy, qmaxx), (qmaxy, qmaxx),
                   (qmaxy, qminx)]
        for i in range(4):
            (ey1, ex1), (ey2, ex2) = corners[i], corners[(i + 1) % 4]
            o1 = _orient(ey1, ex1, ey2, ex2, y1, x1)
            o2 = _orient(ey1, ex1, ey2, ex2, y2, x2)
            o3 = _orient(y1, x1, y2, x2, ey1, ex1)
            o4 = _orient(y1, x1, y2, x2, ey2, ex2)
            if o1 * o2 <= 0 and o3 * o4 <= 0:
                return True
        return False

    def brute_intersects(verts):
        if any(qminy <= y <= qmaxy and qminx <= x <= qmaxx
               for y, x in verts):
            return True
        if _pnpoly(verts, qminy, qminx):
            return True
        n = len(verts)
        return any(
            seg_crosses_box_edge(*verts[i], *verts[(i + 1) % n])
            for i in range(n)
        )

    def brute_within(verts):
        return all(qminy <= y <= qmaxy and qminx <= x <= qmaxx
                   for y, x in verts)

    want_inter = {g for g, v in rings.items() if brute_intersects(v)}
    want_within = {g for g, v in rings.items() if brute_within(v)}
    got_inter = {r.gid for r in sh.shape_box(tri, sh.INTERSECTS, *box).collect()}
    got_within = {r.gid for r in sh.shape_box(tri, sh.WITHIN, *box).collect()}
    got_disj = {r.gid for r in sh.shape_box(tri, sh.DISJOINT, *box).collect()}
    assert got_inter == want_inter
    assert got_within == want_within
    assert got_disj == set(rings) - want_inter
    # sanity: the box splits the population three ways
    assert want_within and want_inter - want_within and got_disj


# ------------------------------------------------------ polygon query

def test_polygon_query_branches(spark, tmp_path):
    quad = _one_shape(
        spark, tmp_path,
        [8.0, 12.0, 12.0, 8.0, 8.0], [18.0, 18.0, 22.0, 22.0, 18.0],
    )

    def rel(r, lats, lons):
        return {x.gid for x in sh.shape_polygon(quad, r, lats, lons).collect()}

    # triangle query polygon strictly inside the shape: only the
    # p0-in-triangle branch can fire
    tri_in = ([9.3, 10.7, 10.7, 9.3], [19.3, 19.3, 20.7, 19.3])
    assert rel(sh.INTERSECTS, *tri_in) == {7}
    assert rel(sh.WITHIN, *tri_in) == set()
    # big pentagon containing the shape: within
    penta = ([-30.0, -40.0, 10.0, 50.0, 20.0, -30.0],
             [-60.0, 20.0, 70.0, 10.0, -55.0, -60.0])
    assert rel(sh.WITHIN, *penta) == {7}
    assert rel(sh.INTERSECTS, *penta) == {7}
    # polygon overlapping one corner of the shape (edge crossings)
    corner = ([11.0, 14.0, 14.0, 11.0, 11.0], [21.0, 21.0, 25.0, 25.0, 21.0])
    assert rel(sh.INTERSECTS, *corner) == {7}
    assert rel(sh.WITHIN, *corner) == set()
    # far away: disjoint
    far = ([50.0, 55.0, 55.0, 50.0, 50.0], [50.0, 50.0, 55.0, 55.0, 50.0])
    assert rel(sh.INTERSECTS, *far) == set()
    assert rel(sh.DISJOINT, *far) == {7}
    # concave (arrow) polygon whose notch excludes the shape's center
    # column but whose arms overlap it
    arrow = ([6.0, 16.0, 16.0, 10.5, 16.0, 6.0],
             [16.0, 16.0, 19.0, 20.0, 23.0, 16.0])
    assert rel(sh.INTERSECTS, *arrow) == {7}


def test_polygon_query_matches_box_on_rect_polygon(spark, tmp_path):
    """A rectangular query polygon must answer like shape_box with the
    same bounds (coords chosen away from quantization boundaries)."""
    docs = []
    for gid in range(40):
        la = -60.0 + (gid * 37 % 120) + 0.123
        lo = -150.0 + (gid * 61 % 300) + 0.321
        lats, lons = _star(gid, 4, base_r=2.5, lat0=la, lon0=lo)
        docs.append((gid, lats, lons))
    src = spark.createDataFrame(
        docs, "gid long, lats array<double>, lons array<double>"
    )
    out = str(tmp_path / "mix")
    sh.build_shapes(spark, src, out, n_files=2)
    tri = sh.read_shapes(spark, out)
    box = (-15.234, 26.0, -55.678, 35.789)
    ring_lats = [box[0], box[0], box[1], box[1], box[0]]
    ring_lons = [box[2], box[3], box[3], box[2], box[2]]
    for r in (sh.INTERSECTS, sh.WITHIN, sh.DISJOINT):
        got_b = {x.gid for x in sh.shape_box(tri, r, *box).collect()}
        got_p = {x.gid
                 for x in sh.shape_polygon(tri, r, ring_lats, ring_lons)
                 .collect()}
        assert got_b == got_p, r
    inter = {x.gid for x in sh.shape_box(tri, sh.INTERSECTS, *box).collect()}
    within = {x.gid for x in sh.shape_box(tri, sh.WITHIN, *box).collect()}
    assert within and within < inter  # non-trivial split
