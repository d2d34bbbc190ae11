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


# --------------------------------------------------- holes + edge flags

def _star_hole(cid, lat0, lon0, r=0.9):
    """Small rectangle hole near the star center (inside the inner
    radius, which is >= 0.3 * base_r)."""
    return ([lat0 - r/3, lat0 - r/3, lat0 + r/3, lat0 + r/3, lat0 - r/3],
            [lon0 - r/3, lon0 + r/3, lon0 + r/3, lon0 - r/3, lon0 - r/3])


@pytest.mark.parametrize("cid,n_arms", [(11, 3), (12, 5), (13, 7)])
def test_tessellate_holes_membership(cid, n_arms):
    """Holed tessellation: union == (shell, boundary-inclusive) minus
    (hole interior, boundary stays in) — checked point-exactly; area ==
    shell - hole; every triangle CCW; flags mark exactly the edges on
    the original boundary (shell or hole)."""
    lats, lons = _star(cid, n_arms, base_r=3.0)
    hla, hlo = _star_hole(cid, 10.0, 20.0)
    shell = [(encode_latitude(la), encode_longitude(lo))
             for la, lo in zip(lats[:-1], lons[:-1])]
    hole = [(encode_latitude(la), encode_longitude(lo))
            for la, lo in zip(hla[:-1], hlo[:-1])]
    tris, flags = sh.tessellate_with_flags(lats, lons, [(hla, hlo)])
    assert sum(_tri_area2(t) for t in tris) == (
        _ring_area2(shell) - _ring_area2(hole)
    )
    orig_edges = (
        [(shell[i], shell[(i + 1) % len(shell)]) for i in range(len(shell))]
        + [(hole[i], hole[(i + 1) % len(hole)]) for i in range(len(hole))]
    )
    for t, f in zip(tris, flags):
        ay, ax, by, bx, cy, cx = (int(v) for v in t)
        assert _orient(ay, ax, by, bx, cy, cx) == 1
        for (p, q), flag in zip(
            [((ay, ax), (by, bx)), ((by, bx), (cy, cx)),
             ((cy, cx), (ay, ax))], f
        ):
            on_orig = sh._edge_on_original(p, q, orig_edges)
            assert bool(flag) == on_orig, (p, q, flag)
    # membership equivalence on a sample grid
    ys = [v[0] for v in shell]
    xs = [v[1] for v in shell]
    rng = random.Random(7 + cid)

    def on_ring_edge(verts, py, px):
        n = len(verts)
        return any(
            _on_edge(py, px, *verts[i], *verts[(i + 1) % n])
            for i in range(n)
        )

    for _ in range(400):
        py = rng.randrange(min(ys) - 5, max(ys) + 6)
        px = rng.randrange(min(xs) - 5, max(xs) + 6)
        want = _pnpoly(shell, py, px) and (
            not _pnpoly(hole, py, px) or on_ring_edge(hole, py, px)
        )
        got = any(
            sh._point_in_tri_i(py, px, *(int(v) for v in t)) for t in tris
        )
        assert got == want, (py, px)
    # and some points sampled inside the hole band specifically
    hys = [v[0] for v in hole]
    hxs = [v[1] for v in hole]
    for _ in range(200):
        py = rng.randrange(min(hys) - 2, max(hys) + 3)
        px = rng.randrange(min(hxs) - 2, max(hxs) + 3)
        want = _pnpoly(shell, py, px) and (
            not _pnpoly(hole, py, px) or on_ring_edge(hole, py, px)
        )
        got = any(
            sh._point_in_tri_i(py, px, *(int(v) for v in t)) for t in tris
        )
        assert got == want, (py, px)


# ----------------------------------------------------------- CONTAINS

def _brute_within_relation(tris, flags, qminy, qmaxy, qminx, qmaxx):
    """Exact-integer replay of Rectangle2D.withinTriangle +
    SpatialQuery's within combination."""
    corners = [(qminy, qminx), (qminy, qmaxx), (qmaxy, qmaxx),
               (qmaxy, qminx)]

    def in_box(y, x):
        return qminy <= y <= qmaxy and qminx <= x <= qmaxx

    def edge_intersects(y1, x1, y2, x2):
        if (max(x1, x2) < qminx or min(x1, x2) > qmaxx
                or min(y1, y2) > qmaxy or max(y1, y2) < qminy):
            return False
        for i in range(4):
            (ey1, ex1), (ey2, ex2) = corners[i], corners[(i + 1) % 4]
            o1 = _orient(ey1, ex1, ey2, ex2, y1, x1)
            o2 = _orient(ey1, ex1, ey2, ex2, y2, x2)
            o3 = _orient(y1, x1, y2, x2, ey1, ex1)
            o4 = _orient(y1, x1, y2, x2, ey2, ex2)
            if o1 * o2 <= 0 and o3 * o4 <= 0:
                return True
        return False

    any_candidate = False
    for t, f in zip(tris, flags):
        ay, ax, by, bx, cy, cx = (int(v) for v in t)
        if (max(ay, by, cy) < qminy or min(ay, by, cy) > qmaxy
                or max(ax, bx, cx) < qminx or min(ax, bx, cx) > qmaxx):
            continue  # DISJOINT
        if in_box(ay, ax) or in_box(by, bx) or in_box(cy, cx):
            return False  # NOTWITHIN
        cand = False
        for (p, q), flag in zip(
            [((ay, ax), (by, bx)), ((by, bx), (cy, cx)),
             ((cy, cx), (ay, ax))], f
        ):
            if edge_intersects(*p, *q):
                if flag:
                    return False  # NOTWITHIN
                cand = True
        if cand or sh._point_in_tri_i(qminy, qminx, ay, ax, by, bx,
                                      cy, cx):
            any_candidate = True
    return any_candidate


def test_contains_box_end_to_end(spark, tmp_path):
    """CONTAINS over 40 holed stars vs the exact per-triangle replay;
    the query box is small so several shapes contain it."""
    docs, shapes_py = [], {}
    for gid in range(40):
        lat0 = 8.0 + (gid % 5) * 0.8
        lon0 = 18.0 + (gid % 7) * 0.9
        lats, lons = _star(gid + 50, 3 + gid % 4, base_r=4.0,
                           lat0=lat0, lon0=lon0)
        hla, hlo = _star_hole(gid, lat0, lon0, r=1.0)
        docs.append((gid, lats, lons, [(hla, hlo)]))
        shapes_py[gid] = sh.tessellate_with_flags(lats, lons, [(hla, hlo)])
    src = spark.createDataFrame(
        [(g, la, lo, [{"lats": h[0], "lons": h[1]} for h in hs])
         for g, la, lo, hs in docs],
        "gid long, lats array<double>, lons array<double>, "
        "holes array<struct<lats: array<double>, lons: array<double>>>",
    )
    out = str(tmp_path / "holed")
    sh.build_shapes(spark, src, out, holes_col="holes", n_files=2)
    tri = sh.read_shapes(spark, out)
    # a small box near the star field, away from the holes
    box = (9.1, 9.6, 19.6, 20.4)
    from lucene_spark.operators.spatial import (
        encode_latitude_ceil, encode_longitude_ceil,
    )
    qminy = encode_latitude_ceil(box[0])
    qmaxy = encode_latitude(box[1])
    qminx = encode_longitude_ceil(box[2])
    qmaxx = encode_longitude(box[3])
    want = {g for g, (t, f) in shapes_py.items()
            if _brute_within_relation(t, f, qminy, qmaxy, qminx, qmaxx)}
    got = {r.gid for r in sh.shape_box(tri, sh.CONTAINS, *box).collect()}
    assert got == want
    # non-trivial: some shapes contain the box, some don't
    assert want and len(want) < len(shapes_py)
    # a box inside a hole is NOT contained: center the box inside gid 0's
    # hole (hole spans +-1/3 deg around the star center)
    lat0, lon0 = 8.0, 18.0
    hole_box = (lat0 - 0.05, lat0 + 0.05, lon0 - 0.05, lon0 + 0.05)
    got_hole = {r.gid
                for r in sh.shape_box(tri, sh.CONTAINS, *hole_box).collect()}
    assert 0 not in got_hole
    # INTERSECTS/WITHIN/DISJOINT still work over the holed table
    inter = {r.gid for r in sh.shape_box(tri, sh.INTERSECTS, *box).collect()}
    assert got <= inter


def test_contains_polygon_matches_box_on_rect_query(spark, tmp_path):
    """A rectangular CONTAINS query polygon answers like CONTAINS box."""
    docs = []
    for gid in range(25):
        lat0 = 8.0 + (gid % 5) * 0.7
        lon0 = 18.0 + (gid % 5) * 0.8
        lats, lons = _star(gid + 90, 4, base_r=3.5, lat0=lat0, lon0=lon0)
        docs.append((gid, lats, lons))
    src = spark.createDataFrame(
        docs, "gid long, lats array<double>, lons array<double>"
    )
    out = str(tmp_path / "cstars")
    sh.build_shapes(spark, src, out, n_files=2)
    tri = sh.read_shapes(spark, out)
    box = (9.13, 9.61, 19.58, 20.42)
    ring_lats = [box[0], box[0], box[1], box[1], box[0]]
    ring_lons = [box[2], box[3], box[3], box[2], box[2]]
    got_b = {r.gid for r in sh.shape_box(tri, sh.CONTAINS, *box).collect()}
    got_p = {r.gid
             for r in sh.shape_polygon(tri, sh.CONTAINS, ring_lats,
                                       ring_lons).collect()}
    assert got_b == got_p
    assert got_b  # non-trivial


# ------------------------------------------------- line / point shapes

def test_line_shapes_box_relations(spark, tmp_path):
    """Degenerate (a, b, a) triangles: box INTERSECTS == exact
    segment-box intersection; WITHIN == bbox containment; CONTAINS is
    always empty (withinLine can never be CANDIDATE)."""
    docs, segs = [], {}
    rng = random.Random(31)
    for gid in range(60):
        la0 = rng.uniform(-50, 50)
        lo0 = rng.uniform(-150, 150)
        la1 = la0 + rng.uniform(-8, 8)
        lo1 = lo0 + rng.uniform(-8, 8)
        docs.append((gid, [la0, la1], [lo0, lo1]))
        segs[gid] = (
            (encode_latitude(la0), encode_longitude(lo0)),
            (encode_latitude(la1), encode_longitude(lo1)),
        )
    src = spark.createDataFrame(
        docs, "gid long, lats array<double>, lons array<double>"
    )
    out = str(tmp_path / "lines")
    sh.build_shape_lines(spark, src, out, n_files=2)
    tri = sh.read_shapes(spark, out)
    box = (-20.0, 25.0, -60.0, 40.0)
    from lucene_spark.operators.spatial import (
        encode_latitude_ceil, encode_longitude_ceil,
    )
    qminy = encode_latitude_ceil(box[0])
    qmaxy = encode_latitude(box[1])
    qminx = encode_longitude_ceil(box[2])
    qmaxx = encode_longitude(box[3])
    corners = [(qminy, qminx), (qminy, qmaxx), (qmaxy, qmaxx),
               (qmaxy, qminx)]

    def seg_hits_box(p, q):
        if (qminy <= p[0] <= qmaxy and qminx <= p[1] <= qmaxx) or (
                qminy <= q[0] <= qmaxy and qminx <= q[1] <= qmaxx):
            return True
        if (max(p[1], q[1]) < qminx or min(p[1], q[1]) > qmaxx
                or min(p[0], q[0]) > qmaxy or max(p[0], q[0]) < qminy):
            return False
        for i in range(4):
            a, b = corners[i], corners[(i + 1) % 4]
            o1 = _orient(*p, *q, *a)
            o2 = _orient(*p, *q, *b)
            o3 = _orient(*a, *b, *p)
            o4 = _orient(*a, *b, *q)
            if o1 * o2 <= 0 and o3 * o4 <= 0:
                return True
        return False

    want_inter = {g for g, (p, q) in segs.items() if seg_hits_box(p, q)}
    want_within = {
        g for g, (p, q) in segs.items()
        if all(qminy <= y <= qmaxy and qminx <= x <= qmaxx
               for y, x in (p, q))
    }
    got_inter = {r.gid
                 for r in sh.shape_box(tri, sh.INTERSECTS, *box).collect()}
    got_within = {r.gid
                  for r in sh.shape_box(tri, sh.WITHIN, *box).collect()}
    got_disj = {r.gid
                for r in sh.shape_box(tri, sh.DISJOINT, *box).collect()}
    got_cont = {r.gid
                for r in sh.shape_box(tri, sh.CONTAINS, *box).collect()}
    assert got_inter == want_inter
    assert got_within == want_within
    assert got_disj == set(segs) - want_inter
    assert got_cont == set()  # a line never contains a box
    assert want_within and want_inter - want_within and got_disj


def test_point_shapes_box_relations(spark, tmp_path):
    docs = []
    rng = random.Random(77)
    for gid in range(80):
        docs.append((gid, rng.uniform(-60, 60), rng.uniform(-160, 160)))
    src = spark.createDataFrame(docs, "gid long, lat double, lon double")
    out = str(tmp_path / "pts")
    sh.build_shape_points(spark, src, out, n_files=2)
    tri = sh.read_shapes(spark, out)
    box = (-20.0, 25.0, -60.0, 40.0)
    from lucene_spark.operators.spatial import (
        encode_latitude_ceil, encode_longitude_ceil,
    )
    qminy = encode_latitude_ceil(box[0])
    qmaxy = encode_latitude(box[1])
    qminx = encode_longitude_ceil(box[2])
    qmaxx = encode_longitude(box[3])
    want = {
        g for g, la, lo in docs
        if qminy <= encode_latitude(la) <= qmaxy
        and qminx <= encode_longitude(lo) <= qmaxx
    }
    got = {r.gid for r in sh.shape_box(tri, sh.INTERSECTS, *box).collect()}
    assert got == want
    got_w = {r.gid for r in sh.shape_box(tri, sh.WITHIN, *box).collect()}
    assert got_w == want  # a point is within iff it intersects
    got_c = {r.gid for r in sh.shape_box(tri, sh.CONTAINS, *box).collect()}
    assert got_c == set()  # a point never contains a box
    assert want and len(want) < len(docs)


# ----------------------------------------------------- multipolygon docs

def test_multipolygon_end_to_end(spark, tmp_path):
    """Two disjoint star components per doc: every relation aggregates
    per-triangle verdicts across components; CONTAINS vs the exact
    integer withinTriangle replay over the CONCATENATED triangle set."""
    docs, tris_py = [], {}
    for gid in range(30):
        lat0 = 8.0 + (gid % 5) * 0.8
        lon0 = 18.0 + (gid % 6) * 0.9
        a = _star(gid + 200, 3 + gid % 3, base_r=3.0, lat0=lat0,
                  lon0=lon0)
        b = _star(gid + 300, 4, base_r=1.5, lat0=lat0 + 11.0,
                  lon0=lon0 + 7.0)
        docs.append((gid, [{"lats": a[0], "lons": a[1]},
                           {"lats": b[0], "lons": b[1]}]))
        ta, fa = sh.tessellate_with_flags(*a)
        tb, fb = sh.tessellate_with_flags(*b)
        import numpy as np

        tris_py[gid] = (np.vstack([ta, tb]), np.vstack([fa, fb]))
    src = spark.createDataFrame(
        docs,
        "gid long, polys array<struct<lats: array<double>, "
        "lons: array<double>>>",
    )
    out = str(tmp_path / "multi")
    sh.build_shapes_multi(spark, src, out, n_files=2)
    tri = sh.read_shapes(spark, out)
    from lucene_spark.operators.spatial import (
        encode_latitude_ceil, encode_longitude_ceil,
    )
    # box around the star field of component A only
    box = (9.1, 9.6, 19.6, 20.4)
    qminy = encode_latitude_ceil(box[0])
    qmaxy = encode_latitude(box[1])
    qminx = encode_longitude_ceil(box[2])
    qmaxx = encode_longitude(box[3])
    want_c = {g for g, (t, f) in tris_py.items()
              if _brute_within_relation(t, f, qminy, qmaxy, qminx, qmaxx)}
    got_c = {r.gid for r in sh.shape_box(tri, sh.CONTAINS, *box).collect()}
    assert got_c == want_c and want_c
    # intersects: vertex/corner/edge union over BOTH components
    def brute_inter(t):
        for row in t:
            ay, ax, by, bx, cy, cx = (int(v) for v in row)
            if any(qminy <= y <= qmaxy and qminx <= x <= qmaxx
                   for y, x in ((ay, ax), (by, bx), (cy, cx))):
                return True
            if sh._point_in_tri_i(qminy, qminx, ay, ax, by, bx, cy, cx) \
               and min(ay, by, cy) <= qminy <= max(ay, by, cy) \
               and min(ax, bx, cx) <= qminx <= max(ax, bx, cx):
                return True
        return False
    got_i = {r.gid
             for r in sh.shape_box(tri, sh.INTERSECTS, *box).collect()}
    # the box is small and inside component A's area: vertex/corner
    # checks suffice for the sanity subset relation
    assert {g for g, (t, _) in tris_py.items() if brute_inter(t)} <= got_i
    # a box covering only component B's area must NOT include docs via
    # component A and vice versa — disjointness of the verdict sets
    box_b = (19.5, 20.5, 25.5, 26.5)
    got_b = {r.gid
             for r in sh.shape_box(tri, sh.INTERSECTS, *box_b).collect()}
    assert got_b  # some B components overlap it
