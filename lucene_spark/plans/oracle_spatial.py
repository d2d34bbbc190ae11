"""DuckDB oracle twins for the spatial (LatLonPoint) operators.

The oracle recomputes everything from the raw ``events`` view —
independently of the engine's z-ordered point table — using the exact
arithmetic the engine uses:

- synthetic (lat, lon) from event_id: integer multiply+mod (exact below
  2^53), one correctly-rounded divide, one subtract → bit-identical
  doubles on both engines;
- GeoEncodingUtils quantization (``core/geo/GeoEncodingUtils.java:58+``):
  floor(x / DECODE) with DECODE an exact dyadic (180/2^32, 360/2^32) →
  bit-identical integers on both engines;
- haversinMeters (``core/util/SloppyMath.java:47-75``) over the DECODED
  coordinates, written with Java's toRadians operation order
  (x / 180 * PI) so both engines evaluate the same expression tree. The
  final distance is cast to float32, absorbing sub-ulp libm differences;
  the gate's query parameters are chosen (and pytest-asserted) so no
  point sits near the radius / rank-k boundary.

The distance oracle applies ONLY the haversine predicate: the engine's
bounding-box prune (Rectangle.fromPointDistance) is a strict superset of
the circle, so membership is identical — the box is a scan optimization,
and the oracle staying box-free is what makes it an independent check.
"""

from __future__ import annotations

LAT_DECODE_SQL = "(180.0 / 4294967296.0)"
LON_DECODE_SQL = "(360.0 / 4294967296.0)"
PI_SQL = "3.141592653589793"
TO_METERS_SQL = "6371008.7714"

# must mirror lucene_spark.operators.spatial.synth_latlon
_PTS_CTE = f"""
pts AS (
  SELECT
    event_id AS gid,
    CAST(FLOOR((((event_id * 7919) % 1700000) / 10000.0 - 85.0)
               / {LAT_DECODE_SQL}) AS BIGINT) AS lat_enc,
    CAST(FLOOR((((event_id * 104729) % 3500000) / 10000.0 - 175.0)
               / {LON_DECODE_SQL}) AS BIGINT) AS lon_enc
  FROM events
)
"""


def _haversine_sql(qlat: float, qlon: float) -> str:
    """haversinMeters over decoded quantized coords — same expression
    tree as spatial._haversine_m (Java toRadians order: x / 180 * PI)."""
    lat = f"(lat_enc * {LAT_DECODE_SQL})"
    lon = f"(lon_enc * {LON_DECODE_SQL})"
    x1 = f"({lat} / 180.0 * {PI_SQL})"
    x2 = f"({qlat!r} / 180.0 * {PI_SQL})"
    h1 = f"(1.0 - COS({x1} - {x2}))"
    h2 = f"(1.0 - COS(({lon} - {qlon!r}) / 180.0 * {PI_SQL}))"
    h = f"({h1} + COS({x1}) * COS({x2}) * {h2})"
    return f"({TO_METERS_SQL} * 2.0 * ASIN(LEAST(1.0, SQRT({h} * 0.5))))"


def geo_box_sql(lat_lo: int, lat_hi: int, lon_lo: int, lon_hi: int,
                crosses_dateline: bool = False) -> str:
    """Box membership on the ENCODED bounds (the engine computes the
    same ceil/floor-encoded ints via encode_latitude[_ceil]); pass the
    already-encoded values so both sides share one quantization."""
    if crosses_dateline:
        lon_pred = f"(lon_enc >= {lon_lo} OR lon_enc <= {lon_hi})"
    else:
        lon_pred = f"(lon_enc >= {lon_lo} AND lon_enc <= {lon_hi})"
    return (
        f"WITH {_PTS_CTE} "
        f"SELECT gid, lat_enc, lon_enc FROM pts "
        f"WHERE lat_enc >= {lat_lo} AND lat_enc <= {lat_hi} AND {lon_pred}"
    )


def geo_distance_sql(qlat: float, qlon: float, radius_m: float) -> str:
    d = _haversine_sql(qlat, qlon)
    return (
        f"WITH {_PTS_CTE} "
        f"SELECT gid, lat_enc, lon_enc, CAST({d} AS FLOAT) AS dist_m "
        f"FROM pts WHERE {d} <= {radius_m!r}"
    )


def geo_nearest_sql(qlat: float, qlon: float, k: int) -> str:
    d = _haversine_sql(qlat, qlon)
    return (
        f"WITH {_PTS_CTE} "
        f"SELECT gid, lat_enc, lon_enc, CAST({d} AS FLOAT) AS dist_m "
        f"FROM pts ORDER BY {d} ASC, gid ASC LIMIT {k}"
    )


def geo_polygon_sql(lats: "list[float]", lons: "list[float]",
                    holes: "list[tuple[list[float], list[float]]] | None" = None,
                    ) -> str:
    """Point-in-polygon membership — the same per-edge PNPOLY expressions
    as spatial.geo_polygon (EdgeTree.containsPnPoly + GeoUtils.orient,
    plain double math), generated from the same vertex list so both
    engines evaluate an identical expression tree over the decoded
    quantized coordinates. On-edge OR odd crossing parity; horizontal
    edges emit no crossing term (no division by zero). ``holes``:
    interior rings excluded with the same ring test, boundary included
    in the hole (Polygon2D.java:109)."""
    shell = _ring_contains_sql(lats, lons)
    hole_preds = [
        f"NOT {_ring_contains_sql(h_lats, h_lons)}"
        for h_lats, h_lons in holes or ()
    ]
    pred = " AND ".join([shell] + hole_preds)
    return (
        f"WITH {_PTS_CTE} "
        f"SELECT gid, lat_enc, lon_enc FROM pts "
        f"WHERE {pred}"
    )


def _ring_contains_sql(lats: "list[float]", lons: "list[float]",
                       y: "str | None" = None, x: "str | None" = None) -> str:
    if x is None:
        x = f"(lon_enc * {LON_DECODE_SQL})"
    if y is None:
        y = f"(lat_enc * {LAT_DECODE_SQL})"
    on_edges, crossings = [], []
    for i in range(len(lats) - 1):
        y1, x1, y2, x2 = lats[i], lons[i], lats[i + 1], lons[i + 1]
        cond_y = (
            f"(({y} = {y1!r} AND {y} = {y2!r}) OR "
            f"(({y} <= {y1!r} AND {y} >= {y2!r}) <> "
            f"({y} >= {y1!r} AND {y} <= {y2!r})))"
        )
        orient_zero = (
            f"(({x2 - x1!r}) * ({y} - {y1!r}) = "
            f"({x} - {x1!r}) * ({y2 - y1!r}))"
        )
        x_band = (
            f"(({x} = {x1!r} AND {x} = {x2!r}) OR "
            f"((({x} <= {x1!r} AND {x} >= {x2!r}) <> "
            f"({x} >= {x1!r} AND {x} <= {x2!r})) AND {orient_zero}))"
        )
        on_edge = f"({cond_y} AND {x_band})"
        on_edges.append(on_edge)
        if y1 != y2:
            crossings.append(
                f"(CASE WHEN {cond_y} AND NOT {on_edge} "
                f"AND (({y1!r} > {y}) <> ({y2!r} > {y})) "
                f"AND {x} < ({x2 - x1!r}) * ({y} - {y1!r}) / ({y2 - y1!r})"
                f" + {x1!r} THEN 1 ELSE 0 END)"
            )
    on_any = "(" + " OR ".join(on_edges) + ")"
    parity = "((" + " + ".join(crossings) + ") % 2 = 1)" if crossings else "FALSE"
    return f"({on_any} OR {parity})"


# must mirror lucene_spark.operators.shapes.synth_rects + tessellate's
# floor quantization of every ring vertex: the rect's encoded bbox IS the
# quantized geometry, so box relations reduce to closed-interval algebra
_RECTS_CTE = f"""
rects AS (
  SELECT
    event_id AS gid,
    CAST(FLOOR(lat0 / {LAT_DECODE_SQL}) AS BIGINT) AS rminy,
    CAST(FLOOR(LEAST(lat0 + ((event_id % 97) / 10.0 + 0.5), 89.9)
               / {LAT_DECODE_SQL}) AS BIGINT) AS rmaxy,
    CAST(FLOOR(lon0 / {LON_DECODE_SQL}) AS BIGINT) AS rminx,
    CAST(FLOOR(LEAST(lon0 + ((event_id % 89) / 10.0 + 0.5), 179.9)
               / {LON_DECODE_SQL}) AS BIGINT) AS rmaxx
  FROM (
    SELECT
      event_id,
      ((event_id * 7919) % 1700000) / 10000.0 - 85.0 AS lat0,
      ((event_id * 104729) % 3500000) / 10000.0 - 175.0 AS lon0
    FROM events
  )
)
"""


def shape_box_sql(relation: str, min_lat: float, max_lat: float,
                  min_lon: float, max_lon: float) -> str:
    """Doc-level box relation over the synthetic rectangle shapes —
    INDEPENDENT of the engine's tessellation: an axis-aligned rect
    relates to a box by closed-interval algebra on the quantized bboxes
    (Rectangle2D's boundary-inclusive intersects / containsTriangle
    reduce to exactly this for rectangle shapes), so the oracle checks
    the whole tessellate -> triangle-predicate -> groupBy pipeline
    against plain arithmetic."""
    from ..operators.spatial import (
        encode_latitude, encode_latitude_ceil,
        encode_longitude, encode_longitude_ceil,
    )

    qminy = encode_latitude_ceil(min_lat)
    qmaxy = encode_latitude(max_lat)
    qminx = encode_longitude_ceil(min_lon)
    qmaxx = encode_longitude(max_lon)
    inter = (f"rmaxy >= {qminy} AND rminy <= {qmaxy} "
             f"AND rmaxx >= {qminx} AND rminx <= {qmaxx}")
    if relation == "intersects":
        pred = inter
    elif relation == "within":
        pred = (f"rminy >= {qminy} AND rmaxy <= {qmaxy} "
                f"AND rminx >= {qminx} AND rmaxx <= {qmaxx}")
    elif relation == "disjoint":
        pred = f"NOT ({inter})"
    else:
        raise ValueError(relation)
    return (
        f"WITH {_RECTS_CTE} "
        f"SELECT gid FROM rects WHERE {pred} ORDER BY gid"
    )


def shape_multi_query_box_sql(relation: str, boxes) -> str:
    """Multi-component QUERY geometry twin (ComponentTree any-component
    delegation) over the synthetic rectangle shapes: a rect's two
    tessellation triangles share the full rect bbox, so per-triangle
    any-component containment reduces to per-RECT any-box algebra —
    INTERSECTS = any box intersects, WITHIN = inside some box, DISJOINT =
    no box intersects."""
    from ..operators.spatial import (
        encode_latitude, encode_latitude_ceil,
        encode_longitude, encode_longitude_ceil,
    )

    inters, withins = [], []
    for (min_lat, max_lat, min_lon, max_lon) in boxes:
        qminy = encode_latitude_ceil(min_lat)
        qmaxy = encode_latitude(max_lat)
        qminx = encode_longitude_ceil(min_lon)
        qmaxx = encode_longitude(max_lon)
        inters.append(f"(rmaxy >= {qminy} AND rminy <= {qmaxy} "
                      f"AND rmaxx >= {qminx} AND rminx <= {qmaxx})")
        withins.append(f"(rminy >= {qminy} AND rmaxy <= {qmaxy} "
                       f"AND rminx >= {qminx} AND rmaxx <= {qmaxx})")
    any_inter = " OR ".join(inters)
    if relation == "intersects":
        pred = any_inter
    elif relation == "within":
        pred = " OR ".join(withins)
    elif relation == "disjoint":
        pred = f"NOT ({any_inter})"
    else:
        raise ValueError(relation)
    return (
        f"WITH {_RECTS_CTE} "
        f"SELECT gid FROM rects WHERE {pred} ORDER BY gid"
    )


def shape_polygon_sql(relation: str, lats: "list[float]",
                      lons: "list[float]") -> str:
    """Doc-level polygon relation over the synthetic rectangle shapes —
    independent of the engine's tessellation AND of its triangle
    predicates: a rect relates to a simple polygon via rect-corner-in-
    polygon (PNPOLY on decoded corners), polygon-vertex-in-rect, and
    rect-edge-vs-polygon-edge crossings (boundary-inclusive for
    INTERSECTS, strict for WITHIN, GeoUtils.lineCrossesLine[WithBoundary]
    exactly). The engine must reach the same doc answers through
    triangles."""
    # decoded rect corners (exact: int * dyadic)
    ylo, yhi = f"(rminy * {LAT_DECODE_SQL})", f"(rmaxy * {LAT_DECODE_SQL})"
    xlo, xhi = f"(rminx * {LON_DECODE_SQL})", f"(rmaxx * {LON_DECODE_SQL})"
    corners = [(ylo, xlo), (ylo, xhi), (yhi, xhi), (yhi, xlo)]
    corner_in = " OR ".join(
        _ring_contains_sql(lats, lons, y=cy, x=cx) for cy, cx in corners
    )
    vert_in_rect = " OR ".join(
        f"({la!r} >= {ylo} AND {la!r} <= {yhi} "
        f"AND {lo!r} >= {xlo} AND {lo!r} <= {xhi})"
        for la, lo in zip(lats[:-1], lons[:-1])
    )

    def orient(ay, ax, by, bx, cy, cx):
        return (f"(CASE WHEN ({bx} - {ax}) * ({cy} - {ay}) > "
                f"({cx} - {ax}) * ({by} - {ay}) THEN 1 "
                f"WHEN ({bx} - {ax}) * ({cy} - {ay}) < "
                f"({cx} - {ax}) * ({by} - {ay}) THEN -1 ELSE 0 END)")

    rect_edges = [
        (ylo, xlo, ylo, xhi), (ylo, xhi, yhi, xhi),
        (yhi, xhi, yhi, xlo), (yhi, xlo, ylo, xlo),
    ]
    op = "<=" if relation != "within" else "<"
    crossings = []
    for i in range(len(lats) - 1):
        dy, dx = repr(lats[i]), repr(lons[i])
        ey, ex = repr(lats[i + 1]), repr(lons[i + 1])
        for (sy, sx, ty, tx) in rect_edges:
            o1 = orient(dy, dx, ey, ex, sy, sx)
            o2 = orient(dy, dx, ey, ex, ty, tx)
            o3 = orient(sy, sx, ty, tx, dy, dx)
            o4 = orient(sy, sx, ty, tx, ey, ex)
            crossings.append(
                f"({o1} * {o2} {op} 0 AND {o3} * {o4} {op} 0)"
            )
    crosses = "(" + " OR ".join(crossings) + ")"
    inter = f"(({corner_in}) OR ({vert_in_rect}) OR {crosses})"
    if relation == "intersects":
        pred = inter
    elif relation == "within":
        # all 4 corners contained, no strict crossing (containsTriangle's
        # includeBoundary=false discipline)
        all_in = " AND ".join(
            _ring_contains_sql(lats, lons, y=cy, x=cx) for cy, cx in corners
        )
        pred = f"(({all_in}) AND NOT {crosses})"
    elif relation == "disjoint":
        pred = f"NOT {inter}"
    else:
        raise ValueError(relation)
    return (
        f"WITH {_RECTS_CTE} "
        f"SELECT gid FROM rects WHERE {pred} ORDER BY gid"
    )


# hole corners quantized exactly like synth_rects_holes + tessellate
# (the [1/4, 1/2] side fractions, computed in the same double expression
# tree, then floor-encoded)
_RECTS_HOLES_CTE = f"""
rects AS (
  SELECT
    event_id AS gid,
    CAST(FLOOR(lat0 / {LAT_DECODE_SQL}) AS BIGINT) AS rminy,
    CAST(FLOOR(lat1 / {LAT_DECODE_SQL}) AS BIGINT) AS rmaxy,
    CAST(FLOOR(lon0 / {LON_DECODE_SQL}) AS BIGINT) AS rminx,
    CAST(FLOOR(lon1 / {LON_DECODE_SQL}) AS BIGINT) AS rmaxx,
    CAST(FLOOR((lat0 + (lat1 - lat0) * 0.25) / {LAT_DECODE_SQL}) AS BIGINT)
      AS hminy,
    CAST(FLOOR((lat0 + (lat1 - lat0) * 0.5) / {LAT_DECODE_SQL}) AS BIGINT)
      AS hmaxy,
    CAST(FLOOR((lon0 + (lon1 - lon0) * 0.25) / {LON_DECODE_SQL}) AS BIGINT)
      AS hminx,
    CAST(FLOOR((lon0 + (lon1 - lon0) * 0.5) / {LON_DECODE_SQL}) AS BIGINT)
      AS hmaxx
  FROM (
    SELECT
      event_id, lat0, lon0,
      LEAST(lat0 + ((event_id % 97) / 10.0 + 0.5), 89.9) AS lat1,
      LEAST(lon0 + ((event_id % 89) / 10.0 + 0.5), 179.9) AS lon1
    FROM (
      SELECT
        event_id,
        ((event_id * 7919) % 1700000) / 10000.0 - 85.0 AS lat0,
        ((event_id * 104729) % 3500000) / 10000.0 - 175.0 AS lon0
      FROM events
    )
  )
)
"""


def _enc_box(min_lat, max_lat, min_lon, max_lon):
    from ..operators.spatial import (
        encode_latitude, encode_latitude_ceil,
        encode_longitude, encode_longitude_ceil,
    )

    return (encode_latitude_ceil(min_lat), encode_latitude(max_lat),
            encode_longitude_ceil(min_lon), encode_longitude(max_lon))


def shape_box_contains_sql(min_lat: float, max_lat: float,
                           min_lon: float, max_lon: float) -> str:
    """CONTAINS (shape ⊇ box) over the synthetic rectangles: closed-
    interval algebra says a rect contains the box iff the box is
    STRICTLY inside (any shared boundary row/column makes an original
    edge cross the closed box → Rectangle2D.withinTriangle NOTWITHIN).
    Independent of the engine's tessellation, flags and aggregation."""
    qminy, qmaxy, qminx, qmaxx = _enc_box(min_lat, max_lat,
                                          min_lon, max_lon)
    pred = (f"rminy < {qminy} AND rmaxy > {qmaxy} "
            f"AND rminx < {qminx} AND rmaxx > {qmaxx}")
    return (
        f"WITH {_RECTS_CTE} "
        f"SELECT gid FROM rects WHERE {pred} ORDER BY gid"
    )


def shape_holes_box_sql(relation: str, min_lat: float, max_lat: float,
                        min_lon: float, max_lon: float) -> str:
    """Box relations over rect-with-rect-hole shapes, by interval
    algebra on the quantized corners:

    - intersects: box meets the outer rect AND is not strictly inside
      the hole interior (the hole BOUNDARY belongs to the shape);
    - within: triangles span the outer rect, so within == outer bbox
      inside the box (the hole is interior and cannot widen the bbox);
    - disjoint: complement of intersects;
    - contains: box strictly inside the outer rect AND strictly
      separated from the (closed) hole — touching the hole boundary
      crosses an original edge (NOTWITHIN), and a box that swallows the
      hole has shape vertices inside it (NOTWITHIN)."""
    qminy, qmaxy, qminx, qmaxx = _enc_box(min_lat, max_lat,
                                          min_lon, max_lon)
    outer_overlap = (f"rmaxy >= {qminy} AND rminy <= {qmaxy} "
                     f"AND rmaxx >= {qminx} AND rminx <= {qmaxx}")
    inside_hole = (f"{qminy} > hminy AND {qmaxy} < hmaxy "
                   f"AND {qminx} > hminx AND {qmaxx} < hmaxx")
    if relation == "intersects":
        pred = f"({outer_overlap}) AND NOT ({inside_hole})"
    elif relation == "within":
        pred = (f"rminy >= {qminy} AND rmaxy <= {qmaxy} "
                f"AND rminx >= {qminx} AND rmaxx <= {qmaxx}")
    elif relation == "disjoint":
        pred = f"NOT (({outer_overlap}) AND NOT ({inside_hole}))"
    elif relation == "contains":
        strict_in = (f"rminy < {qminy} AND rmaxy > {qmaxy} "
                     f"AND rminx < {qminx} AND rmaxx > {qmaxx}")
        hole_apart = (f"({qmaxy} < hminy OR {qminy} > hmaxy "
                      f"OR {qmaxx} < hminx OR {qminx} > hmaxx)")
        pred = f"({strict_in}) AND {hole_apart}"
    else:
        raise ValueError(relation)
    return (
        f"WITH {_RECTS_HOLES_CTE} "
        f"SELECT gid FROM rects WHERE {pred} ORDER BY gid"
    )


def shape_polygon_contains_sql(lats: "list[float]",
                               lons: "list[float]") -> str:
    """CONTAINS (shape ⊇ query polygon) over the synthetic rectangles:
    a CONVEX query polygon is inside a rect iff every vertex is strictly
    inside it (decoded-degree comparison; the query coordinates are
    chosen off the quantization grid, so strict double comparisons are
    exact decisions)."""
    ylo, yhi = f"(rminy * {LAT_DECODE_SQL})", f"(rmaxy * {LAT_DECODE_SQL})"
    xlo, xhi = f"(rminx * {LON_DECODE_SQL})", f"(rmaxx * {LON_DECODE_SQL})"
    pred = " AND ".join(
        f"({ylo} < {la!r} AND {yhi} > {la!r} "
        f"AND {xlo} < {lo!r} AND {xhi} > {lo!r})"
        for la, lo in zip(lats[:-1], lons[:-1])
    )
    return (
        f"WITH {_RECTS_CTE} "
        f"SELECT gid FROM rects WHERE {pred} ORDER BY gid"
    )


# segment endpoints = the synth_rects diagonal, quantized
_LINES_CTE = f"""
segs AS (
  SELECT
    event_id AS gid,
    CAST(FLOOR(lat0 / {LAT_DECODE_SQL}) AS BIGINT) AS py,
    CAST(FLOOR(lon0 / {LON_DECODE_SQL}) AS BIGINT) AS px,
    CAST(FLOOR(lat1 / {LAT_DECODE_SQL}) AS BIGINT) AS qy,
    CAST(FLOOR(lon1 / {LON_DECODE_SQL}) AS BIGINT) AS qx
  FROM (
    SELECT
      event_id, lat0, lon0,
      LEAST(lat0 + ((event_id % 97) / 10.0 + 0.5), 89.9) AS lat1,
      LEAST(lon0 + ((event_id % 89) / 10.0 + 0.5), 179.9) AS lon1
    FROM (
      SELECT
        event_id,
        ((event_id * 7919) % 1700000) / 10000.0 - 85.0 AS lat0,
        ((event_id * 104729) % 3500000) / 10000.0 - 175.0 AS lon0
      FROM events
    )
  )
)
"""


def shape_line_box_sql(relation: str, min_lat: float, max_lat: float,
                       min_lon: float, max_lon: float) -> str:
    """Box relations over the synthetic diagonal segments — independent
    of the degenerate-triangle pipeline: endpoint-in-box OR the
    boundary-inclusive segment-vs-box-edge crossing (the same double
    orient expression trees the engine evaluates, so the comparison is
    bit-identical)."""
    qminy, qmaxy, qminx, qmaxx = _enc_box(min_lat, max_lat,
                                          min_lon, max_lon)

    def orient(ay, ax, by, bx, cy, cx):
        return (f"(CASE WHEN ({bx} - {ax}) * ({cy} - {ay}) > "
                f"({cx} - {ax}) * ({by} - {ay}) THEN 1 "
                f"WHEN ({bx} - {ax}) * ({cy} - {ay}) < "
                f"({cx} - {ax}) * ({by} - {ay}) THEN -1 ELSE 0 END)")

    p_in = (f"(py >= {qminy} AND py <= {qmaxy} "
            f"AND px >= {qminx} AND px <= {qmaxx})")
    q_in = (f"(qy >= {qminy} AND qy <= {qmaxy} "
            f"AND qx >= {qminx} AND qx <= {qmaxx})")
    bbox_ok = (
        f"(GREATEST(px, qx) >= {qminx} AND LEAST(px, qx) <= {qmaxx} "
        f"AND LEAST(py, qy) <= {qmaxy} AND GREATEST(py, qy) >= {qminy})"
    )
    corners = [(qminy, qminx), (qminy, qmaxx), (qmaxy, qmaxx),
               (qmaxy, qminx)]
    crossings = []
    for i in range(4):
        (y1, x1), (y2, x2) = corners[i], corners[(i + 1) % 4]
        o1 = orient(y1, x1, y2, x2, "py", "px")
        o2 = orient(y1, x1, y2, x2, "qy", "qx")
        o3 = orient("py", "px", "qy", "qx", y1, x1)
        o4 = orient("py", "px", "qy", "qx", y2, x2)
        crossings.append(f"({o1} * {o2} <= 0 AND {o3} * {o4} <= 0)")
    inter = (f"({p_in} OR {q_in} OR ({bbox_ok} AND "
             f"({' OR '.join(crossings)})))")
    if relation == "intersects":
        pred = inter
    elif relation == "within":
        pred = f"({p_in} AND {q_in})"
    elif relation == "disjoint":
        pred = f"NOT {inter}"
    else:
        raise ValueError(relation)
    return (
        f"WITH {_LINES_CTE} "
        f"SELECT gid FROM segs WHERE {pred} ORDER BY gid"
    )


def shape_point_box_sql(min_lat: float, max_lat: float,
                        min_lon: float, max_lon: float) -> str:
    """Point shapes (fully degenerate triangles): box INTERSECTS is
    plain encoded-interval membership over the synthetic points."""
    qminy, qmaxy, qminx, qmaxx = _enc_box(min_lat, max_lat,
                                          min_lon, max_lon)
    return (
        f"WITH {_PTS_CTE} "
        f"SELECT gid FROM pts "
        f"WHERE lat_enc >= {qminy} AND lat_enc <= {qmaxy} "
        f"AND lon_enc >= {qminx} AND lon_enc <= {qmaxx} ORDER BY gid"
    )


# the two disjoint per-doc bands of synth_rects_multi, quantized with
# the same expression trees
_RECTS_MULTI_CTE = f"""
rects AS (
  SELECT
    event_id AS gid,
    CAST(FLOOR(lat0 / {LAT_DECODE_SQL}) AS BIGINT) AS aminy,
    CAST(FLOOR((lat0 + (lat1 - lat0) * 0.4) / {LAT_DECODE_SQL}) AS BIGINT)
      AS amaxy,
    CAST(FLOOR((lat0 + (lat1 - lat0) * 0.6) / {LAT_DECODE_SQL}) AS BIGINT)
      AS bminy,
    CAST(FLOOR(lat1 / {LAT_DECODE_SQL}) AS BIGINT) AS bmaxy,
    CAST(FLOOR(lon0 / {LON_DECODE_SQL}) AS BIGINT) AS rminx,
    CAST(FLOOR(lon1 / {LON_DECODE_SQL}) AS BIGINT) AS rmaxx
  FROM (
    SELECT
      event_id, lat0, lon0,
      LEAST(lat0 + ((event_id % 97) / 10.0 + 0.5), 89.9) AS lat1,
      LEAST(lon0 + ((event_id % 89) / 10.0 + 0.5), 179.9) AS lon1
    FROM (
      SELECT
        event_id,
        ((event_id * 7919) % 1700000) / 10000.0 - 85.0 AS lat0,
        ((event_id * 104729) % 3500000) / 10000.0 - 175.0 AS lon0
      FROM events
    )
  )
)
"""


def shape_multi_box_sql(relation: str, min_lat: float, max_lat: float,
                        min_lon: float, max_lon: float) -> str:
    """Box relations over two-component (multipolygon) docs by interval
    algebra: intersects = either band overlaps; within = both bands
    inside (== the union bbox inside, since the bands span the full
    rect); contains = box strictly inside ONE band (the other band's
    triangles are then bbox-disjoint, contributing nothing)."""
    qminy, qmaxy, qminx, qmaxx = _enc_box(min_lat, max_lat,
                                          min_lon, max_lon)
    x_ov = f"rmaxx >= {qminx} AND rminx <= {qmaxx}"
    a_ov = f"(amaxy >= {qminy} AND aminy <= {qmaxy} AND {x_ov})"
    b_ov = f"(bmaxy >= {qminy} AND bminy <= {qmaxy} AND {x_ov})"
    if relation == "intersects":
        pred = f"({a_ov} OR {b_ov})"
    elif relation == "within":
        pred = (f"aminy >= {qminy} AND bmaxy <= {qmaxy} "
                f"AND rminx >= {qminx} AND rmaxx <= {qmaxx}")
    elif relation == "disjoint":
        pred = f"NOT ({a_ov} OR {b_ov})"
    elif relation == "contains":
        x_strict = f"rminx < {qminx} AND rmaxx > {qmaxx}"
        a_in = f"(aminy < {qminy} AND amaxy > {qmaxy} AND {x_strict})"
        b_in = f"(bminy < {qminy} AND bmaxy > {qmaxy} AND {x_strict})"
        pred = f"({a_in} OR {b_in})"
    else:
        raise ValueError(relation)
    return (
        f"WITH {_RECTS_MULTI_CTE} "
        f"SELECT gid FROM rects WHERE {pred} ORDER BY gid"
    )
