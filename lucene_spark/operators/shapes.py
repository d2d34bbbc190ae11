"""Indexed polygon shapes — a LatLonShape subset, Spark-first.

Reference semantics (cited for parity, no code taken):

- ``core/document/LatLonShape.java`` — polygons indexed as a set of
  TESSELLATED TRIANGLES (7-dimension encoded points per triangle,
  ``ShapeField.TYPE.setDimensions(7, 4, BYTES)``); queries relate a
  query geometry to the triangle set with a ``ShapeField.QueryRelation``
  (INTERSECTS / WITHIN / DISJOINT / CONTAINS).
- ``core/geo/Tessellator.java`` — ear-clipping triangulation over the
  QUANTIZED vertices (the tessellation happens after lat/lon encoding,
  so the indexed geometry is exactly the union of the triangles over the
  decoded grid).
- ``core/geo/Rectangle2D.java:99-154`` — box-vs-triangle relations:
  ``intersectsTriangle`` = bbox-disjoint shortcut, then any-vertex-in-box
  OR box-corner-in-triangle OR any-triangle-edge-crosses-any-box-edge
  (boundary inclusive); ``containsTriangle`` = the triangle's bbox within
  the box (a box is convex, so vertex containment suffices).
- ``core/geo/GeoUtils.java:205-270`` — ``orient`` (plain double cross
  product sign) and ``lineCrossesLineWithBoundary`` (both orient pairs
  ``<= 0``).
- ``core/geo/Component2D.java:251-278`` — ``pointInTriangle`` with the
  degenerate-triangle bbox guard.

Spark-first design (NOT a BKD port):

- **Tessellation is distributed**: an Arrow kernel (``mapInPandas``)
  ear-clips each document's polygon inside its partition — integer-exact
  orientation tests on the encoded int32 vertices (Python ints never
  overflow), so no epsilon tuning and no robustness fallbacks. One
  polygon never leaves its task; the output is one exploded triangle
  row-set.
- **Storage**: triangle rows ``(gid, ay, ax, by, bx, cy, cx)`` plus the
  triangle bbox ``(min_y, max_y, min_x, max_x)``, range-sorted by the
  Morton interleave of the bbox center. Parquet row-group min/max stats
  on the bbox columns then prune a box query's scan exactly as the BKD
  inner nodes prune triangle cells.
- **Queries are codegen'd column expressions** over the encoded
  coordinates cast to double (differences of int32s are exact in
  doubles; only the cross-product multiply rounds — the same rounding
  the reference's own double ``orient`` performs on decoded values).
  Doc-level relations are one ``groupBy(gid)`` aggregation:
  INTERSECTS = any triangle hit (the bbox prefilter pushes into the
  scan), WITHIN = every triangle inside (bool_and, full shape scan —
  a universal quantifier cannot prune), DISJOINT = the anti-join of
  INTERSECTS against the doc universe.

Scale notes (100 TB): build is a projection + one Arrow kernel + one
range sort — no joins, no driver geometry. Queries scan bbox-pruned
row groups and reduce with one partial-aggregated groupBy; nothing is
collected, nothing quadratic in documents. Triangle fan-out is
O(vertices) per polygon, so storage stays linear in input size.

CONTAINS (query geometry within the shape) is NOT implemented: it needs
the reference's per-edge original/shared flags from the tessellation
(``WithinRelation`` bookkeeping) — documented out of scope in
COVERAGE.md.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .spatial import (
    _morton32,
    encode_latitude,
    encode_latitude_ceil,
    encode_longitude,
    encode_longitude_ceil,
    synth_latlon,
)

__all__ = [
    "tessellate", "build_shapes", "read_shapes", "synth_rects",
    "shape_box", "shape_polygon", "INTERSECTS", "WITHIN", "DISJOINT",
]

INTERSECTS = "intersects"
WITHIN = "within"
DISJOINT = "disjoint"

_TRI_SCHEMA = (
    "gid long, ay long, ax long, by long, bx long, cy long, cx long, "
    "min_y long, max_y long, min_x long, max_x long"
)


# ---------------------------------------------------------------- tessellate

def _orient_i(ay, ax, by, bx, cy, cx) -> int:
    """Integer-exact GeoUtils.orient sign over encoded coords."""
    v = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
    return 1 if v > 0 else (-1 if v < 0 else 0)


def _point_in_tri_i(y, x, ay, ax, by, bx, cy, cx) -> bool:
    """Integer-exact point-in-triangle (boundary inclusive) for a CCW or
    CW triangle — all three orients share a sign or are zero."""
    a = _orient_i(y, x, ay, ax, by, bx)
    b = _orient_i(y, x, by, bx, cy, cx)
    c = _orient_i(y, x, cy, cx, ay, ax)
    return (a >= 0 and b >= 0 and c >= 0) or (a <= 0 and b <= 0 and c <= 0)


def tessellate(lats: "list[float]", lons: "list[float]") -> "np.ndarray":
    """Ear-clip a simple closed ring into triangles over the QUANTIZED
    vertices (Tessellator.java operates on encoded values; the indexed
    geometry is the union of these triangles on the decoded grid).

    Returns an (n_tris, 6) int64 array of encoded ``ay ax by bx cy cx``
    rows. Orientation tests and the ear containment checks run in exact
    Python integer arithmetic — no floating-point robustness cases.
    Zero-area (collinear) corners are clipped without emitting a
    triangle. Raises on self-intersecting input (no ear found).
    """
    if len(lats) != len(lons):
        raise ValueError("lats and lons must have the same length")
    if len(lats) < 4 or lats[0] != lats[-1] or lons[0] != lons[-1]:
        raise ValueError("polygon must be a closed ring of >= 4 points")
    v = [(encode_latitude(la), encode_longitude(lo))
         for la, lo in zip(lats[:-1], lons[:-1])]
    # drop consecutive duplicates after quantization (Tessellator merges)
    verts = [p for i, p in enumerate(v) if p != v[i - 1]]
    if len(verts) < 3:
        raise ValueError("polygon collapsed under quantization")
    # normalize to CCW by exact shoelace sign
    area2 = sum(
        verts[i][1] * verts[(i + 1) % len(verts)][0]
        - verts[(i + 1) % len(verts)][1] * verts[i][0]
        for i in range(len(verts))
    )
    if area2 < 0:
        verts.reverse()
    tris: list[tuple] = []
    n = len(verts)
    idx = list(range(n))
    guard = 0
    while len(idx) > 3:
        clipped = False
        for k in range(len(idx)):
            i0, i1, i2 = (idx[k - 1], idx[k], idx[(k + 1) % len(idx)])
            (ay, ax), (by, bx), (cy, cx) = verts[i0], verts[i1], verts[i2]
            o = _orient_i(ay, ax, by, bx, cy, cx)
            if o == 0:
                # collinear corner: remove, no area to emit
                idx.pop(k)
                clipped = True
                break
            if o < 0:
                continue  # reflex corner, not an ear
            # ear is valid if no OTHER remaining vertex lies in it
            blocked = False
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                (py, px) = verts[j]
                if _point_in_tri_i(py, px, ay, ax, by, bx, cy, cx):
                    blocked = True
                    break
            if blocked:
                continue
            tris.append((ay, ax, by, bx, cy, cx))
            idx.pop(k)
            clipped = True
            break
        guard += 1
        if not clipped or guard > 2 * n * n:
            raise ValueError("tessellation failed: polygon is not simple")
    (ay, ax), (by, bx), (cy, cx) = (verts[idx[0]], verts[idx[1]], verts[idx[2]])
    final_o = _orient_i(ay, ax, by, bx, cy, cx)
    if final_o < 0:
        # a CW remainder after clipping CCW ears: the ring winds back
        # over itself (bowtie) — every valid ear sequence ends CCW
        raise ValueError("tessellation failed: polygon is not simple")
    if final_o > 0:
        tris.append((ay, ax, by, bx, cy, cx))
    if not tris:
        raise ValueError("polygon has zero area after quantization")
    # exact area conservation: clipped ears of a SIMPLE ring sum to the
    # shoelace area; a self-intersecting input that still found ears (a
    # bowtie) fails this check — ear clipping alone cannot detect it
    tri_area2 = sum(
        (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
        for ay, ax, by, bx, cy, cx in tris
    )
    if tri_area2 != abs(area2):
        raise ValueError("tessellation failed: polygon is not simple")
    return np.asarray(tris, dtype=np.int64)


# --------------------------------------------------------------------- build

def synth_rects(src: DataFrame, id_col: str = "event_id") -> DataFrame:
    """Deterministic per-doc rectangle rings from an integer id — gate
    data (no external geometry). Exact-integer derived corners mirrored
    verbatim by the DuckDB oracle; the upper corners clamp below the
    pole/dateline so every ring is valid and non-degenerate."""
    gid = F.col(id_col)
    lat0, lon0 = synth_latlon(id_col)
    lat1 = F.least(lat0 + ((gid % 97) / 10.0 + 0.5), F.lit(89.9))
    lon1 = F.least(lon0 + ((gid % 89) / 10.0 + 0.5), F.lit(179.9))
    return src.select(
        gid.cast("long").alias("gid"),
        F.array(lat0, lat0, lat1, lat1, lat0).alias("lats"),
        F.array(lon0, lon1, lon1, lon0, lon0).alias("lons"),
    )


def build_shapes(
    spark: SparkSession,
    src: DataFrame,
    out_dir: str,
    id_col: str = "gid",
    lats_col: str = "lats",
    lons_col: str = "lons",
    n_files: int = 8,
) -> str:
    """Tessellate every document's ring in a distributed Arrow kernel and
    write the z-ordered triangle table (LatLonShape.createIndexableFields
    + the BKD-analog layout)."""
    rows = src.select(
        F.col(id_col).cast("long").alias("gid"),
        F.col(lats_col).alias("lats"),
        F.col(lons_col).alias("lons"),
    )

    def kernel(batches):
        for pdf in batches:
            out = []
            for gid, lats, lons in zip(pdf["gid"], pdf["lats"], pdf["lons"]):
                t = tessellate(list(lats), list(lons))
                ys = t[:, (0, 2, 4)]
                xs = t[:, (1, 3, 5)]
                block = pd.DataFrame({
                    "gid": np.full(len(t), gid, dtype=np.int64),
                    "ay": t[:, 0], "ax": t[:, 1],
                    "by": t[:, 2], "bx": t[:, 3],
                    "cy": t[:, 4], "cx": t[:, 5],
                    "min_y": ys.min(axis=1), "max_y": ys.max(axis=1),
                    "min_x": xs.min(axis=1), "max_x": xs.max(axis=1),
                })
                out.append(block)
            yield pd.concat(out) if out else pd.DataFrame(
                {c.split()[0]: pd.Series(dtype=np.int64)
                 for c in _TRI_SCHEMA.split(", ")}
            )

    tri = rows.mapInPandas(kernel, schema=_TRI_SCHEMA)
    # z-order by the bbox center: row-group min/max stats on min/max_y/x
    # stay tight, so a box query prunes row groups like BKD cells
    ctr_y = ((F.col("min_y") + F.col("max_y")) / 2 + F.lit(2**31)).cast("long")
    ctr_x = ((F.col("min_x") + F.col("max_x")) / 2 + F.lit(2**31)).cast("long")

    @F.pandas_udf("long")
    def morton(yc: pd.Series, xc: pd.Series) -> pd.Series:
        m = _morton32(yc.to_numpy(np.uint64), xc.to_numpy(np.uint64))
        return pd.Series(m.astype(np.int64))

    (
        tri.withColumn("z", morton(ctr_y, ctr_x))
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def read_shapes(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


# ------------------------------------------------------------------- queries

def _orient_c(ay, ax, by, bx, cy, cx):
    """GeoUtils.orient sign as a column expression (double multiply —
    int32 differences are exact in doubles, only the product rounds,
    exactly like the reference's double orient)."""
    v1 = (bx - ax) * (cy - ay)
    v2 = (cx - ax) * (by - ay)
    return F.when(v1 > v2, F.lit(1)).when(v1 < v2, F.lit(-1)).otherwise(F.lit(0))


def _crosses_with_boundary(ay, ax, by, bx, y1, x1, y2, x2):
    """GeoUtils.lineCrossesLineWithBoundary for the segment (a, b) vs the
    constant box edge (p1, p2)."""
    o1 = _orient_c(F.lit(y1), F.lit(x1), F.lit(y2), F.lit(x2), ay, ax)
    o2 = _orient_c(F.lit(y1), F.lit(x1), F.lit(y2), F.lit(x2), by, bx)
    o3 = _orient_c(ay, ax, by, bx, F.lit(y1), F.lit(x1))
    o4 = _orient_c(ay, ax, by, bx, F.lit(y2), F.lit(x2))
    return (o1 * o2 <= 0) & (o3 * o4 <= 0)


def shape_box(
    shapes: DataFrame,
    relation: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> DataFrame:
    """LatLonShape.newBoxQuery(field, relation, box) — doc-level gid set.

    Box encoded like LatLonPoint.newBoxQuery (lower edges ceil, upper
    floor); relations follow Rectangle2D:

    - INTERSECTS: any triangle intersects the box
      (``Rectangle2D.intersectsTriangle``: vertex-in-box OR
      box-corner-in-triangle OR edge-crosses-edge, boundary inclusive).
      The triangle-bbox-overlap shortcut is the SCAN PREFILTER — four
      pushed-down int comparisons that prune z-ordered row groups.
    - WITHIN: every triangle inside the box
      (``Rectangle2D.containsTriangle`` = bbox within; one bool_and).
    - DISJOINT: no triangle intersects — the doc universe anti-joined
      against the INTERSECTS set.

    Dateline-crossing query boxes (min_lon > max_lon) are not supported
    (the reference splits those into two boxes; callers can OR two
    calls)."""
    if min_lon > max_lon:
        raise ValueError("dateline-crossing box: query two boxes and union")
    min_y = encode_latitude_ceil(min_lat)
    max_y = encode_latitude(max_lat)
    min_x = encode_longitude_ceil(min_lon)
    max_x = encode_longitude(max_lon)
    if relation == WITHIN:
        ok = (
            (F.col("min_y") >= min_y) & (F.col("max_y") <= max_y)
            & (F.col("min_x") >= min_x) & (F.col("max_x") <= max_x)
        )
        return (
            shapes.groupBy("gid")
            .agg(F.min(ok.cast("int")).alias("all_in"))
            .filter(F.col("all_in") == 1)
            .select("gid")
        )
    # triangle-bbox overlap — the pushed-down prefilter
    overlap = (
        (F.col("max_y") >= min_y) & (F.col("min_y") <= max_y)
        & (F.col("max_x") >= min_x) & (F.col("min_x") <= max_x)
    )
    ay, ax = F.col("ay").cast("double"), F.col("ax").cast("double")
    by, bx = F.col("by").cast("double"), F.col("bx").cast("double")
    cy, cx = F.col("cy").cast("double"), F.col("cx").cast("double")

    def in_box(y, x):
        return (y >= min_y) & (y <= max_y) & (x >= min_x) & (x <= max_x)

    # Component2D.pointInTriangle for the box's min corner (with the
    # degenerate-triangle bbox guard folded into `overlap`)
    py, px = F.lit(float(min_y)), F.lit(float(min_x))
    o_a = _orient_c(py, px, ay, ax, by, bx)
    o_b = _orient_c(py, px, by, bx, cy, cx)
    o_c = _orient_c(py, px, cy, cx, ay, ax)
    corner_in_tri = (
        (F.col("min_y") <= min_y) & (F.col("max_y") >= min_y)
        & (F.col("min_x") <= min_x) & (F.col("max_x") >= min_x)
        & (
            ((o_a >= 0) & (o_b >= 0) & (o_c >= 0))
            | ((o_a <= 0) & (o_b <= 0) & (o_c <= 0))
        )
    )
    box_edges = [
        (float(min_y), float(min_x), float(min_y), float(max_x)),
        (float(min_y), float(max_x), float(max_y), float(max_x)),
        (float(max_y), float(max_x), float(max_y), float(min_x)),
        (float(max_y), float(min_x), float(min_y), float(min_x)),
    ]
    edge_cross = F.lit(False)
    for (sy, sx, ey, ex) in [(ay, ax, by, bx), (by, bx, cy, cx),
                             (cy, cx, ay, ax)]:
        # Rectangle2D.edgesIntersect's segment-bbox shortcut — besides
        # pruning, it rejects collinear-but-disjoint segments that the
        # boundary-inclusive orient test would miscount as crossing
        seg_ok = (
            (F.greatest(sx, ex) >= min_x) & (F.least(sx, ex) <= max_x)
            & (F.least(sy, ey) <= max_y) & (F.greatest(sy, ey) >= min_y)
        )
        seg_cross = F.lit(False)
        for (y1, x1, y2, x2) in box_edges:
            seg_cross = seg_cross | _crosses_with_boundary(
                sy, sx, ey, ex, y1, x1, y2, x2
            )
        edge_cross = edge_cross | (seg_ok & seg_cross)
    hit = (
        in_box(ay, ax) | in_box(by, bx) | in_box(cy, cx)
        | corner_in_tri | edge_cross
    )
    inter = (
        shapes.filter(overlap).filter(hit).select("gid").distinct()
    )
    if relation == INTERSECTS:
        return inter
    if relation == DISJOINT:
        return (
            shapes.select("gid").distinct()
            .join(inter, "gid", "left_anti")
        )
    raise ValueError(f"unsupported relation {relation!r} (CONTAINS needs "
                     "tessellation edge-origin flags; see COVERAGE.md)")


def _tri_dec():
    """Decoded triangle vertex/bbox columns — EXACT doubles (an int32
    times a dyadic constant is one errorless IEEE multiply)."""
    from .spatial import LAT_DECODE, LON_DECODE

    d = {}
    for c in ("ay", "by", "cy", "min_y", "max_y"):
        d[c] = F.col(c) * F.lit(LAT_DECODE)
    for c in ("ax", "bx", "cx", "min_x", "max_x"):
        d[c] = F.col(c) * F.lit(LON_DECODE)
    return d


def _crosses_tri(d, edges, include_boundary: bool):
    """EdgeTree.crossesTriangle (core/geo/EdgeTree.java:166-222): every
    polygon edge within the triangle's bbox band tested against the
    three triangle edges — boundary-inclusive (``<= 0``,
    lineCrossesLineWithBoundary) or strict (``< 0``, lineCrossesLine)."""
    out = F.lit(False)
    tri_edges = [
        (d["ay"], d["ax"], d["by"], d["bx"]),
        (d["by"], d["bx"], d["cy"], d["cx"]),
        (d["cy"], d["cx"], d["ay"], d["ax"]),
    ]
    for (dy, dx, ey, ex) in edges:
        guard = ~(
            ((F.lit(dy) < d["min_y"]) & (F.lit(ey) < d["min_y"]))
            | ((F.lit(dy) > d["max_y"]) & (F.lit(ey) > d["max_y"]))
            | ((F.lit(dx) < d["min_x"]) & (F.lit(ex) < d["min_x"]))
            | ((F.lit(dx) > d["max_x"]) & (F.lit(ex) > d["max_x"]))
        )
        edge_hit = F.lit(False)
        for (sy, sx, ty, tx) in tri_edges:
            o1 = _orient_c(F.lit(dy), F.lit(dx), F.lit(ey), F.lit(ex), sy, sx)
            o2 = _orient_c(F.lit(dy), F.lit(dx), F.lit(ey), F.lit(ex), ty, tx)
            o3 = _orient_c(sy, sx, ty, tx, F.lit(dy), F.lit(dx))
            o4 = _orient_c(sy, sx, ty, tx, F.lit(ey), F.lit(ex))
            if include_boundary:
                edge_hit = edge_hit | ((o1 * o2 <= 0) & (o3 * o4 <= 0))
            else:
                edge_hit = edge_hit | ((o1 * o2 < 0) & (o3 * o4 < 0))
        out = out | (guard & edge_hit)
    return out


def shape_polygon(
    shapes: DataFrame,
    relation: str,
    lats: "list[float]",
    lons: "list[float]",
) -> DataFrame:
    """LatLonShape.newPolygonQuery (single-ring query polygon) — doc-level
    gid set, relations per Polygon2D (core/geo/Polygon2D.java:174-242,
    holes=null):

    - INTERSECTS (``intersectsTriangle``): any-triangle-vertex-in-polygon
      (EdgeTree PNPOLY with the on-edge rule) OR first-polygon-vertex-in-
      triangle OR any polygon edge crosses any triangle edge
      (boundary-inclusive). The polygon-bbox-vs-triangle-bbox shortcut is
      the SCAN PREFILTER (four pushed-down int comparisons).
    - WITHIN (``containsTriangle``): every triangle has all three
      vertices contained with NO strict edge crossing (includeBoundary =
      false — a shared boundary still counts as contained).
    - DISJOINT: no triangle intersects.

    All geometry runs in decoded-degree doubles: triangle coordinates
    decode EXACTLY (int32 x dyadic), the polygon stays raw, and orients
    round exactly like the reference's double ``orient``."""
    from .spatial import _polygon_edges, _ring_contains

    edges = _polygon_edges(lats, lons)
    d = _tri_dec()

    def contains(y, x):
        return _ring_contains(lats, lons, y=y, x=x)

    if relation == WITHIN:
        ok = (
            contains(d["ay"], d["ax"]) & contains(d["by"], d["bx"])
            & contains(d["cy"], d["cx"])
            & ~_crosses_tri(d, edges, include_boundary=False)
        )
        return (
            shapes.groupBy("gid")
            .agg(F.min(ok.cast("int")).alias("all_in"))
            .filter(F.col("all_in") == 1)
            .select("gid")
        )
    # Component2D.disjoint shortcut in ENCODED space (pushes into the scan)
    min_y = encode_latitude_ceil(min(lats))
    max_y = encode_latitude(max(lats))
    min_x = encode_longitude_ceil(min(lons))
    max_x = encode_longitude(max(lons))
    overlap = (
        (F.col("max_y") >= min_y) & (F.col("min_y") <= max_y)
        & (F.col("max_x") >= min_x) & (F.col("min_x") <= max_x)
    )
    p0y, p0x = float(lats[0]), float(lons[0])
    o_a = _orient_c(F.lit(p0y), F.lit(p0x), d["ay"], d["ax"], d["by"], d["bx"])
    o_b = _orient_c(F.lit(p0y), F.lit(p0x), d["by"], d["bx"], d["cy"], d["cx"])
    o_c = _orient_c(F.lit(p0y), F.lit(p0x), d["cy"], d["cx"], d["ay"], d["ax"])
    p0_in_tri = (
        (d["min_y"] <= p0y) & (d["max_y"] >= p0y)
        & (d["min_x"] <= p0x) & (d["max_x"] >= p0x)
        & (
            ((o_a >= 0) & (o_b >= 0) & (o_c >= 0))
            | ((o_a <= 0) & (o_b <= 0) & (o_c <= 0))
        )
    )
    hit = (
        contains(d["ay"], d["ax"]) | contains(d["by"], d["bx"])
        | contains(d["cy"], d["cx"]) | p0_in_tri
        | _crosses_tri(d, edges, include_boundary=True)
    )
    inter = shapes.filter(overlap).filter(hit).select("gid").distinct()
    if relation == INTERSECTS:
        return inter
    if relation == DISJOINT:
        return shapes.select("gid").distinct().join(inter, "gid", "left_anti")
    raise ValueError(f"unsupported relation {relation!r}")
