"""Multi-component QUERY geometries (core/geo/ComponentTree.java):
any-component delegation for INTERSECTS/WITHIN/DISJOINT, and the
reference's explicit refusal of multi-component CONTAINS."""

import numpy as np
import pytest

from lucene_spark.operators import shapes as sh


@pytest.fixture(scope="module")
def rect_shapes(spark, tmp_path_factory):
    """20 rectangles on a grid: gid i covers lat [i, i+0.8], lon [2i, 2i+1]."""
    rows = []
    for i in range(20):
        la, lb = float(i), float(i) + 0.8
        lo, hi = float(2 * i), float(2 * i) + 1.0
        rows.append((i, [la, lb, lb, la, la], [lo, lo, hi, hi, lo]))
    src = spark.createDataFrame(
        rows, "gid long, lats array<double>, lons array<double>"
    )
    out = str(tmp_path_factory.mktemp("shp_multi") / "shp")
    sh.build_shapes(spark, src, out, n_files=2)
    return sh.read_shapes(spark, out)


BOX_A = (0.0, 3.5, 0.0, 7.5)       # covers rects 0..3 partially/fully
# lower edges strictly below the rect corners: a box's lower edge encodes
# with ceil while rect vertices encode with floor, so an exactly shared
# boundary falls OUTSIDE the quantized box (LatLonPoint semantics)
BOX_B = (9.95, 12.9, 19.95, 25.5)  # covers rects 10..12


def _gids(df):
    return {r.gid for r in df.collect()}


def test_multi_intersects_is_union(spark, rect_shapes):
    got = _gids(sh.shape_multi_query(
        rect_shapes, sh.INTERSECTS,
        [("box", BOX_A), ("box", BOX_B)],
    ))
    want = _gids(sh.shape_box(rect_shapes, sh.INTERSECTS, *BOX_A)) | _gids(
        sh.shape_box(rect_shapes, sh.INTERSECTS, *BOX_B)
    )
    assert got == want and want


def test_multi_disjoint_is_complement(spark, rect_shapes):
    got = _gids(sh.shape_multi_query(
        rect_shapes, sh.DISJOINT, [("box", BOX_A), ("box", BOX_B)],
    ))
    inter = _gids(sh.shape_multi_query(
        rect_shapes, sh.INTERSECTS, [("box", BOX_A), ("box", BOX_B)],
    ))
    assert got == set(range(20)) - inter


def test_multi_within_any_component_per_triangle(spark, rect_shapes):
    # rects fully inside A: 0..2 (rect 3 spans lat 3..3.8 > 3.5);
    # fully inside B: 10..12. Each rect's triangles all sit in ONE box, so
    # any-component containment = union of single-box WITHIN here.
    got = _gids(sh.shape_multi_query(
        rect_shapes, sh.WITHIN, [("box", BOX_A), ("box", BOX_B)],
    ))
    want = _gids(sh.shape_box(rect_shapes, sh.WITHIN, *BOX_A)) | _gids(
        sh.shape_box(rect_shapes, sh.WITHIN, *BOX_B)
    )
    assert got == want
    assert want == {0, 1, 2, 10, 11, 12}


def test_multi_within_spanning_triangle_not_contained(spark, tmp_path):
    # ComponentTree quirk: a triangle spanning two ADJACENT boxes is within
    # their union but containsTriangle(any single) is false -> not WITHIN.
    src = spark.createDataFrame(
        [(1, [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 4.0, 4.0, 0.0])],
        "gid long, lats array<double>, lons array<double>",
    )
    out = str(tmp_path / "span")
    sh.build_shapes(spark, src, out, n_files=1)
    tri = sh.read_shapes(spark, out)
    left = ("box", (-1.0, 2.0, -1.0, 2.0))
    right = ("box", (-1.0, 2.0, 2.0, 5.0))
    assert _gids(sh.shape_multi_query(tri, sh.WITHIN, [left, right])) == set()
    # ...but a big single box containing the rect does match
    both = ("box", (-1.0, 2.0, -1.0, 5.0))
    assert _gids(sh.shape_multi_query(tri, sh.WITHIN, [both])) == {1}


def test_multi_with_polygon_component(spark, rect_shapes):
    # triangle polygon covering the rect-0 region + box over rect 5
    poly = ("polygon", ([-1.0, 3.0, -1.0, -1.0], [-1.0, 0.5, 3.0, -1.0]))
    box = ("box", (5.0, 5.9, 10.0, 11.5))
    got = _gids(sh.shape_multi_query(
        rect_shapes, sh.INTERSECTS, [poly, box],
    ))
    want = _gids(sh.shape_polygon(rect_shapes, sh.INTERSECTS, *poly[1])) | _gids(
        sh.shape_box(rect_shapes, sh.INTERSECTS, *box[1])
    )
    assert got == want and want


def test_multi_contains_unsupported(spark, rect_shapes):
    with pytest.raises(ValueError, match="more than one component"):
        sh.shape_multi_query(
            rect_shapes, sh.CONTAINS, [("box", BOX_A), ("box", BOX_B)],
        )
    # single component delegates
    one = sh.shape_multi_query(rect_shapes, sh.CONTAINS, [("box", (0.1, 0.2, 0.1, 0.2))])
    assert _gids(one) == _gids(
        sh.shape_box(rect_shapes, sh.CONTAINS, 0.1, 0.2, 0.1, 0.2)
    )


def test_empty_components_rejected(rect_shapes):
    with pytest.raises(ValueError, match="empty"):
        sh.shape_multi_query(rect_shapes, sh.INTERSECTS, [])
