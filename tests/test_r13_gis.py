"""r13 GIS widening (VERDICT r12 item 3): computed MULTI-RING
polygons (holes) ride the runtime HOF folds — containment, distance,
area, perimeter, numpoints — cross-validated against the LITERAL
path, whose translate-time Python math (Girard excess, 4-sign
crossing unroll, LEAST-chain distances) is an independent
implementation of the same geometry."""
from __future__ import annotations

import pytest

from bigquery_etl_spark.sources.bq_dialect import translate

LIT = (
    "ST_GEOGFROMTEXT('POLYGON((0 0, 10 0, 10 10, 0 10), "
    "(3 3, 7 3, 7 7, 3 7))')"
)
# identical donut built from per-row expressions (z = 0.0 at runtime):
# no literal parse possible, so every function takes the runtime path
COMP = (
    "ARRAY(ARRAY(ST_GEOGPOINT(z+0.0, z+0.0), ST_GEOGPOINT(z+10.0, "
    "z+0.0), ST_GEOGPOINT(z+10.0, z+10.0), ST_GEOGPOINT(z+0.0, "
    "z+10.0)), ARRAY(ST_GEOGPOINT(z+3.0, z+3.0), ST_GEOGPOINT(z+7.0, "
    "z+3.0), ST_GEOGPOINT(z+7.0, z+7.0), ST_GEOGPOINT(z+3.0, "
    "z+7.0)))"
)


@pytest.fixture(scope="module")
def donut_row(spark):
    spark.createDataFrame([(0.0,)], "z double").createOrReplaceTempView(
        "__r13_gis"
    )
    q = translate(f"""
    SELECT ST_CONTAINS({COMP}, ST_GEOGPOINT(1.0, 1.0)) AS in_shell,
           ST_CONTAINS({COMP}, ST_GEOGPOINT(5.0, 5.0)) AS in_hole,
           ST_CONTAINS({COMP}, ST_GEOGPOINT(15.0, 5.0)) AS outside,
           ST_AREA({COMP}) AS area_c, ST_AREA({LIT}) AS area_l,
           ST_PERIMETER({COMP}) AS per_c, ST_PERIMETER({LIT}) AS per_l,
           ST_NUMPOINTS({COMP}) AS np_c, ST_NUMPOINTS({LIT}) AS np_l,
           ST_DISTANCE({COMP}, ST_GEOGPOINT(5.0, 5.0)) AS d_hole_c,
           ST_DISTANCE({LIT}, ST_GEOGPOINT(5.0, 5.0)) AS d_hole_l,
           ST_DISTANCE({COMP}, ST_GEOGPOINT(12.0, 5.0)) AS d_out_c,
           ST_DISTANCE({LIT}, ST_GEOGPOINT(12.0, 5.0)) AS d_out_l,
           ST_INTERSECTS({COMP}, ST_GEOGPOINT(1.0, 1.0)) AS ix_shell,
           ST_INTERSECTS({COMP}, ST_GEOGPOINT(5.0, 5.0)) AS ix_hole
    FROM __r13_gis
    """)
    return spark.sql(q).collect()[0]


def test_computed_multiring_containment_even_odd(donut_row):
    r = donut_row
    assert r.in_shell is True
    assert r.in_hole is False  # inside the hole = outside the polygon
    assert r.outside is False
    assert r.ix_shell is True and r.ix_hole is False


def test_computed_multiring_area_matches_literal_girard(donut_row):
    r = donut_row
    # runtime Van Oosterom–Strackee fan (shell − hole) vs the literal
    # path's translate-time Girard excess — independent formulas
    assert r.area_l > 0
    assert abs(r.area_c - r.area_l) / r.area_l < 1e-9


def test_computed_multiring_perimeter_and_numpoints(donut_row):
    r = donut_row
    assert abs(r.per_c - r.per_l) / r.per_l < 1e-12
    assert r.np_c == r.np_l == 8


def test_computed_multiring_distance_matches_literal(donut_row):
    r = donut_row
    # from inside the hole: distance to the hole boundary (2 deg)
    assert abs(r.d_hole_c - r.d_hole_l) < 1e-6
    assert r.d_hole_l > 0
    # from outside the shell
    assert abs(r.d_out_c - r.d_out_l) < 1e-6
    assert r.d_out_l > 0


# -- GEOMETRYCOLLECTION (r13) -------------------------------------------------
GC = (
    "ST_GEOGFROMTEXT('GEOMETRYCOLLECTION(POINT(20 20), "
    "LINESTRING(-30 0, -10 10, 0 0), "
    "POLYGON((0 0, 10 0, 10 10, 0 10), (3 3, 7 3, 7 7, 3 7)), "
    "MULTIPOLYGON(((30 30, 40 30, 40 40, 30 40))))')"
)


@pytest.fixture(scope="module")
def gc_rows(spark):
    spark.createDataFrame(
        [(1.0, 1.0), (5.0, 5.0), (35.0, 35.0), (20.0, 20.0),
         (-20.0, 5.0)],
        "qx double, qy double",
    ).createOrReplaceTempView("__r13_gc")
    q = translate(f"""
    SELECT qx, qy,
           ST_CONTAINS({GC}, ST_GEOGPOINT(qx, qy)) AS inside,
           ST_INTERSECTS({GC}, ST_GEOGPOINT(qx, qy)) AS isect,
           ST_DISTANCE({GC}, ST_GEOGPOINT(qx, qy)) AS dist,
           ST_NUMPOINTS({GC}) AS np,
           ST_AREA({GC}) AS area,
           ST_LENGTH({GC}) AS length,
           ST_PERIMETER({GC}) AS perim,
           ST_ASTEXT({GC}) AS wkt
    FROM __r13_gc
    """)
    return {(r.qx, r.qy): r for r in spark.sql(q).collect()}


def test_gc_contains_or_over_polygon_members(gc_rows):
    assert gc_rows[(1.0, 1.0)].inside is True       # donut shell
    assert gc_rows[(5.0, 5.0)].inside is False      # donut hole
    assert gc_rows[(35.0, 35.0)].inside is True     # multipolygon member
    assert gc_rows[(20.0, 20.0)].inside is False    # point member: no interior
    assert gc_rows[(-20.0, 5.0)].inside is False


def test_gc_intersects_includes_point_member(gc_rows):
    assert gc_rows[(20.0, 20.0)].isect is True      # equals the point member
    assert gc_rows[(1.0, 1.0)].isect is True
    assert gc_rows[(5.0, 5.0)].isect is False


def test_gc_distance_is_min_over_members(gc_rows):
    assert gc_rows[(1.0, 1.0)].dist == 0.0
    assert gc_rows[(20.0, 20.0)].dist == 0.0        # point member
    # near the linestring, far from everything else
    d = gc_rows[(-20.0, 5.0)].dist
    assert 0 < d < 100_000
    # in the donut hole: distance to the hole boundary (~2 deg)
    dh = gc_rows[(5.0, 5.0)].dist
    assert 150_000 < dh < 300_000


def test_gc_measures_fold(gc_rows):
    r = gc_rows[(1.0, 1.0)]
    assert r.np == 16
    assert r.area > 0 and r.length > 0 and r.perim > 0
    assert r.wkt.startswith("GEOMETRYCOLLECTION(POINT(20.0 20.0)")


def test_gc_refusals_named():
    from bigquery_etl_spark.sources.bq_dialect import BQDialectError

    with pytest.raises(BQDialectError, match="nested collections"):
        translate(
            "SELECT ST_GEOGFROMTEXT('GEOMETRYCOLLECTION("
            "GEOMETRYCOLLECTION(POINT(1 1)))')"
        )
    with pytest.raises(BQDialectError, match="GEOMETRYCOLLECTION"):
        translate(
            f"SELECT ST_CENTROID({GC})"
        )
