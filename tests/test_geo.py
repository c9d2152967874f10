"""grid_join correctness: the bucketed candidate join must find exactly
the pairs a brute-force cross join finds — including high latitudes
where a search radius spans multiple longitude cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_etl_spark.operators.geo import grid_join, haversine_km

RADIUS = 300.0


def _points(spark, name, rows):
    return spark.createDataFrame(rows, f"{name} long, lat double, lon double")


def test_grid_join_matches_brute_force(spark):
    left = _points(
        spark,
        "l_id",
        [
            (1, 0.0, 0.0),
            (2, 59.9, 10.0),   # high latitude: lon cells shrink
            (3, 72.5, -40.0),  # higher still (k_lon = 4)
            (4, -33.0, 151.0),
            (5, 0.1, 179.9),   # near the antimeridian (no wrap expected)
        ],
    )
    right = _points(
        spark,
        "r_id",
        [
            (10, 0.5, 1.0),     # ~124 km from l1
            (11, 60.1, 12.0),   # ~114 km from l2 (lon-heavy at 60N)
            (12, 72.0, -32.5),  # ~265 km from l3, ~3 lon cells away
            (13, -34.0, 151.5), # ~119 km from l4
            (14, 50.0, 50.0),   # far from everything
        ],
    )
    got = {
        (r.l_id, r.r_id)
        for r in grid_join(left, right, RADIUS).collect()
    }
    l = left.select(F.col("l_id"), F.col("lat").alias("la"), F.col("lon").alias("lo"))
    r = right.select(F.col("r_id"), F.col("lat").alias("ra"), F.col("lon").alias("ro"))
    brute = {
        (row.l_id, row.r_id)
        for row in l.crossJoin(r)
        .withColumn("d", haversine_km(F.col("la"), F.col("lo"), F.col("ra"), F.col("ro")))
        .filter(F.col("d") <= RADIUS)
        .collect()
    }
    assert got == brute
    assert (3, 12) in got  # the multi-lon-cell case actually exercised


def test_grid_join_no_duplicate_pairs(spark):
    left = _points(spark, "l_id", [(1, 10.0, 10.0)])
    right = _points(spark, "r_id", [(10, 10.1, 10.1)])
    rows = grid_join(left, right, RADIUS).collect()
    assert len(rows) == 1  # neighborhood explode must not double-count


def test_grid_join_keep_coords_stable_names(spark):
    """r14 (ADVICE r13): keep_coords must expose the pair coordinates
    under the documented stable names, not grid_join's internal working
    columns, and the values must be the joined rows' own lat/lon."""
    left = _points(spark, "l_id", [(1, 10.0, 10.0)])
    right = _points(spark, "r_id", [(10, 10.1, 10.1)])
    row = grid_join(left, right, RADIUS, keep_coords=True).collect()[0]
    assert {"l_lat", "l_lon", "r_lat", "r_lon"} <= set(row.asDict())
    assert not any(c.startswith("_") for c in row.asDict())
    assert (row.l_lat, row.l_lon, row.r_lat, row.r_lon) == (
        10.0, 10.0, 10.1, 10.1,
    )
