"""Spatial operators (BigQuery GIS ST_DWITHIN / spatial-join analogue).

Spark has no native spatial join; the scalable formulation is the same
bucket-then-refine pattern used by `range_join.py` and the LSH dedup
family: quantize coordinates into grid cells sized to the search
radius, join on cell id (a plain hash-shuffle equi-join), then refine
candidates with the exact haversine. The quadratic cross product never
materializes — candidates are bounded by points-per-cell × a small
constant neighborhood, and the equi-join shuffles each side once.

Longitude cells shrink with cos(latitude), so the neighborhood width in
lon-cells is computed PER ROW (`ceil(1/cos(lat))`) and expanded with
`sequence()` + `explode` — linear output, correct up to ±~84° latitude
(beyond that `1/cos` explodes; polar data should use a polar-cap cell
scheme instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KM_PER_DEG_LAT = 111.045  # mean meridian degree


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine, mean earth radius)."""
    h = (
        F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
    )
    return 2 * F.lit(6371.0088) * F.asin(F.sqrt(h))


def grid_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_cols: tuple[str, str, str] = ("l_id", "lat", "lon"),
    right_cols: tuple[str, str, str] = ("r_id", "lat", "lon"),
    keep_coords: bool = False,
) -> DataFrame:
    """All (left, right) pairs within ``radius_km``: grid-cell candidate
    join + exact haversine refine. Returns left id, right id, dist_km
    (exact double — caller rounds for display).

    ``keep_coords=True`` additionally returns the pair's coordinates
    under the documented stable names ``l_lat/l_lon/r_lat/r_lon``
    (r14, ADVICE r13: the internal working names ``_llat…`` leaked into
    the public schema) — they already ride the candidate join, and a
    caller that needs them (e.g. for a tie-break metric) would
    otherwise have to re-join both base tables on the ids (r13: that
    cost q_geo_join two extra scans + broadcast builds).

    The LEFT side explodes into its neighborhood (3 lat-cells ×
    (2·ceil(1/cos φ)+1) lon-cells); the right side maps to its single
    home cell, so each true pair is produced exactly once.
    """
    lid, llat, llon = left_cols
    rid, rlat, rlon = right_cols
    d = radius_km / KM_PER_DEG_LAT  # cell size in degrees

    def cell(lat: Column, lon: Column) -> tuple[Column, Column]:
        return (
            F.floor(lat / F.lit(d)).cast("long"),
            F.floor(lon / F.lit(d)).cast("long"),
        )

    rcy, rcx = cell(F.col(rlat), F.col(rlon))
    r = right.select(
        F.col(rid),
        F.col(rlat).alias("_rlat"),
        F.col(rlon).alias("_rlon"),
        rcy.alias("_cy"),
        rcx.alias("_cx"),
    )

    lcy, lcx = cell(F.col(llat), F.col(llon))
    k_lon = F.ceil(1.0 / F.cos(F.radians(F.col(llat)))).cast("int")
    l = (
        left.select(
            F.col(lid),
            F.col(llat).alias("_llat"),
            F.col(llon).alias("_llon"),
            lcy.alias("_lcy"),
            lcx.alias("_lcx"),
            k_lon.alias("_k"),
        )
        .withColumn("_dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("_dx", F.explode(F.sequence(-F.col("_k"), F.col("_k"))))
        .select(
            lid,
            "_llat",
            "_llon",
            (F.col("_lcy") + F.col("_dy")).alias("_cy"),
            (F.col("_lcx") + F.col("_dx")).alias("_cx"),
        )
    )

    cand = l.join(r, ["_cy", "_cx"])
    extra = (
        [
            F.col("_llat").alias("l_lat"),
            F.col("_llon").alias("l_lon"),
            F.col("_rlat").alias("r_lat"),
            F.col("_rlon").alias("r_lon"),
        ]
        if keep_coords
        else []
    )
    return cand.select(
        lid,
        rid,
        haversine_km(
            F.col("_llat"), F.col("_llon"), F.col("_rlat"), F.col("_rlon")
        ).alias("dist_km"),
        *extra,
    ).filter(F.col("dist_km") <= radius_km)
