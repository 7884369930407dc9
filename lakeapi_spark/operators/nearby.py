"""Nearby (geo) operator (§2.11).

Reference: config ``nearby: [{name, lat_col, lon_col}]`` + POST body
``{nearby: {lat, lon, distance_m}}`` adds a haversine-distance column
and wraps the query in a CTE to filter ``dist <= distance_m`` and order
ascending (endpoint/endpoint_nearby.py:37-79). The haversine formula is
the generic SQL one at context/df_base.py:329-352:

    6371000 * acos(cos(radians(lat1))*cos(radians(lat2))
                   *cos(radians(lon2)-radians(lon1))
                   + sin(radians(lat1))*sin(radians(lat2)))

DataFrames don't need the CTE wrap — withColumn + filter + orderBy.
All trig is built-in (JVM, codegen) — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_m(lat_col: Column, lon_col: Column, lat: float, lon: float) -> Column:
    """Great-circle distance in meters (spherical law of cosines variant,
    exactly the reference's formula df_base.py:329-352)."""
    rlat1 = F.radians(F.lit(lat))
    rlat2 = F.radians(lat_col)
    rdlon = F.radians(lon_col) - F.radians(F.lit(lon))
    # clamp acos argument to [-1, 1] — floating error can push it out
    arg = F.cos(rlat1) * F.cos(rlat2) * F.cos(rdlon) + F.sin(rlat1) * F.sin(rlat2)
    arg = F.least(F.greatest(arg, F.lit(-1.0)), F.lit(1.0))
    return F.lit(EARTH_RADIUS_M) * F.acos(arg)


METERS_PER_DEGREE = 111320.0  # one degree of latitude (and of longitude at the equator)


def bounding_box(
    lat: float, lon: float, distance_m: float
) -> tuple[float, float, float, float] | None:
    """Conservative (lat_min, lat_max, lon_min, lon_max) superset of the
    radius, or None when the cap crosses a pole / the antimeridian and
    a simple box can't bound it."""
    dlat = distance_m / METERS_PER_DEGREE
    lat_min, lat_max = lat - dlat, lat + dlat
    if lat_max >= 89.9 or lat_min <= -89.9:
        return None
    import math

    dlon = distance_m / (METERS_PER_DEGREE * math.cos(math.radians(max(abs(lat_min), abs(lat_max)))))
    lon_min, lon_max = lon - dlon, lon + dlon
    if lon_min < -180.0 or lon_max > 180.0:
        return None
    return (lat_min, lat_max, lon_min, lon_max)


def nearby(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    distance_m: float,
    dist_name: str = "distance_m",
) -> DataFrame:
    """Radius filter + ascending distance order (endpoint_nearby.py:67-77).

    A plain-column bounding-box prefilter runs BEFORE the haversine:
    the trig-expression radius filter can never reach the scan, but
    `lat BETWEEN a AND b AND lon BETWEEN c AND d` does — parquet
    row-group min/max skipping and geo-partitioned layouts prune on it
    (PushedFilters asserted in tests/test_plans.py). The box is a
    strict superset of the radius, so the exact haversine filter on
    the survivors returns identical rows; degenerate boxes (pole /
    antimeridian) fall back to the full scan."""
    box = bounding_box(lat, lon, distance_m)
    if box is not None:
        lat_min, lat_max, lon_min, lon_max = box
        df = df.filter(
            F.col(lat_col).between(F.lit(lat_min), F.lit(lat_max))
            & F.col(lon_col).between(F.lit(lon_min), F.lit(lon_max))
        )
    d = haversine_m(F.col(lat_col), F.col(lon_col), lat, lon)
    return (
        df.withColumn(dist_name, d)
        .filter(F.col(dist_name) <= F.lit(distance_m))
        .orderBy(F.col(dist_name).asc())
    )
