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


def nearby(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    distance_m: float,
    dist_name: str = "distance_m",
) -> DataFrame:
    """Radius filter + ascending distance order (endpoint_nearby.py:67-77)."""
    d = haversine_m(F.col(lat_col), F.col(lon_col), lat, lon)
    return (
        df.withColumn(dist_name, d)
        .filter(F.col(dist_name) <= F.lit(distance_m))
        .orderBy(F.col(dist_name).asc())
    )
