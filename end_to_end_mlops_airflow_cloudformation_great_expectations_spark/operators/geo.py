"""Geospatial column math (SURVEY.md A6).

The reference's ``distance`` feature (train.parquet, observed range
0.00035-76.22 km) is a haversine-style great-circle distance computed
in pandas/scipy. Here it is a pure column-expression composition —
JVM-side, codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (lat, lon) points.

    d = 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))

    Written with only functions that exist verbatim in ANSI/DuckDB SQL
    (sin/cos/asin/sqrt/radians) so the DuckDB oracle is the same
    formula text.
    """
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon)
        * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))
