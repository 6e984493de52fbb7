"""Geodesic column expressions.

Pure `pyspark.sql.functions` math — stays inside WholeStageCodegen, no UDFs.
Haversine mirrors the reference's comparison metric
(wifi-positioning-integration-service/.../service/ComparisonService.java:289-296);
the local tangent-plane projection mirrors the trilateration prep
(wifi-positioning-service/.../algorithm/impl/TrilaterationAlgorithm.java:87-94,
111,000 m per degree).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_000.0
METERS_PER_DEG = 111_000.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters between two (lat, lon) pairs."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def local_xy_m(lat: Column, lon: Column, lat0: Column, lon0: Column) -> tuple[Column, Column]:
    """Project (lat, lon) to meters east/north of (lat0, lon0).

    Flat-earth approximation used by the reference's trilateration; valid for
    the sub-kilometer extents of a single AP's measurement cloud.
    """
    x = (lon - lon0) * F.lit(METERS_PER_DEG) * F.cos(F.radians(lat0))
    y = (lat - lat0) * F.lit(METERS_PER_DEG)
    return x, y
