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


def geohash(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Standard geohash, pure column arithmetic (no UDF, codegen-friendly).

    Same bit math as plans.dialect.geohash_parts (one spec, two emitters);
    mirrors the reference's wifi_access_points.geohash GSI
    (WifiAccessPoint.java:73-101, wifi-access-points-schema.json).
    """
    from wifi_location_data_pipeline_spark.plans.dialect import GEOHASH_BASE32

    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    gx = F.least(
        F.floor((lon + 180.0) / 360.0 * (2**lon_bits)).cast("bigint"),
        F.lit(2**lon_bits - 1),
    )
    gy = F.least(
        F.floor((lat + 90.0) / 180.0 * (2**lat_bits)).cast("bigint"),
        F.lit(2**lat_bits - 1),
    )
    chars = []
    for c in range(precision):
        idx = F.lit(0)
        for j in range(5):
            k = 5 * c + j
            if k % 2 == 0:
                v, i = gx, lon_bits - 1 - k // 2
            else:
                v, i = gy, lat_bits - 1 - (k - 1) // 2
            bit = F.floor(v / F.lit(float(2**i))).cast("bigint") % 2
            idx = idx + bit * (2 ** (4 - j))
        chars.append(F.lit(GEOHASH_BASE32).substr(idx.cast("int") + 1, F.lit(1)))
    return F.concat(*chars)


def local_xy_m(lat: Column, lon: Column, lat0: Column, lon0: Column) -> tuple[Column, Column]:
    """Project (lat, lon) to meters east/north of (lat0, lon0).

    Flat-earth approximation used by the reference's trilateration; valid for
    the sub-kilometer extents of a single AP's measurement cloud.
    """
    x = (lon - lon0) * F.lit(METERS_PER_DEG) * F.cos(F.radians(lat0))
    y = (lat - lat0) * F.lit(METERS_PER_DEG)
    return x, y
