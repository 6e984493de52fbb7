"""Geodesic column expressions: haversine sanity + geohash vs the canonical
public algorithm (functions/geo.py; plans/dialect.geohash_parts)."""

import pytest
from pyspark.sql import functions as F

from wifi_location_data_pipeline_spark.functions.geo import geohash, haversine_m

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Canonical interval-halving geohash (public-domain algorithm)."""
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    out, bits, ch, even = [], 0, 0, True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_lo = mid
            else:
                ch = ch * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_lo = mid
            else:
                ch = ch * 2
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(BASE32[ch])
            bits, ch = 0, 0
    return "".join(out)


CASES = [
    (57.64911, 10.40744),    # classic docs example -> u4pruy
    (40.689247, -74.044502), # Statue of Liberty
    (-33.86882, 151.20929),  # Sydney (S/E hemispheres)
    (0.0, 0.0),
    (89.9999, 179.9999),     # upper-edge clamp
    (-90.0, -180.0),
]


@pytest.mark.parametrize("precision", [5, 6, 7])
def test_geohash_matches_canonical_algorithm(spark, precision):
    df = spark.createDataFrame(CASES, "lat double, lon double").withColumn(
        "gh", geohash(F.col("lat"), F.col("lon"), precision=precision)
    )
    got = {(r["lat"], r["lon"]): r["gh"] for r in df.collect()}
    for lat, lon in CASES:
        assert got[(lat, lon)] == ref_geohash(lat, lon, precision), (lat, lon)


def test_geohash_known_value(spark):
    df = spark.createDataFrame([(57.64911, 10.40744)], "lat double, lon double")
    assert df.select(geohash(F.col("lat"), F.col("lon"), 6).alias("g")).first()["g"] == "u4pruy"


def test_haversine_known_distance(spark):
    # JFK -> LHR great-circle distance ~ 5,540 km
    df = spark.createDataFrame([(40.6413, -73.7781, 51.4700, -0.4543)],
                               "lat1 double, lon1 double, lat2 double, lon2 double")
    d = df.select(
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).first()["d"]
    assert 5_500_000 < d < 5_600_000
