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


def test_compare_positions_and_report(spark):
    """ComparisonService semantics: agreement iff haversine distance is within
    the combined claimed uncertainty; one-sided answers classify as *_ONLY."""
    from wifi_location_data_pipeline_spark.operators.comparison import (
        agreement_report,
        compare_positions,
    )

    primary = spark.createDataFrame(
        [
            ("r1", 40.7580, -73.9855, 30.0),   # ~22m off shadow, within budget
            ("r2", 40.7580, -73.9855, 5.0),    # ~111m off shadow, outside
            ("r3", 40.7000, -74.0000, 10.0),   # no shadow answer
        ],
        "request_id string, latitude double, longitude double, accuracy double",
    )
    shadow = spark.createDataFrame(
        [
            ("r1", 40.7582, -73.9855, 20.0),
            ("r2", 40.7590, -73.9855, 5.0),
            ("r4", 40.7100, -74.0100, 10.0),   # no primary answer
        ],
        "request_id string, latitude double, longitude double, accuracy double",
    )
    cmp = {r["request_id"]: r for r in compare_positions(primary, shadow).collect()}
    assert cmp["r1"]["agreement"] == "AGREE"
    assert abs(cmp["r1"]["disagreement_m"] - 22.2) < 1.0
    assert cmp["r2"]["agreement"] == "DISAGREE"
    assert cmp["r3"]["agreement"] == "PRIMARY_ONLY"
    assert cmp["r4"]["agreement"] == "SHADOW_ONLY"
    rep = {r["agreement"]: r for r in agreement_report(compare_positions(primary, shadow)).collect()}
    assert rep["AGREE"]["n_requests"] == 1 and rep["DISAGREE"]["n_requests"] == 1
