"""Shadow-comparison of two positioning answers per request (SURVEY §7 step 8).

Re-expresses wifi-positioning-integration-service's ComparisonService
(src/main/java/com/wifi/positioning/service/ComparisonService.java:29,
289-296,424-437): haversine distance between the two answers, expected
combined uncertainty √(a²+b²), and the agreement classification. The module
doubles as a self-validation harness — compare the engine's positions against
any oracle position source (e.g. planted truth or a second algorithm tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wifi_location_data_pipeline_spark.functions.geo import haversine_m


def compare_positions(
    primary: DataFrame,
    shadow: DataFrame,
    key: str = "request_id",
) -> DataFrame:
    """Join two (key, latitude, longitude, accuracy) answer sets and score
    agreement per request.

    agreement: AGREE if distance <= sqrt(acc_a^2 + acc_b^2) (both services'
    claimed uncertainties jointly explain the disagreement), else DISAGREE;
    requests answered by only one side classify as PRIMARY_ONLY/SHADOW_ONLY
    (ComparisonService's missing-result branches).
    """
    a = primary.select(
        key,
        F.col("latitude").alias("lat_a"),
        F.col("longitude").alias("lon_a"),
        F.col("accuracy").alias("acc_a"),
    )
    b = shadow.select(
        key,
        F.col("latitude").alias("lat_b"),
        F.col("longitude").alias("lon_b"),
        F.col("accuracy").alias("acc_b"),
    )
    j = a.join(b, key, "full")
    dist = haversine_m(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    expected = F.sqrt(F.col("acc_a") * F.col("acc_a") + F.col("acc_b") * F.col("acc_b"))
    return j.select(
        key,
        dist.alias("disagreement_m"),
        expected.alias("expected_uncertainty_m"),
        F.when(F.col("lat_a").isNull(), "SHADOW_ONLY")
        .when(F.col("lat_b").isNull(), "PRIMARY_ONLY")
        .when(dist <= expected, "AGREE")
        .otherwise("DISAGREE")
        .alias("agreement"),
    )


def agreement_report(comparison: DataFrame) -> DataFrame:
    """Aggregate agreement metrics (the integration service's summary stats):
    per-class counts, mean/p95 disagreement among compared pairs."""
    return comparison.groupBy("agreement").agg(
        F.count("*").alias("n_requests"),
        F.round(F.avg("disagreement_m"), 2).alias("mean_disagreement_m"),
        F.round(F.percentile_approx("disagreement_m", 0.95, 10000), 2).alias(
            "p95_disagreement_m"
        ),
    )
