"""Per-AP aggregation queries over wifi_measurements (SURVEY.md §2.5).

The three canonical analysis queries of the table-schema doc:
- per-AP stats (:149-161): counts, conditional counts, time range, avg accuracy
- sufficiency gate (:165-176): HAVING COUNT(*) ≥ bootstrap threshold
- quality metrics (:180-192): avg weight, spatial stddev, active days

All algebraic/partial-aggregable → one shuffle each at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wifi_location_data_pipeline_spark import config as C


def per_ap_stats(measurements: DataFrame) -> DataFrame:
    return measurements.groupBy("bssid").agg(
        F.count("*").alias("total_measurements"),
        F.count(F.when(F.col("connection_status") == "CONNECTED", 1)).alias("connected_count"),
        F.count(F.when(F.col("is_global_outlier"), 1)).alias("outlier_count"),
        F.min("ingestion_timestamp").alias("first_seen"),
        F.max("ingestion_timestamp").alias("last_seen"),
        F.avg("location_accuracy").alias("avg_location_accuracy"),
    )


def sufficient_aps(
    measurements: DataFrame, min_measurements: int = C.LOCALIZATION_MIN_MEASUREMENTS
) -> DataFrame:
    """BSSIDs with enough clean measurements to localize (HAVING cnt >= 20)."""
    return (
        measurements.filter(~F.coalesce(F.col("is_global_outlier"), F.lit(False)))
        .groupBy("bssid")
        .agg(F.count("*").alias("measurement_count"))
        .filter(F.col("measurement_count") >= min_measurements)
    )


def ap_quality_metrics(measurements: DataFrame) -> DataFrame:
    return measurements.groupBy("bssid").agg(
        F.avg("quality_weight").alias("avg_quality_weight"),
        F.stddev_samp("latitude").alias("lat_stddev"),
        F.stddev_samp("longitude").alias("lon_stddev"),
        F.countDistinct(F.to_date("ingestion_timestamp")).alias("active_days"),
    )
