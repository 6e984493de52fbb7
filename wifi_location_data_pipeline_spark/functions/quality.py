"""Quality weighting and scoring expressions.

Semantics from wifi-measurements-transformer-service/.../WifiDataTransformationService.java:
- quality_weight (:653-660, thresholds application.yml:134-136)
- quality_score (:698-718)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from wifi_location_data_pipeline_spark import config as C


def quality_weight(connection_status: Column, link_speed: Column, rssi: Column) -> Column:
    """CONNECTED→2.0, SCAN→1.0; override 1.5 when linkSpeed<50 AND rssi>-70.

    The low-link-speed override only applies to CONNECTED rows (SCAN rows have
    no link speed).
    """
    is_connected = connection_status == "CONNECTED"
    low_link = (
        link_speed.isNotNull()
        & (link_speed < C.LOW_LINK_SPEED_THRESHOLD)
        & (rssi > C.LOW_LINK_SPEED_RSSI_GATE)
    )
    return (
        F.when(is_connected & low_link, F.lit(C.QUALITY_WEIGHT_LOW_LINK_SPEED))
        .when(is_connected, F.lit(C.QUALITY_WEIGHT_CONNECTED))
        .otherwise(F.lit(C.QUALITY_WEIGHT_SCAN))
    )


def quality_score(location_accuracy: Column, rssi: Column) -> Column:
    """0.5 + 0.3·max(0, 1−accuracy/100) + 0.2·max(0, (rssi+100)/100), capped at 1.0."""
    acc_term = F.greatest(F.lit(0.0), F.lit(1.0) - F.coalesce(location_accuracy, F.lit(100.0)) / 100.0)
    rssi_term = F.greatest(F.lit(0.0), (rssi.cast("double") + 100.0) / 100.0)
    score = (
        F.lit(C.QUALITY_SCORE_BASE)
        + F.lit(C.QUALITY_SCORE_ACCURACY_COEF) * acc_term
        + F.lit(C.QUALITY_SCORE_RSSI_COEF) * rssi_term
    )
    return F.least(F.lit(1.0), score)
