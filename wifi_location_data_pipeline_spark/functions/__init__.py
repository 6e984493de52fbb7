"""Shared column-expression builders (all JVM-side `pyspark.sql.functions`
compositions unless noted — no row-at-a-time Python in the hot path)."""

from wifi_location_data_pipeline_spark.functions.geo import (  # noqa: F401
    haversine_m,
    local_xy_m,
)
from wifi_location_data_pipeline_spark.functions.identifiers import (  # noqa: F401
    clean_ssid,
    device_id,
    event_id,
    normalize_bssid,
    oui,
)
from wifi_location_data_pipeline_spark.functions.quality import (  # noqa: F401
    quality_score,
    quality_weight,
)
