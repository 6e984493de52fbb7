"""Stage-1 sanity filters on flattened measurement rows.

Semantics from wifi-measurements-transformer-service/.../DataValidationService.java
(thresholds in application.yml:130-147):
- location validity   (:196-228)  lat ∈ [-90,90] ∧ lon ∈ [-180,180], non-null
- GPS accuracy gate   (:214-223)  accuracy ≤ 150 m, NULL passes
- RSSI range gate     (:274-299)  -100 ≤ rssi ≤ 0, NULL rejected
- BSSID format        (:66-67,345-367,633-651)  MAC regex; all-zeros/broadcast rejected
- timestamp sanity    (:70,421-449)  not in future, not older than 365 days

All pure column predicates — Catalyst pushes them into the scan and reorders
freely (the reference's hand-tuned "cheap checks first" ordering is subsumed).
Filters are composable so individual rules are unit-testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wifi_location_data_pipeline_spark import config as C


def valid_location(lat: Column, lon: Column) -> Column:
    return (
        lat.isNotNull()
        & lon.isNotNull()
        & lat.between(-90.0, 90.0)
        & lon.between(-180.0, 180.0)
    )


def valid_accuracy(accuracy: Column, max_accuracy_m: float = C.MAX_LOCATION_ACCURACY_M) -> Column:
    """NULL accuracy passes (the reference treats missing accuracy as acceptable)."""
    return accuracy.isNull() | (accuracy <= max_accuracy_m)


def valid_rssi(rssi: Column) -> Column:
    return rssi.isNotNull() & rssi.between(C.RSSI_MIN_DBM, C.RSSI_MAX_DBM)


def valid_bssid(bssid: Column) -> Column:
    compact = F.lower(F.regexp_replace(bssid, "[:-]", ""))
    return (
        bssid.rlike(C.BSSID_REGEX)
        & ~compact.isin(*[m.lower() for m in C.INVALID_MACS_NO_SEP])
    )


def valid_timestamp(
    ts_ms: Column,
    now_ms: Column | None = None,
    max_age_days: int = C.MAX_MEASUREMENT_AGE_DAYS,
) -> Column:
    """Epoch-millis timestamp not in the future and at most ``max_age_days`` old.

    ``now_ms`` defaults to query-start time; pass a literal for deterministic
    tests / oracle comparison.
    """
    if now_ms is None:
        now_ms = (F.unix_timestamp(F.current_timestamp()) * 1000).cast("long")
    age_ms = F.lit(max_age_days).cast("long") * 86_400_000
    return ts_ms.isNotNull() & (ts_ms <= now_ms) & (ts_ms >= now_ms - age_ms)


def stage1_predicate(
    df_cols: dict[str, Column] | None = None,
    *,
    now_ms: Column | None = None,
    cfg: C.EngineConfig = C.DEFAULT_CONFIG,
) -> Column:
    """Conjunction of all stage-1 rules over standard measurement column names."""
    c = df_cols or {}
    lat = c.get("latitude", F.col("latitude"))
    lon = c.get("longitude", F.col("longitude"))
    acc = c.get("location_accuracy", F.col("location_accuracy"))
    rssi = c.get("rssi", F.col("rssi"))
    bssid = c.get("bssid", F.col("bssid"))
    ts = c.get("measurement_timestamp", F.col("measurement_timestamp"))
    return (
        valid_location(lat, lon)
        & valid_accuracy(acc, cfg.max_location_accuracy_m)
        & valid_rssi(rssi)
        & valid_bssid(bssid)
        & valid_timestamp(ts, now_ms=now_ms, max_age_days=cfg.max_age_days)
    )


def apply_stage1_filters(
    df: DataFrame,
    *,
    now_ms: Column | None = None,
    cfg: C.EngineConfig = C.DEFAULT_CONFIG,
) -> DataFrame:
    return df.filter(stage1_predicate(now_ms=now_ms, cfg=cfg))
