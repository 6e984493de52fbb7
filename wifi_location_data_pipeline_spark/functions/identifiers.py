"""Identifier / normalization column expressions.

Deterministic by design: the reference generates row ids with
``UUID.randomUUID()`` and timestamps with ``Instant.now()`` per row
(wifi-measurements-transformer-service/.../WifiDataTransformationService.java:286);
this engine derives ids from content hashes so results are reproducible and
golden-hash testable (SURVEY.md §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_bssid(bssid: Column) -> Column:
    """Lowercase, hyphens → colons (WifiDataTransformationService.java:819-825)."""
    return F.translate(F.lower(bssid), "-", ":")


def clean_ssid(ssid: Column) -> Column:
    """Strip NUL bytes, trim whitespace, empty → NULL
    (WifiDataTransformationService.java:855-863)."""
    return F.nullif(F.trim(F.regexp_replace(ssid, "\x00", "")), F.lit(""))


def oui(bssid: Column) -> Column:
    """First three octets, uppercase (DataValidationService.java:573-591).

    Assumes a normalized colon-separated BSSID; ``XX:XX:XX``.
    """
    return F.upper(F.substring(bssid, 1, 8))


def device_id(manufacturer: Column, model: Column, device: Column, os_version: Column) -> Column:
    """SHA-256 of 'manufacturer:model:device:osVersion'
    (WifiDataTransformationService.java:748-761,866-885)."""
    return F.sha2(F.concat_ws(":", manufacturer, model, device, os_version), 256)


def event_id(timestamp_ms: Column, bssid: Column) -> Column:
    """Deterministic scan-row event id: SHA-256('ts:bssid')
    (WifiDataTransformationService.java:789-791). Doubles as the dedup key."""
    return F.sha2(F.concat_ws(":", timestamp_ms.cast("string"), bssid), 256)


def row_id(event_id_col: Column, connection_status: Column) -> Column:
    """Deterministic row id (reference: UUID.randomUUID(); see module docstring)."""
    return F.sha2(F.concat_ws("/", event_id_col, connection_status), 256)
