"""wifi_location_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference crowdsourced WiFi access-point localization
pipeline (rezhaque35/wifi-location-data-pipeline):

- ``sources``     — codecs + readers (base64+gzip NDJSON scan documents, parquet tables)
- ``operators``   — ETL transform (validate → explode → union → derive), dedup,
                    per-AP aggregation, global outlier detection, hotspot detection,
                    maturity-tiered batch localization, table DML emulation
- ``positioning`` — the online positioning ensemble (proximity, weighted centroid,
                    RSSI-ratio, log-distance, trilateration, MLE, GDOP, selection
                    framework, robust combiner) as DataFrame ops + applyInPandas
- ``functions``   — shared column expressions (geo math, quality scoring, identifiers)
- ``datapipe``    — large-scale training-data operators beyond the reference surface
                    (dedup families, similarity search, text analysis, multimodal)
- ``streaming``   — Structured Streaming variants of the ingest/transform path
- ``plans``       — demonstration query registry bound to the synthetic test tables

Everything is built on the public PySpark DataFrame/SQL API; the reference's
five-microservice topology collapses into declarative Spark jobs (SURVEY.md §0).
"""

__version__ = "0.1.0"
