"""Sources & sinks: scan-document codec, raw readers, parquet table access."""

from wifi_location_data_pipeline_spark.sources.tables import load_table, load_tables  # noqa: F401
