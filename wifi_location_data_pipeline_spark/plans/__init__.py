"""Demonstration query registry bound to the driver's synthetic tables."""

from wifi_location_data_pipeline_spark.plans.queries import QUERIES, entry_query  # noqa: F401
