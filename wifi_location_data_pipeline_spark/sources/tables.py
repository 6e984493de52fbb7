"""Parquet table access for the driver's synthetic corpus and engine tables.

The test corpus (TESTDATA.md) is one parquet file per table under
``/root/testdata/sf*/``. At production scale these would be partitioned
lakehouse tables; the loader keeps the interface identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table. Must work on ANY caller-supplied session (the
    correctness driver hands us a vanilla one), so nothing here may depend on
    builder-time confs. The corpus timestamps are TIMESTAMP(MICROS,
    isAdjustedToUTC=false) → TIMESTAMP_NTZ, readable everywhere; downstream
    SQL treats them timezone-free (see plans.dialect.epoch_s)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries.

    Idempotent per (session, sf_dir): every registry query calls this, and
    re-reading ten parquet footers per query adds a constant planning tax
    across the 50+ query suite."""
    registered = getattr(spark, "_graft_views_sf_dir", None)
    if registered == sf_dir:
        return
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    spark._graft_views_sf_dir = sf_dir
