"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (WCL localization error vs planted truth)
on sf0.001. ``queries()`` — one callable per implemented operator from
SURVEY.md §2 (and the LLM-data-pipeline extensions). ``oracle_sql()`` — the
DuckDB-equivalent SQL for every SQL-expressible query; non-SQL ops
(iterative numerics) omit the oracle and get the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wifi_location_data_pipeline_spark.plans.queries import QUERIES, entry_query


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entry_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle() for name, q in QUERIES.items() if q.oracle() is not None}
