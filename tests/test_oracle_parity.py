"""Oracle-parity net for registry entries parked beyond the external
correctness gate's 50-entry window.

The gate value-checks only the first 50 ``queries()`` entries, so the
oracle-bearing queries in ``plans.queries._TAIL`` would otherwise lose their
value-level verification. This test runs each of them on Spark AND its DuckDB
oracle at sf0.001 and compares row count, columns, and values — the same
comparison ``tools/check_correctness.py`` implements.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.check_correctness import TABLES, compare  # noqa: E402

from wifi_location_data_pipeline_spark.plans.queries import _TAIL, QUERIES  # noqa: E402

TAIL_WITH_ORACLE = [n for n in _TAIL if QUERIES[n].sql is not None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_registry_window_invariant():
    """Every entry inside the gate's 50-entry window must carry an oracle."""
    names = list(QUERIES)
    head = names[:50]
    assert all(QUERIES[n].sql is not None for n in head)
    assert set(_TAIL) == set(names[len(names) - len(_TAIL):])


@pytest.mark.parametrize("name", TAIL_WITH_ORACLE)
def test_tail_query_matches_oracle(name, spark, sf_dir, duck):
    from pyspark.sql.types import DecimalType

    q = QUERIES[name]
    out = q.spark(spark, sf_dir)
    # the external driver's hash includes the rendered type: DecimalType
    # output fails it even when values match the DOUBLE oracle
    dec = [f.name for f in out.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not dec, f"{name}: DecimalType output columns {dec}"
    spark_pdf = out.toPandas()
    duck_pdf = duck.execute(q.oracle()).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"
