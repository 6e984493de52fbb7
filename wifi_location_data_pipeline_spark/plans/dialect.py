"""Two-dialect SQL emission helpers.

Every registry query is written once as a dialect-parameterized template so
the Spark plan and the DuckDB oracle execute the *same* semantics. The
helpers below cover the few spots where the dialects' function surfaces
diverge; everything else is shared ANSI SQL.

Cross-dialect gotchas encoded here (verified against pyspark 4.1 / duckdb 1.x):
- DuckDB (this build) lacks ``regexp_like`` → ``regexp_matches``.
- DuckDB ``SUM(int)`` → HUGEINT, ``floor`` → DOUBLE → explicit casts.
- exact interpolated median: Spark ``percentile``, DuckDB ``quantile_cont``.
- epoch seconds: Spark ``unix_timestamp``, DuckDB ``epoch``.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"


def regexp_like(d: str, col: str, pattern: str) -> str:
    fn = "regexp_like" if d == SPARK else "regexp_matches"
    return f"{fn}({col}, '{pattern}')"


def median(d: str, col: str) -> str:
    if d == SPARK:
        return f"percentile({col}, 0.5)"
    return f"quantile_cont(CAST({col} AS DOUBLE), 0.5)"


def percentile(d: str, col: str, p: float) -> str:
    if d == SPARK:
        return f"percentile({col}, {p})"
    return f"quantile_cont(CAST({col} AS DOUBLE), {p})"


def epoch_s(d: str, col: str) -> str:
    if d == SPARK:
        return f"unix_timestamp({col})"
    return f"CAST(epoch({col}) AS BIGINT)"


def fmt_ts(d: str, col: str, spark_fmt: str = "yyyy-MM-dd HH:mm:ss", duck_fmt: str = "%Y-%m-%d %H:%M:%S") -> str:
    if d == SPARK:
        return f"date_format({col}, '{spark_fmt}')"
    return f"strftime({col}, '{duck_fmt}')"


def hex_to_bigint(d: str, hex_expr: str) -> str:
    """Hex string (≤15 chars, to stay in int64) → BIGINT, portable."""
    if d == SPARK:
        return f"CAST(conv({hex_expr}, 16, 10) AS BIGINT)"
    return f"CAST(concat('0x', {hex_expr}) AS BIGINT)"


def int_floor_div(d: str, a: str, b: int) -> str:
    """Integer floor-division for non-negative operands, portable."""
    return f"CAST(FLOOR({a} / {b}.0) AS BIGINT)"


def ts_expr(d: str, col: str) -> str:
    """Timestamp column from the synthetic corpus.

    The corpus parquet stores TIMESTAMP(NANOS); Spark reads it as BIGINT nanos
    (spark.sql.legacy.parquet.nanosAsLong) while DuckDB reads a real
    timestamp. Truncation to microseconds is exact for the corpus (values are
    microsecond-aligned).
    """
    if d == SPARK:
        return f"timestamp_micros(CAST({col} / 1000 AS BIGINT))"
    return col
