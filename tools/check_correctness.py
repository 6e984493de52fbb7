"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables; compares row count, column names, and
order-insensitive values. Reports per-query PASS/FAIL with the first
divergence for debugging.

Usage: python tools/check_correctness.py [--sf-dir /root/testdata/sf0.01] [--only name[,name]]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize numerics, sort rows — order-insensitive form."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif df[c].dtype == object:
            # duckdb can hand back Decimals; normalize to float when numeric
            try:
                conv = pd.to_numeric(df[c])
                if pd.api.types.is_float_dtype(conv):
                    df[c] = conv.round(9)
                else:
                    df[c] = conv
            except (ValueError, TypeError):
                pass
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns: spark={scols} duck={dcols}")
        return problems
    if problems:
        return problems
    s, d = canon(spark_pdf), canon(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            sa = pd.to_numeric(sv, errors="coerce").astype("float64")
            da = pd.to_numeric(dv, errors="coerce").astype("float64")
            both_nan = sa.isna() & da.isna()
            close = ((sa - da).abs() <= 1e-6 + 1e-9 * da.abs()) | both_nan
            if not close.all():
                i = int((~close).idxmax())
                problems.append(
                    f"col {c}: {int((~close).sum())} diffs; first at row {i}: "
                    f"spark={sa[i]!r} duck={da[i]!r}"
                )
        else:
            eq = (sv == dv) | (sv.isna() & dv.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(
                    f"col {c}: {int((~eq).sum())} diffs; first at row {i}: "
                    f"spark={sv[i]!r} duck={dv[i]!r}"
                )
    return problems


def schema_sweep(sf_dir: str) -> int:
    """Analyze (don't execute) every registry query; flag DecimalType leaks.

    Spark parses bare numeric literals (``100.0``) as DECIMAL, so an
    unguarded literal in generated SQL silently turns a DOUBLE output column
    into decimal(p,s) — values identical, but the driver's hash (which
    includes the rendered type) fails. This sweep catches that class before
    the driver does.
    """
    import __spark_entry__ as entry_mod
    from pyspark.sql.types import DecimalType
    from wifi_location_data_pipeline_spark.session import build_session

    spark = build_session(
        app_name="schema-sweep",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    leaks = 0
    for name, fn in entry_mod.queries().items():
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as ex:  # noqa: BLE001
            print(f"ERR   {name}: {str(ex).splitlines()[0][:160]}")
            leaks += 1
            continue
        bad = [f.name for f in schema.fields if isinstance(f.dataType, DecimalType)]
        if bad:
            print(f"LEAK  {name}: DecimalType columns {bad}")
            leaks += 1
        else:
            print(f"OK    {name}")
    spark.stop()
    print(f"\n{leaks} queries with DecimalType leaks/errors")
    return 1 if leaks else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--schema-only", action="store_true")
    ap.add_argument(
        "--log-file",
        default=None,
        help="tee every per-query PASS/FAIL/ROWS line to this file, flushed "
        "per line, so a truncated stdout capture can never lose a failing "
        "query's name (defaults to /tmp/gate_<corpus>.log)",
    )
    args = ap.parse_args()

    if args.schema_only:
        return schema_sweep(args.sf_dir)

    import __spark_entry__ as entry_mod
    from wifi_location_data_pipeline_spark.session import build_session

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    spark = build_session(
        app_name="check-correctness",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
        extra_conf={
            # the gate collects COMPLETE results to compare; filter-class
            # queries on a >=256 MB-fact corpus return full-table-sized
            # frames that blow the 1g default (observed: event_dedup
            # 1035 MiB at the 220x corpus). Harness budget, not engine
            # behavior — the engine queries themselves never collect.
            "spark.driver.maxResultSize": os.environ.get(
                "SPARK_GRAFT_GATE_MAX_RESULT", "4g"
            ),
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_GATE_DRIVER_MEM", "16g"
            ),
        },
    )

    # loss-proof per-query record (r11 watch item: one 20x gate run printed
    # "113 pass / 1 fail" with the failing name lost to output truncation).
    # Every per-query verdict line is appended to the log file and flushed
    # BEFORE the summary, so the record survives any stdout capture window.
    log_path = args.log_file or os.path.join(
        "/tmp", f"gate_{os.path.basename(args.sf_dir.rstrip('/')) or 'corpus'}.log"
    )
    log_fh = open(log_path, "a")
    log_fh.write(f"# gate run start: sf_dir={args.sf_dir} t={time.time():.0f}\n")
    log_fh.flush()

    def emit(line: str) -> None:
        print(line)
        sys.stdout.flush()
        log_fh.write(line + "\n")
        log_fh.flush()

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            out = fn(spark, args.sf_dir)
            # the driver's hash includes the rendered TYPE: a DecimalType
            # column fails its compare even when every value matches the
            # DOUBLE oracle (the round-2 hash-fail class). canon() below
            # normalizes Decimals to float, so without this check the local
            # gate would green-light what the driver rejects.
            from pyspark.sql.types import (
                ArrayType,
                DecimalType,
                MapType,
                StructType,
            )

            def _has_decimal(dt):
                # recurse: a Decimal nested in array/map/struct (easy to
                # produce from an un-cast literal inside transform or
                # named_struct) fails the driver hash just the same
                if isinstance(dt, DecimalType):
                    return True
                if isinstance(dt, ArrayType):
                    return _has_decimal(dt.elementType)
                if isinstance(dt, MapType):
                    return _has_decimal(dt.keyType) or _has_decimal(dt.valueType)
                if isinstance(dt, StructType):
                    return any(_has_decimal(f.dataType) for f in dt.fields)
                return False

            dec = [
                f.name for f in out.schema.fields
                if _has_decimal(f.dataType)
            ]
            if dec and name in oracles:
                emit(f"FAIL  {name}: DecimalType output columns {dec}")
                n_fail += 1
                continue
            sdf = out.toPandas()
        except Exception as ex:  # noqa: BLE001
            emit(f"FAIL  {name}: spark error: {str(ex).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            emit(f"ROWS  {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            emit(f"FAIL  {name}: duckdb error: {str(ex).splitlines()[0][:200]}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            emit(f"FAIL  {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            for p in problems[:4]:
                emit(f"      {p}")
            n_fail += 1
        else:
            emit(f"PASS  {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            n_pass += 1

    emit(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    log_fh.close()
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
