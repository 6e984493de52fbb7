"""DuckDB oracle timing twin of bench.py — same best-of-N policy.

Runs every ``oracle_sql()`` entry on DuckDB over the same parquet tables
bench.py uses and prints ONE JSON line with per-query best-of-N seconds.
This keeps the Spark-vs-oracle ratio symmetric: bench.py reports best-of-N
per Spark query (steady-state, one-off JIT excluded), so the oracle side
must exclude its own first-run overhead (catalog binding, buffer warmup)
the same way.

Usage: python tools/bench_oracle.py [--sf-dir /root/testdata/sf0.1] [--attempts 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--attempts", type=int, default=int(os.environ.get("BENCH_ATTEMPTS", "3")))
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    # symmetric with bench.py: the streaming entries measure trigger/state
    # machinery Spark-side and stay out of its wall-clock suite, so their
    # batch oracles stay out of the denominator too
    oracles = {
        n: s for n, s in entry_mod.oracle_sql().items()
        if not n.startswith("streaming_")
    }

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        path = os.path.join(args.sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    timings: dict[str, float] = {}
    for name, sql in oracles.items():
        best = None
        for _ in range(max(1, args.attempts)):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "oracle_query_suite_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "attempts": max(1, args.attempts),
            }
        )
    )


if __name__ == "__main__":
    main()
