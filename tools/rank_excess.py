"""Rank queries by excess seconds vs the DuckDB oracle.

Usage: python tools/rank_excess.py SPARK_JSON ORACLE_JSON [--min-excess 0.2]
where SPARK_JSON has {"queries": {...}} (bench.py line 1, or its "sf1" block
via --sf1) and ORACLE_JSON is tools/bench_oracle.py output.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("spark_json")
    ap.add_argument("oracle_json")
    ap.add_argument("--sf1", action="store_true", help="use the sf1 sub-block")
    ap.add_argument("--min-excess", type=float, default=0.15)
    args = ap.parse_args()

    with open(args.spark_json) as fh:
        sj = json.load(fh)
    spark_q = (sj.get("sf1") or {}).get("queries") if args.sf1 else sj.get("queries")
    with open(args.oracle_json) as fh:
        oj = json.load(fh)
    oracle_q = oj.get("queries", oj)

    rows = []
    no_oracle = []
    for name, s in spark_q.items():
        o = oracle_q.get(name)
        if o is None:
            no_oracle.append((s, name))
            continue
        rows.append((s - o, s / o if o > 0 else float("inf"), s, o, name))
    rows.sort(reverse=True)
    print(f"{'excess':>8} {'ratio':>7} {'spark':>7} {'oracle':>7}  query")
    for ex, r, s, o, name in rows:
        if ex < args.min_excess:
            break
        flag = " WEAK" if r > 2.0 and ex > 1.0 else ""
        print(f"{ex:8.3f} {r:7.2f} {s:7.3f} {o:7.3f}  {name}{flag}")
    tot_s = sum(r[2] for r in rows)
    tot_o = sum(r[3] for r in rows)
    print(f"\nmatched total: spark {tot_s:.1f}s vs oracle {tot_o:.1f}s = {tot_s / tot_o:.2f}x")
    no_oracle.sort(reverse=True)
    print("no-oracle entries:", ", ".join(f"{n} {s:.2f}s" for s, n in no_oracle[:12]))


if __name__ == "__main__":
    main()
