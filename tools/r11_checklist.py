"""Build the OPTIMIZATION_r11.md per-query checklist table from recorded
bench JSONs: baseline (round start), after (current), and the DuckDB oracle
twin at sf1. Offline — no Spark.

Usage: python tools/r11_checklist.py BASELINE.json AFTER.json ORACLE_SF1.json
"""

import json
import sys


def _load_bench(path: str) -> dict:
    """Accept either a bare JSON file or bench.py stdout (last JSON line)."""
    txt = open(path).read().strip()
    try:
        return json.loads(txt)
    except ValueError:
        out = None
        for line in txt.splitlines():
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                out = json.loads(line)
        if out is None:
            raise
        return out


def main() -> None:
    base, after, orc = (_load_bench(p) for p in sys.argv[1:4])
    b01, a01 = base["queries"], after["queries"]
    b1 = base.get("sf1", {}).get("queries", {})
    a1 = after.get("sf1", {}).get("queries", {})
    o1 = orc["queries"]
    names = sorted(set(b01) | set(a01), key=lambda q: -(a1.get(q) or 0))
    print(
        "| query | sf0.1 base | sf0.1 after | sf1 base | sf1 after |"
        " sf1 oracle | sf1 ratio |"
    )
    print("|---|---|---|---|---|---|---|")
    for q in names:
        oo = o1.get(q)
        aa = a1.get(q)
        ratio = f"{aa / oo:.2f}x" if (oo and aa) else "—"
        fmt = lambda v: f"{v:.2f}" if v is not None else "—"
        print(
            f"| {q} | {fmt(b01.get(q))} | {fmt(a01.get(q))} | {fmt(b1.get(q))} |"
            f" {fmt(aa)} | {fmt(oo)} | {ratio} |"
        )
    print()
    print(
        f"totals: sf0.1 {base['value']:.2f} -> {after['value']:.2f};"
        f" sf1 {base.get('sf1', {}).get('value')} ->"
        f" {after.get('sf1', {}).get('value')}; sf1 oracle {orc['value']}"
    )


if __name__ == "__main__":
    main()
