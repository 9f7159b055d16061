#!/usr/bin/env python3
"""Build the PERF.md whole-suite sf1 table: per-query engine seconds at
sf1 (10x the bench SF) vs the sf0.1 quiet record, plus the DuckDB
oracle verdict+runtime at sf1.

Usage: python3 tools/sf1_table.py <sf01_bench.json> <sf1_bench.json> \
          <sf1_oracle_ledger.json> [out.md]
"""
import json
import sys


def main(b01_path, b1_path, ledger_path, out_path=None):
    b01 = json.load(open(b01_path))["queries"]
    b1 = json.load(open(b1_path))["queries"]
    led = json.load(open(ledger_path))
    names = sorted(set(b1) | set(led))
    lines = [
        "| query | sf0.1 s | sf1 s | ratio | oracle @ sf1 | oracle s |",
        "|---|---|---|---|---|---|",
    ]
    flagged = []
    for n in names:
        t0, t1 = b01.get(n), b1.get(n)
        lg = led.get(n, {})
        status = lg.get("status", "-")
        osec = lg.get("oracle_secs", "-")
        if t0 and t1 and t0 > 0 and t1 > 0:
            ratio = t1 / t0
            rs = f"{ratio:.1f}x"
            if ratio > 10 and t1 > 2.0:
                flagged.append((n, t0, t1, ratio))
        else:
            rs = "-"
        fmt = lambda v: f"{v:.2f}" if isinstance(v, (int, float)) else "-"
        lines.append(f"| {n} | {fmt(t0)} | {fmt(t1)} | {rs} | {status} | {osec} |")
    n_pass = sum(1 for v in led.values() if v.get("status") == "pass")
    lines.append("")
    lines.append(f"pass: {n_pass}/{len(led)}; "
                 f"engine total sf1: {sum(v for v in b1.values() if v and v > 0):.1f}s; "
                 f"queries >10x and >2s: {len(flagged)}")
    for n, t0, t1, r in sorted(flagged, key=lambda x: -x[3]):
        lines.append(f"  - {n}: {t0:.2f}s -> {t1:.2f}s ({r:.1f}x)")
    text = "\n".join(lines)
    if out_path:
        open(out_path, "w").write(text + "\n")
    print(text)


if __name__ == "__main__":
    main(*sys.argv[1:])
