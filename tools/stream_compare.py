#!/usr/bin/env python3
"""Task: prove streaming drain isolation (round-11 verdict ask #3).

Compares the streaming families between two quiet bench records:
per-query end-to-end seconds (from `queries`) and the drain breakdown
(from `streaming`: compute_secs vs setup_secs). Flags any streaming
query whose end-to-end time differs >1.5x between the two runs, and
shows whether a difference lives in compute (code) or setup
(checkpoint/host latency).

Usage: python3 tools/stream_compare.py <bench_a.json> <bench_b.json>
"""
import json
import sys

STREAM_PREFIXES = ("q26", "q46", "q47", "q61", "q74", "q85", "q91",
                   "q93", "q100", "q129", "q141", "q170", "q194",
                   "q218", "q247")


def main(a_path, b_path):
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    bad = 0
    print(f"| query | {a_path.split('/')[-1]} s | {b_path.split('/')[-1]} s "
          "| ratio | verdict |")
    print("|---|---|---|---|---|")
    for q in sorted(a["queries"]):
        if not q.startswith(STREAM_PREFIXES):
            continue
        ta, tb = a["queries"].get(q), b["queries"].get(q)
        if not ta or not tb or ta < 0 or tb < 0:
            continue
        r = max(ta / tb, tb / ta)
        flag = "OK" if r <= 1.5 else "VARIES >1.5x"
        if r > 1.5:
            bad += 1
        print(f"| {q} | {ta:.2f} | {tb:.2f} | {r:.2f}x | {flag} |")
    sa, sb = a.get("streaming", {}), b.get("streaming", {})
    if sa and sb:
        print()
        print("| drain | compute A | compute B | setup A | setup B |")
        print("|---|---|---|---|---|")
        for q in sorted(sa):
            if q in sb and "compute_secs" in sa[q]:
                print(f"| {q} | {sa[q]['compute_secs']:.2f} "
                      f"| {sb[q]['compute_secs']:.2f} "
                      f"| {sa[q]['setup_secs']:.2f} "
                      f"| {sb[q]['setup_secs']:.2f} |")
    print()
    print(f"streaming queries varying >1.5x: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
