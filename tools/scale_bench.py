#!/usr/bin/env python3
"""Merge the 10x scale-bench runs into the committed ratio table —
the artifact that MEASURES the fixed-cost-floor amortization argument
for the wall-weak tier (graft wall ratios vs the DuckDB oracle should
FALL from sf0.1 to 10x if the sf0.1 gap is floor, and rise/hold if it
is plan fat).

Usage: python3 tools/scale_bench.py <graft10x.json> <oracle10x.json> \
           <BENCH_DETAIL_sf01.json> <BASELINE_sf01.json>
Prints the markdown table + one JSON tail line.
"""
import sys, json


def main():
    g10 = json.load(open(sys.argv[1]))
    o10 = json.load(open(sys.argv[2]))["queries"]
    g01 = json.load(open(sys.argv[3]))
    o01 = json.load(open(sys.argv[4]))["queries"]
    w10, c10 = g10["queries"], g10.get("queries_cpu", {})
    w01, c01 = g01["queries"], g01.get("queries_cpu", {})

    rows, falling, rising = [], [], []
    for q in sorted(w10):
        if q not in o10 or o10[q] < 0 or q not in w01 or q not in o01:
            continue
        r01 = w01[q] / o01[q]
        r10 = w10[q] / o10[q]
        rows.append((q, w01[q], o01[q], r01, w10[q], o10[q], r10,
                     c10.get(q), c01.get(q)))
        (falling if r10 < r01 else rising).append(q)

    print("| query | sf0.1 graft s | sf0.1 oracle s | sf0.1 ratio | "
          "10x graft s | 10x oracle s | 10x ratio | 10x CPU-s |")
    print("| --- | --- | --- | --- | --- | --- | --- | --- |")
    for q, gw, ow, r1, gw10, ow10, r10, cpu10, _ in rows:
        arrow = "falls" if r10 < r1 else "RISES"
        print(f"| `{q}` | {gw:.2f} | {ow:.3f} | {r1:.1f}x | "
              f"{gw10:.2f} | {ow10:.2f} | {r10:.1f}x ({arrow}) | "
              f"{'' if cpu10 is None else f'{cpu10:.1f}'} |")

    print()
    print(json.dumps({
        "n": len(rows), "falling": falling, "rising": rising,
        "median_ratio_sf01": round(sorted(r[3] for r in rows)[len(rows)//2], 2) if rows else None,
        "median_ratio_10x": round(sorted(r[6] for r in rows)[len(rows)//2], 2) if rows else None}))


if __name__ == "__main__":
    main()
