#!/usr/bin/env python3
"""Merge N full BENCH_DETAIL.json runs into one snapshot: per-query min
wall / min CPU over every sample of every run, samples concatenated,
iters summed — the two-calm-run merge protocol BENCH_DETAIL_r16 uses.

Usage: merge_bench.py out.json run1.json run2.json [...]
"""
import json
import sys


def main() -> None:
    out, paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in paths]
    base = runs[0]
    names = set()
    for r in runs:
        names.update(r["queries"].keys())
    queries, queries_cpu, samples = {}, {}, {}
    for q in sorted(names):
        walls = [r["queries"][q] for r in runs
                 if r["queries"].get(q, -1) >= 0]
        cpus = [r["queries_cpu"][q] for r in runs
                if r["queries_cpu"].get(q, -1) >= 0]
        queries[q] = min(walls) if walls else -1.0
        queries_cpu[q] = min(cpus) if cpus else -1.0
        samples[q] = {
            "wall": sum((r.get("samples", {}).get(q, {}).get("wall", [])
                         for r in runs), []),
            "cpu": sum((r.get("samples", {}).get(q, {}).get("cpu", [])
                        for r in runs), []),
        }
    merged = {
        "metric": base["metric"],
        "value": round(sum(v for v in queries.values() if v >= 0), 3),
        "unit": base["unit"],
        "total_cpu": round(sum(v for v in queries_cpu.values() if v >= 0), 2),
        "iters": sum(r.get("iters", 0) for r in runs),
        "elapsed": round(sum(r.get("elapsed", 0.0) for r in runs), 3),
        "queries": queries,
        "queries_cpu": queries_cpu,
        "samples": samples,
        "sf": base["sf"],
        "merged_runs": len(runs),
    }
    json.dump(merged, open(out, "w"))
    print(f"{out}: {len(names)} queries, wall-min total {merged['value']}, "
          f"cpu-min total {merged['total_cpu']}, iters {merged['iters']}")


if __name__ == "__main__":
    main()
