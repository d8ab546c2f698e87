#!/usr/bin/env python3
"""Generate the weak-tier report from committed artifacts — the roster
in BASELINE.md is derived by THIS script, not hand-maintained (it
drifted once in round 14: builder 0.92x over 38 vs judge 0.90x over 37
on the composite classing of corpus_pipeline_v2, adopted here).

Usage: python3 tools/weak_report.py BENCH_DETAIL_r{N}.json \
           [BASELINE_sf0.1.json]

Criteria (BASELINE.md "The weak criteria"):
  wall_weak : non-naive, non-composite, oracle >= 0.3 s,
              graft wall > 2x oracle wall
  cpu_weak  : non-composite, graft CPU-s > max(3 * implied_cpu, 12)
              where implied_cpu = oracle wall * 32 threads
  honest cut: sum(graft wall) / sum(oracle wall) over the non-naive,
              non-composite, oracle >= 0.3 s set
Prints a markdown report + one machine-readable JSON tail line.
"""
import sys, json

# Intentionally-naive oracle mirrors (brute-force certification shapes;
# the oracle is not a fair speed baseline for these).
NAIVE = {
    "geo_area_clip", "geo_area_ratio", "geo_buffer_count",
    "geo_buffer_line", "geo_intersect_oa", "geo_line_clip",
    "geo_nearest_grid", "geo_nearest_line", "geo_nearest_line_wkt",
    "geo_overlay", "geo_pipeline_long", "geo_pipeline_wide",
    "geo_pipeline_wkt", "geo_pivot", "geo_poly_tag",
    "geo_poly_tag_holed", "geo_raster_zonal", "geo_rasterize",
    "geo_relative_elevation", "geo_wkt_holes",
}

# Composite-by-construction oracles: the oracle re-derives every
# audited sub-pipeline / exact all-pairs / unrolled loop, so both
# engines pay the family sum — exempt from both weak cuts.
COMPOSITE = {
    "ann_recall", "corpus_semantic_dedup", "dedup_cluster",
    "corpus_near_dedup", "dedup_minhash", "dedup_minhash_est",
    "dedup_ngram", "pack_sequences", "text_bpe_train",
    "text_bpe_encode", "text_bpe_bytes",
    "corpus_pipeline_v2", "corpus_pipeline_v3", "corpus_pipeline_v4",
    # the oracle is the IDENTICAL unrolled peel loop (12 rounds both
    # engines; VERDICT r14 certified CPU parity with the oracle's own
    # unroll) — wall is the same synchronous rounds on both sides
    "graph_kcore",
}

THREADS = 32
CPU_FLOOR = 12.0
STEAL_CANARY = ("geo_idw", 7.4)  # stable calm-host CPU-s reference


def main():
    detail = json.load(open(sys.argv[1]))
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_sf0.1.json"
    base = json.load(open(base_path))["queries"]
    wall = detail["queries"]
    cpu = detail["queries_cpu"]

    canary = cpu.get(STEAL_CANARY[0])
    print(f"# Weak-tier report — {sys.argv[1]} vs {base_path}\n")
    if canary is not None:
        flag = "CALM" if canary <= STEAL_CANARY[1] * 1.35 else \
            "BURSTY — CPU numbers are inflated, re-snapshot before acting"
        print(f"Steal canary {STEAL_CANARY[0]}: {canary:.1f} CPU-s "
              f"(stable calm ref {STEAL_CANARY[1]}) -> {flag}\n")

    honest = [q for q in wall
              if q in base and base[q] >= 0.3
              and q not in NAIVE and q not in COMPOSITE]
    hs_g = sum(wall[q] for q in honest)
    hs_o = sum(base[q] for q in honest)
    ratio = hs_g / hs_o if hs_o else float("nan")
    print(f"Honest same-scale cut (non-naive, non-composite, oracle "
          f">= 0.3 s): **{ratio:.2f}x** ({hs_g:.1f} s graft vs "
          f"{hs_o:.1f} s DuckDB over {len(honest)} queries)\n")

    wall_weak = sorted(
        ((q, wall[q] / base[q]) for q in honest if wall[q] > 2 * base[q]),
        key=lambda t: -t[1])
    print(f"## wall_weak ({len(wall_weak)})\n")
    print("| query | graft wall s | oracle s | ratio |")
    print("| --- | --- | --- | --- |")
    for q, r in wall_weak:
        print(f"| `{q}` | {wall[q]:.2f} | {base[q]:.3f} | {r:.1f}x |")

    cpu_weak = []
    for q, c in cpu.items():
        if q in COMPOSITE or q not in base or base[q] < 0:
            continue
        bar = max(3 * base[q] * THREADS, CPU_FLOOR)
        if c > bar:
            cpu_weak.append((q, c, bar))
    cpu_weak.sort(key=lambda t: -(t[1] - t[2]))
    print(f"\n## cpu_weak ({len(cpu_weak)})\n")
    print("| query | graft CPU-s | bar (max(3*implied, 12)) |")
    print("| --- | --- | --- |")
    for q, c, bar in cpu_weak:
        print(f"| `{q}` | {c:.1f} | {bar:.1f} |")

    print()
    print(json.dumps({
        "honest_ratio": round(ratio, 3), "honest_n": len(honest),
        "wall_weak": [q for q, _ in wall_weak],
        "cpu_weak": [q for q, _, _ in cpu_weak],
        "canary_cpu": canary}))


if __name__ == "__main__":
    main()
