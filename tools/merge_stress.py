#!/usr/bin/env python3
"""Merge per-scale BenchStress runs into the scaling-curve shape of
BENCH_STRESS.json.

Each input is one BenchStress output ({"metric":"stress_ratio",
"copies":N,...,"queries":{name:{base,stress,ratio}}}); the merged
output holds, per query, the 1x base plus an xN/ratioN pair per scale
point it appeared at, and stepAtoB between consecutive scale points
(ratioB/ratioA: 1.0 = flat, B/A = linear, > B/A = super-linear).

Usage: python3 tools/merge_stress.py OUT RUN1.json RUN2.json ...
"""
import json
import sys


def main(out_path, run_paths):
    runs = []
    for p in run_paths:
        with open(p) as f:
            d = json.load(f)
        runs.append((int(d["copies"]), d))
    runs.sort(key=lambda r: r[0])  # several files may share a scale
    scales = sorted({c for c, _ in runs})
    cpus = runs[0][1].get("cpus")
    base_sf = runs[0][1].get("base_sf")

    queries = {}
    for copies, d in runs:
        for name, row in d["queries"].items():
            q = queries.setdefault(name, {})
            # 1x base: the honest floor across runs (same workload)
            q["base"] = round(min(q.get("base", row["base"]), row["base"]), 3)
            q[f"x{copies}"] = round(row["stress"], 3)
    for name, q in queries.items():
        pts = [c for c in scales if f"x{c}" in q]
        for c in pts:
            q[f"ratio{c}"] = round(q[f"x{c}"] / q["base"], 3)
        for a, b in zip(pts, pts[1:]):
            q[f"step{a}to{b}"] = round(q[f"ratio{b}"] / q[f"ratio{a}"], 3)

    def largest_ratio(item):
        name, q = item
        c = max(c for c in scales if f"x{c}" in q)
        return q[f"ratio{c}"], c
    worst_name, worst_q = max(queries.items(), key=lambda i: largest_ratio(i)[0])
    wr, wc = largest_ratio((worst_name, worst_q))

    out = {
        "metric": "stress_scaling_curve",
        "cpus": cpus,
        "base_sf": base_sf,
        "note": ("ratioN = time(Nx corpus)/time(1x); stepAtoB = "
                 "ratioB/ratioA over B/A x more data (1.0 flat, B/A "
                 "linear, > B/A super-linear)"),
        "worst": {"query": worst_name, f"ratio{wc}": wr},
        "queries": dict(sorted(queries.items())),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"merged {len(run_paths)} runs ({scales}) -> {out_path}: "
          f"worst {worst_name} ratio{wc}={wr}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
