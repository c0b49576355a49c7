#!/usr/bin/env python3
"""Merge per-copies BenchStress outputs (stress_ratio format) into the
committed BENCH_STRESS.json scaling-curve format. Base per query = min
across runs (steady-state floor, same policy as Bench's min-of-reps).

Scale points are derived from whatever xN keys are present (not a
hardcoded 10/30/100): steps are computed over each query's consecutive
observed scales, and the worst-query summary uses each query's LARGEST
available ratio — so an x100-only query still participates.

Usage: merge_stress.py BENCH_STRESS.json run1.json run2.json ..."""
import json, sys

curve_path = sys.argv[1]
curve = json.load(open(curve_path))
runs = [json.load(open(p)) for p in sys.argv[2:]]

for run in runs:
    copies = run["copies"]
    for q, row in run["queries"].items():
        ent = curve["queries"].setdefault(q, {})
        ent["base"] = round(min(ent.get("base", 1e18), row["base"]), 3)
        ent[f"x{copies}"] = row["stress"]

for q, ent in curve["queries"].items():
    b = ent["base"]
    scales = sorted(int(k[1:]) for k in ent if k.startswith("x") and k[1:].isdigit())
    # drop stale step/ratio keys so removed scale points can't linger
    for k in list(ent):
        if k.startswith("ratio") or k.startswith("step"):
            del ent[k]
    for n in scales:
        ent[f"ratio{n}"] = round(ent[f"x{n}"] / b, 3)
    for lo, hi in zip(scales, scales[1:]):
        ent[f"step{lo}to{hi}"] = round(ent[f"ratio{hi}"] / ent[f"ratio{lo}"], 3)

def worst_ratio(ent):
    scales = [int(k[5:]) for k in ent if k.startswith("ratio")]
    if not scales:
        return (0, 0.0)
    top = max(scales)
    return (top, ent[f"ratio{top}"])

worst_q, (worst_scale, worst_r) = max(
    ((q, worst_ratio(ent)) for q, ent in curve["queries"].items()),
    key=lambda kv: kv[1][1])
curve["worst"] = {"query": worst_q, "scale": worst_scale,
                  f"ratio{worst_scale}": worst_r}
json.dump(curve, open(curve_path, "w"), indent=None, separators=(",", ":"))
open(curve_path, "a").write("\n")
print("merged", [r["copies"] for r in runs], "->", curve_path)
