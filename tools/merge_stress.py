#!/usr/bin/env python3
"""Merge per-copies BenchStress outputs (stress_ratio format) into the
committed BENCH_STRESS.json scaling-curve format. Base per query = min
across runs (steady-state floor, same policy as Bench's min-of-reps).
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
    for k in list(ent):
        if k.startswith("x") and k[1:].isdigit():
            ent[f"ratio{k[1:]}"] = round(ent[k] / b, 3)
    if "ratio10" in ent and "ratio30" in ent:
        ent["step10to30"] = round(ent["ratio30"] / ent["ratio10"], 3)
    if "ratio30" in ent and "ratio100" in ent:
        ent["step30to100"] = round(ent["ratio100"] / ent["ratio30"], 3)

worst = max(curve["queries"].items(), key=lambda kv: kv[1].get("ratio30", 0))
curve["worst"] = {"query": worst[0], "ratio30": worst[1].get("ratio30", 0)}
json.dump(curve, open(curve_path, "w"), indent=None, separators=(",", ":"))
open(curve_path, "a").write("\n")
print("merged", [r["copies"] for r in runs], "->", curve_path)
