#!/usr/bin/env python3
"""Merge per-copies BenchStress outputs (stress_ratio format) into the
committed BENCH_STRESS.json scaling-curve format. Base per query = min
across runs (steady-state floor, same policy as Bench's min-of-reps).

Scale points are derived from whatever xN keys are present (not a
hardcoded 10/30/100): steps are computed over each query's consecutive
observed scales.

The worst-scaler summary compares PER SCALE: ratios at different scales
are not comparable (an x30-only family can never out-ratio an x100
curve), so "worst" holds, for every scale present in any query, the
query with the largest ratio AT that scale. The single headline
"worst_normalized" uses the scaling exponent log(ratio)/log(scale) —
1.0 = linear, <1 sub-linear — which IS comparable across scales.

Usage: merge_stress.py BENCH_STRESS.json run1.json run2.json ...
       merge_stress.py --resummarize BENCH_STRESS.json
         (recompute ratios/steps/worst from the curve file alone)"""
import json, math, sys

args = sys.argv[1:]
resummarize = args and args[0] == "--resummarize"
if resummarize:
    args = args[1:]
curve_path = args[0]
curve = json.load(open(curve_path))
runs = [json.load(open(p)) for p in args[1:]]

for run in runs:
    copies = run["copies"]
    for q, row in run["queries"].items():
        ent = curve["queries"].setdefault(q, {})
        ent["base"] = round(min(ent.get("base", 1e18), row["base"]), 3)
        ent[f"x{copies}"] = row["stress"]
        if "drains" in row:  # streaming rows: per-rep component traces
            ent[f"drains{copies}"] = row["drains"]

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

# per-scale worst: only queries measured at THAT scale compete
all_scales = sorted({int(k[5:]) for ent in curve["queries"].values()
                     for k in ent if k.startswith("ratio")})
worst = {}
for n in all_scales:
    contenders = [(q, ent[f"ratio{n}"]) for q, ent in curve["queries"].items()
                  if f"ratio{n}" in ent]
    q, r = max(contenders, key=lambda kv: kv[1])
    worst[f"x{n}"] = {"query": q, "ratio": r, "n_queries": len(contenders)}
curve["worst"] = worst

# cross-scale headline: scaling exponent log(ratio)/log(scale) at each
# query's largest scale (1.0 = linear in data volume)
def exponent(ent):
    # scale 1 carries no slope information and log(1)=0 would divide by
    # zero (a merged run whose only point is copies=1), so only scales
    # above the baseline compete
    scales = [int(k[5:]) for k in ent
              if k.startswith("ratio") and int(k[5:]) > 1]
    if not scales:
        return (0, 0.0, 0.0)
    top = max(scales)
    r = max(ent[f"ratio{top}"], 1e-9)
    return (top, r, math.log(r) / math.log(top))

wq, (wscale, wr, wexp) = max(
    ((q, exponent(ent)) for q, ent in curve["queries"].items()),
    key=lambda kv: kv[1][2])
curve["worst_normalized"] = {
    "query": wq, "scale": wscale, "ratio": wr, "exponent": round(wexp, 3),
    "note": "exponent=log(ratio)/log(scale); 1.0 = linear"}

json.dump(curve, open(curve_path, "w"), indent=None, separators=(",", ":"))
open(curve_path, "a").write("\n")
if resummarize:
    print("resummarized ->", curve_path)
else:
    print("merged", [r["copies"] for r in runs], "->", curve_path)
