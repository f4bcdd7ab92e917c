#!/usr/bin/env python3
"""Assemble BENCH_SCALING_r14.json from the round-14 measurement runs:

  skew section   — /tmp/scaling_r14/bench_sfs{1,10,100}_c.json (the skew
                   suite with per-stage task stats and the control slice)
                   plus the ScaleUp hot-mass counts from the corpus logs;
  clamp section  — /tmp/clamp_r14/recall_f*.json (shortlist boundary,
                   RecallCurve) and cells_f*.json (cells boundary,
                   ClampProbe).

Gates (encoded here so the record carries its own verdict):
  * no scan-layout hazard on a scaled corpus (the =fail gate already
    enforced it at run time; re-checked from the JSONs);
  * worst per-stage max/median task ratio <= 4.0 for every cap-defended
    query at every factor (sessionize is exempted and reported — a
    10%-of-events bot user in a per-user window partition is the
    documented inherent hot spot, measured ~3.3x);
  * per-decade wall ratios <= 12 (the r13 sub-linear convention, control
    band included).
"""
import glob
import json
import re

OUT = "BENCH_SCALING_r14.json"
SKEW_DIR = "/tmp/scaling_r14"
CLAMP_DIR = "/tmp/clamp_r14"
EXEMPT_STAGE_SKEW = {"skew_sessionize"}
STAGE_SKEW_GATE = 4.0
DECADE_WALL_GATE = 12.0


def load(p):
    with open(p) as f:
        return json.load(f)


def scaleup_counts(factor):
    log = f"{SKEW_DIR}/scaleup_sfs{factor}.log"
    try:
        with open(log) as f:
            for line in f:
                if '"scaleup":"done"' in line:
                    return json.loads(line[line.index('{'):])
    except OSError:
        pass
    return None


def main():
    skew = {}
    benches = {}
    for factor in (1, 10, 100):
        b = load(f"{SKEW_DIR}/bench_sfs{factor}_c.json")
        benches[factor] = b
        skew[str(factor)] = {
            "control_ratio": b["control"].get("control_ratio"),
            "n_failed": b["n_failed"],
            "scan_hazards": b.get("scan_hazards", {}),
            "corpus": scaleup_counts(factor),
            "queries": {
                q: {
                    "wall_s": b["queries"][q],
                    **{k: b["tasks"].get(q, {}).get(k)
                       for k in ("n_tasks", "task_med", "task_max",
                                 "stage_skew")},
                } for q in sorted(b["queries"])
            },
        }

    violations = []
    for factor in (10, 100):
        hz = benches[factor].get("scan_hazards", {})
        if hz:
            violations.append(f"scan hazard at {factor}x: {sorted(hz)}")
    for factor in (1, 10, 100):
        for q, t in benches[factor].get("tasks", {}).items():
            s = t.get("stage_skew")
            if (s is not None and s > STAGE_SKEW_GATE
                    and q not in EXEMPT_STAGE_SKEW):
                violations.append(f"stage_skew {s} for {q} at {factor}x")
    decade = {}
    for q in benches[1]["queries"]:
        w1, w10, w100 = (benches[f]["queries"][q] for f in (1, 10, 100))
        decade[q] = {"r10_1": round(w10 / w1, 2),
                     "r100_10": round(w100 / w10, 2)}
        for tag, r in decade[q].items():
            if r > DECADE_WALL_GATE:
                violations.append(f"decade wall {tag}={r} for {q}")

    clamp = {"shortlist": [], "cells": []}
    for p in sorted(glob.glob(f"{CLAMP_DIR}/recall_f*.json"),
                    key=lambda s: int(re.search(r"_f(\d+)", s).group(1))):
        d = load(p)
        pts = [x for x in d["points"] if x["path"] == "projected"]
        clamp["shortlist"].append({
            "n_corpus": d["n_corpus"],
            "points": pts,
        })
    for p in sorted(glob.glob(f"{CLAMP_DIR}/cells_f*.json"),
                    key=lambda s: int(re.search(r"_f(\d+)", s).group(1))):
        clamp["cells"].append(load(p))

    record = {
        "metric": "scaling_r14",
        "skew": skew,
        "decade_wall_ratios": decade,
        "clamp": clamp,
        "gates": {
            "stage_skew_max": STAGE_SKEW_GATE,
            "decade_wall_max": DECADE_WALL_GATE,
            "exempt": sorted(EXEMPT_STAGE_SKEW),
        },
        "violations": violations,
        "green": not violations,
    }
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
    print(f"{OUT}: green={record['green']} violations={violations}")


if __name__ == "__main__":
    main()
