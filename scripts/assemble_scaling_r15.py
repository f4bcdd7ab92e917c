#!/usr/bin/env python3
"""Assemble BENCH_SCALING_r15.json from the round-15 measurement runs
(scripts/run_scaling_r15.sh -> /tmp/scaling_r15):

  skew section   — bench_sfs{1,10,100}_c.json: the skew suite with
                   per-stage task stats and the control slice. r15
                   changes vs r14: the sessionize entry is the BUCKETED
                   operator (bit-identical to q90 by SessionizeParitySpec
                   and the q182 oracle) and the stage-skew exemption list
                   is EMPTY — every entry gates.
  deep section   — bench_sfs1000_c.json: the THIRD decade (1000x of
                   sf0.1 on documents/embeddings, facts pass through)
                   for the three steepest families from r14's record
                   (ivf_join, near_dup, semantic).
  recall section — recall_curve_sf01.log: the trained-codebook IVF
                   operating points next to LSH/projected.

Gates (the record carries its own verdict):
  * no scan-layout hazard on any scaled corpus;
  * per-stage max/median task ratio <= 4.0 for EVERY query at EVERY
    factor (no exemptions), and <= 2.0 specifically for
    skew_sessionize_bucketed (the r15 done-bar for retiring the
    sessionize waiver);
  * per-decade wall ratios <= 12 (the r13 sub-linear convention),
    including the new 1000x/100x decade for the deep three.
"""
import glob
import json
import re

OUT = "BENCH_SCALING_r15.json"
SKEW_DIR = "/tmp/scaling_r15"
STAGE_SKEW_GATE = 4.0
SESSIONIZE_BUCKETED_GATE = 2.0
DECADE_WALL_GATE = 12.0
DEEP = ("skew_near_dup_capped", "skew_ivf_join_capped",
        "skew_semantic_capped")


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
    for factor in (1, 10, 100, 1000):
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
    for factor in (10, 100, 1000):
        hz = benches[factor].get("scan_hazards", {})
        if hz:
            violations.append(f"scan hazard at {factor}x: {sorted(hz)}")
    for factor in (1, 10, 100, 1000):
        if benches[factor]["n_failed"]:
            violations.append(f"{benches[factor]['n_failed']} failed "
                              f"queries at {factor}x")
        for q, t in benches[factor].get("tasks", {}).items():
            s = t.get("stage_skew")
            if s is None:
                continue
            gate = (SESSIONIZE_BUCKETED_GATE
                    if q == "skew_sessionize_bucketed" else STAGE_SKEW_GATE)
            if s > gate:
                violations.append(
                    f"stage_skew {s} > {gate} for {q} at {factor}x")
    decade = {}
    for q in benches[1]["queries"]:
        w1, w10, w100 = (benches[f]["queries"][q] for f in (1, 10, 100))
        decade[q] = {"r10_1": round(w10 / w1, 2),
                     "r100_10": round(w100 / w10, 2)}
        if q in DEEP and q in benches[1000]["queries"]:
            decade[q]["r1000_100"] = round(
                benches[1000]["queries"][q] / w100, 2)
        for tag, r in decade[q].items():
            if r > DECADE_WALL_GATE:
                violations.append(f"decade wall {tag}={r} for {q}")

    recall = None
    try:
        with open(f"{SKEW_DIR}/recall_curve_sf01.log") as f:
            for line in f:
                if '"metric":"recall_curve"' in line:
                    recall = json.loads(line[line.index('{'):])
    except OSError:
        pass

    record = {
        "metric": "scaling_r15",
        "skew": skew,
        "decade_wall_ratios": decade,
        "recall_curve": recall,
        "gates": {
            "stage_skew_max": STAGE_SKEW_GATE,
            "sessionize_bucketed_max": SESSIONIZE_BUCKETED_GATE,
            "decade_wall_max": DECADE_WALL_GATE,
            "exempt": [],
        },
        "violations": violations,
        "green": not violations,
    }
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
    print(f"{OUT}: green={record['green']} violations={violations}")


if __name__ == "__main__":
    main()
