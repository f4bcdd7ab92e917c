#!/usr/bin/env python3
"""Assemble BENCH_SCALING_r13.json — the 100x DECADE check (VERDICT r12
task #3). Both historical derivation bugs (q163 IVF cells at 137x, q179
shortlist at 18% recall) were caught only by the 10x rerun — one decade.
This round adds a second decade: the six candidate-bounded queries (+ the
two other recall contracts) at sf0.1, the 10x ScaleUp corpus, and a NEW
100x ScaleUp corpus, plus the recall sweep at 100x against the pinned
floors from BENCH_SCALING_r12.

Reads /tmp/scaling_r13/{bench_sf01,bench_sfx10,bench_sfx100}.json and
recall_x100.log, attaches per-table row counts at each scale, and emits:
  ratio_10x   = x10_med / sf01_med        (first decade, expected ~rows)
  ratio_100x  = x100_med / sf01_med       (two decades, expected ~rows)
  decade2     = x100_med / x10_med        (the NEW information: a rule
                whose derived parameter breaks in decade two shows here)
Control-slice ratios from each run are carried so a box-speed swing
between the sequential runs is visible next to the walls.
"""
import json, os, sys
import duckdb

OUT = "/tmp/scaling_r13"
SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "x10": "/tmp/sfx10",
    "x100": "/tmp/sfx100",
}

# corpus table each query is bound by + how to read its curve
TABLES = {
    "q25_near_dup_pairs": ("documents",
        "tag-disjoint copies: ground-truth pairs and LSH candidates are "
        "exactly factor x the original's — a super-linear wall is the "
        "engine's"),
    "q79_semantic_pairs": ("embeddings",
        "IVF-bucketed cosine pairs; nCells DERIVES from corpus size"),
    "q80_semantic_dedup": ("embeddings",
        "SemDeDup keep-rule over q79's pair machinery"),
    "q163_ann_join": ("embeddings",
        "BOTH sides scale; candidates ~ sides x n / DERIVED cells — the "
        "r10 bug (fixed 16 cells -> 137x at 10x) is the regression this "
        "row exists to catch in decade two"),
    "q177_ann_recall_ivf": ("embeddings",
        "exact brute ground truth is O(queries x corpus) BY CONTRACT; "
        "linear per corpus row at fixed 200 queries"),
    "q178_ann_recall_lsh": ("embeddings", "as q177"),
    "q179_ann_recall_projected": ("embeddings",
        "brute ground truth + DERIVED shortlist clamp(ceil(n/40),50,4096) "
        "— the r11 bug (fixed 50 -> 18% recall at 10x) in decade two"),
}

# pinned operating-point floors (ppm) from BENCH_SCALING_r12
FLOORS = {"ivf": ("nProbe=4", 350000), "lsh": ("bands=8", 550000),
          "projected": ("n/40", 250000)}

# broader operator families measured at the same three scales
# (/tmp/scaling_r13_extra, benches bench_{sf01,x10,x100}[b].json) — not
# candidate-bounded, but the decade-2 column is cheap insurance against
# any hidden super-linearity
EXTRA_TABLES = {
    "q09_despike": ("events",
        "sequential per-cast kernel, linear per row"),
    "q112_pagerank": ("events",
        "iterative fixed-point; per step only the 16 B/node rank vector "
        "reshuffles"),
    "q146_temperature_sample": ("documents",
        "two group aggs + map-side hash gate; near-flat"),
    "q86b_bpe_segment": ("documents",
        "per-word explode + native kernel, linear in corpus bytes"),
    "q88_sessions": ("events", "one-exchange session labeling"),
    "q12_dedup_exact": ("documents",
        "digest-keyed groupBy; bodies never shuffle"),
    "q31_langid": ("documents", "map-side native kernel, zero shuffle"),
}


def rows(root, table):
    p = os.path.join(root, f"{table}.parquet")
    pat = p if os.path.isfile(p) else p + "/*.parquet"
    return duckdb.sql(f"select count(*) from '{pat}'").fetchall()[0][0]


def main():
    bench = {}
    for tag, f in [("sf0.1", "bench_sf01"), ("x10", "bench_sfx10"),
                   ("x100", "bench_sfx100")]:
        with open(os.path.join(OUT, f + ".json")) as fh:
            bench[tag] = json.load(fh)

    # the single-file-layout control runs (the r13 layout adjudication):
    # same binary, same corpus CONTENT, but ScaleUp's pre-fix one-file-
    # per-table output — scan parallelism 1, so every map-side phase
    # serializes. Kept in the JSON as the measured cost of a degenerate
    # file layout at scale.
    singlefile = {}
    for tag, f in [("x10", "bench_sfx10"), ("x100", "bench_sfx100")]:
        p = os.path.join(OUT + "_singlefile", f + ".json")
        if os.path.exists(p):
            with open(p) as fh:
                singlefile[tag] = json.load(fh)

    entries = {}
    for q, (table, attribution) in TABLES.items():
        med = {t: bench[t]["queries"].get(q) for t in SCALES}
        nrows = {t: rows(d, table) for t, d in SCALES.items()}
        e = {
            "table": table,
            "rows": nrows,
            "med_s": med,
            "rows_ratio_10x": round(nrows["x10"] / nrows["sf0.1"], 2),
            "rows_ratio_100x": round(nrows["x100"] / nrows["sf0.1"], 2),
            "attribution": attribution,
        }
        if all(v is not None for v in med.values()):
            e["ratio_10x"] = round(med["x10"] / med["sf0.1"], 2)
            e["ratio_100x"] = round(med["x100"] / med["sf0.1"], 2)
            e["decade2"] = round(med["x100"] / med["x10"], 2)
        for tag, b in singlefile.items():
            v = b["queries"].get(q)
            if v is not None:
                e[f"med_s_{tag}_singlefile_layout"] = v
        entries[q] = e

    # extra operator families, if their targeted runs exist
    extra_entries = {}
    extra_controls = {}
    xdir = OUT + "_extra"
    if os.path.isdir(xdir):
        xb = {}
        for tag, names in [("sf0.1", ("bench_sf01", "bench_sf01b")),
                           ("x10", ("bench_x10", "bench_x10b")),
                           ("x100", ("bench_x100", "bench_x100b"))]:
            xb[tag] = {"queries": {}, "control": {}}
            for n in names:
                p = os.path.join(xdir, n + ".json")
                if os.path.exists(p):
                    with open(p) as fh:
                        j = json.load(fh)
                    xb[tag]["queries"].update(j["queries"])
                    xb[tag].setdefault("controls", []).append(
                        j.get("control", {}).get("control_ratio"))
        extra_controls = {t: xb[t].get("controls") for t in xb}
        for q, (table, attribution) in EXTRA_TABLES.items():
            med = {t: xb[t]["queries"].get(q) for t in SCALES}
            if any(v is None for v in med.values()):
                continue
            nrows = {t: rows(d, table) for t, d in SCALES.items()}
            extra_entries[q] = {
                "table": table, "rows": nrows, "med_s": med,
                "ratio_10x": round(med["x10"] / med["sf0.1"], 2),
                "ratio_100x": round(med["x100"] / med["sf0.1"], 2),
                "decade2": round(med["x100"] / med["x10"], 2),
                "attribution": attribution,
            }

    controls = {t: bench[t].get("control", {}).get("control_ratio")
                for t in SCALES}

    recall_points = []
    floors_hold = True
    floor_detail = {}
    rc_path = os.path.join(OUT, "recall_x100.log")
    with open(rc_path) as fh:
        line = next(l for l in fh if '"metric":"recall_curve"' in l)
    rc = json.loads(line)
    recall_points = rc.get("points", [])
    for p in recall_points:
        key = FLOORS.get(p["path"])
        # param match is substring: the curve labels the projected point
        # "shortlist=n/40(4096)" while the floor key is "n/40"
        if key and key[0] in p["param"]:
            ok = p["recall_ppm"] >= key[1]
            floor_detail[f'{p["path"]}({p["param"]})'] = {
                "recall_ppm": p["recall_ppm"], "floor_ppm": key[1],
                "holds": ok}
            floors_hold = floors_hold and ok

    doc = {
        "metric": "scaling_r13",
        "round": 13,
        "scales": {t: {"dir": d} for t, d in SCALES.items()},
        "control_ratio_per_run": controls,
        "queries": entries,
        "extra_families": extra_entries,
        "extra_control_ratio_per_run": extra_controls,
        "recall_curve_x100": {
            "n_corpus": rc.get("n_corpus"),
            "n_queries": rc.get("n_queries"),
            "points": recall_points,
        },
        "pinned_floors_ppm": {f"{p}({v[0]})": v[1]
                              for p, v in FLOORS.items()},
        "pinned_points_hold_at_100x": floors_hold,
        "floor_detail_x100": floor_detail,
        "notes": ("Second DECADE check: decade2 (x100/x10) is the new "
                  "information — a candidate-derivation rule that only "
                  "looks linear inside one decade breaks there. ScaleUp "
                  "tagging keeps ground truth exactly linear, so "
                  "super-linearity is attributable to the engine. "
                  "Controls (spark.range workloads) rode every run; "
                  "walls are comparable across the three sequential "
                  "runs when the per-run control_ratio values agree."),
    }
    out = "/root/repo/BENCH_SCALING_r13.json"
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"wrote {out}")
    print(json.dumps({q: {k: e[k] for k in
                          ("ratio_10x", "ratio_100x", "decade2")
                          if k in e}
                      for q, e in entries.items()}, indent=1))
    print("floors hold at 100x:", floors_hold, floor_detail)


if __name__ == "__main__":
    main()
