#!/usr/bin/env python3
"""Reference-side timing of the QC chain (BASELINE.md head-to-head #2).

Runs the reference's OWN pandas code (`/root/reference/ctd`) over the same
four multi-MB gz casts the round-3 reader comparison used:

    from_cnv -> despike(n1=2, n2=20, block=100) -> press_check()
             -> split()[down] -> bindata(delta=1.0)

per cast, single-process, warm (two passes, second reported). The chain
deliberately EXCLUDES lp_filter: the reference implements it via
scipy.signal.butter/filtfilt and scipy is not installed in this container
— shimming it with a pure-Python IIR loop would unfairly penalize the
reference, and replicating scipy in numpy would time our shim, not their
code. Every step below runs unmodified reference code (numpy ma rolling
stats, pandas groupby binning). The engine side (graft.BenchChain) reports
the same chain both without and with lpFilter for context.

Module shims (import-time only, no compute): pandas_flavor register_* as
pass-through decorators, chardet.detect -> utf-8 (the casts are ascii),
gsw (only reached for depth-indexed casts — these are pressure-indexed).
"""
import sys, time, types, json

# ---- shims (import-time dependencies only; none are hit with real work)
pf = types.ModuleType("pandas_flavor")
pf.register_dataframe_method = lambda f: f
pf.register_series_method = lambda f: f
sys.modules["pandas_flavor"] = pf

ch = types.ModuleType("chardet")
ch.detect = lambda contents: {"encoding": "utf-8"}
sys.modules["chardet"] = ch

gs = types.ModuleType("gsw")
def _unreached(*a, **k):
    raise RuntimeError("gsw shim reached — cast is depth-indexed?")
gs.p_from_z = _unreached
sys.modules["gsw"] = gs

sys.path.insert(0, "/root/reference")
# load read.py / processing.py directly — the package __init__ pulls in
# plotting (matplotlib), which is irrelevant to the chain under test
import importlib.util                        # noqa: E402


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ctd_read = _load("ctd_read", "/root/reference/ctd/read.py")
ctd_proc = _load("ctd_proc", "/root/reference/ctd/processing.py")

FILES = sorted(
    str(p) for p in __import__("pathlib").Path(
        "src/test/resources/ctd-data/CTD").glob("*.cnv.gz"))


def load():
    return [ctd_read.from_cnv(f) for f in FILES]


def chain(casts):
    out = []
    for c in casts:
        c1 = ctd_proc.despike(c, n1=2, n2=20, block=100)
        c2 = ctd_proc.press_check(c1)
        down, _up = ctd_proc.split(c2)   # bindata needs the monotone leg
        c3 = ctd_proc.bindata(down, delta=1.0)
        out.append(c3)
    return out


def staged_pass():
    """One full chain pass with INLINE per-stage accumulation — pandas is
    eager, so each stage's wall is directly measurable inside the pass
    (no prefix re-execution; the engine side needs cumulative prefixes
    because Spark pipelines stages lazily). Returns per-stage seconds."""
    t = {"parse_s": 0.0, "despike_s": 0.0, "press_split_s": 0.0,
         "bindata_s": 0.0}
    t0 = time.time()
    casts = load()
    t["parse_s"] = time.time() - t0
    for c in casts:
        t1 = time.time()
        c1 = ctd_proc.despike(c, n1=2, n2=20, block=100)
        t["despike_s"] += time.time() - t1
        t2 = time.time()
        c2 = ctd_proc.press_check(c1)
        down, _up = ctd_proc.split(c2)
        t["press_split_s"] += time.time() - t2
        t3 = time.time()
        ctd_proc.bindata(down, delta=1.0)
        t["bindata_s"] += time.time() - t3
    return t


def main():
    casts = load()
    rows = sum(len(c) for c in casts)
    chain(casts)                       # warm (allocator, caches)
    t0 = time.time()
    res = chain(casts)
    chain_s = time.time() - t0
    t1 = time.time()
    load()
    read_s = time.time() - t1          # warm re-read for context
    # per-stage ledger: 3 inline-staged passes, per-stage MIN across
    # passes — this VM's CPU-steal bursts only ADD time, so min is the
    # burst-robust estimator (a median of 3 loses to one 50%-stolen rep,
    # measured in the first r15 window: cum[2] > cum[3])
    passes = [staged_pass() for _ in range(3)]
    ledger = {k: round(min(p[k] for p in passes), 3) for k in passes[0]}
    ledger["sum_s"] = round(sum(ledger.values()), 3)
    print(json.dumps({
        "metric": "reference_qc_chain", "files": len(FILES), "rows": rows,
        "out_rows": sum(len(c) for c in res),
        "chain_s": round(chain_s, 3), "read_warm_s": round(read_s, 3),
        "ledger": ledger,
        "steps": "despike(2,20,100)+press_check+split.down+bindata(1.0)",
        "lp_filter": "excluded (scipy absent; see header)"}))


if __name__ == "__main__":
    main()
