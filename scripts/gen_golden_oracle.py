#!/usr/bin/env python3
"""Generate REFERENCE-EXECUTED golden oracle parquet for the 8 queries whose
file formats DuckDB cannot parse (q16-q20, q37, q38) — closing VERDICT r11
task #2 ("hash-anchor the 8 golden rows").

Every VALUE in these parquet files is produced by the unmodified reference
implementation (/root/reference/ctd) running over its own test fixtures
(the copies in src/test/resources/ctd-data). This script only:
  * shims import-time-only modules the container lacks (matplotlib,
    pandas_flavor, chardet, gsw — none is reached with real work on these
    pressure-indexed fixtures),
  * reshapes reference output into the engine's column layout (cast_id /
    scan_order columns, long-form stats), and
  * replays the engine's two DOCUMENTED divergences, which are data-prep,
    not values: `# bad_flag` sentinels -> null (the reference keeps the
    -9.99e-29 float; see Parsers.scala:90) and pandas-index -> explicit
    pressure column.

The q37 composite additionally recomputes the reference ops chain
(remove_above_water -> split.down -> bindata(average)) with the REFERENCE'S
OWN functions, plus the cumulative station distance with the same haversine
formula Extras.haversineM documents (R=6371000).

SparkEntry.oracleSql points DuckDB at these files via read_parquet(), so
the driver hash-compares the engine against reference-generated values
exactly like every SQL-expressible query. Rounding happens in the oracle
SQL (DuckDB round == Spark round, proven by the existing green oracles).

Run from the repo root:  python3 scripts/gen_golden_oracle.py
"""
import re
import sys
import types
import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

OUT = "golden_oracle"
DATA = "src/test/resources/ctd-data"

# ---- import-time shims (none is hit with real work on these fixtures) ----
pf = types.ModuleType("pandas_flavor")
pf.register_dataframe_method = lambda f: f
pf.register_series_method = lambda f: f
sys.modules["pandas_flavor"] = pf

ch = types.ModuleType("chardet")
ch.detect = lambda contents: {"encoding": "utf-8"}
sys.modules["chardet"] = ch


def _unreached(*a, **k):
    raise RuntimeError("gsw shim reached — a fixture is depth-indexed?")


gs = types.ModuleType("gsw")
gs.p_from_z = _unreached
sys.modules["gsw"] = gs

mpl = types.ModuleType("matplotlib")
plt = types.ModuleType("matplotlib.pyplot")
mpl.pyplot = plt
sys.modules["matplotlib"] = mpl
sys.modules["matplotlib.pyplot"] = plt

sys.path.insert(0, "/root/reference")
import ctd  # noqa: E402  (the reference package, unmodified)
from ctd.read import _read_file, _parse_seabird  # noqa: E402

# CTD_with_sigma_e00.cnv declares a latin-1 'sigma-é00' channel; the real
# chardet would detect latin-1. The utf-8 shim above breaks that one file,
# so give the shim the same answer chardet gives (the engine's RawFile
# sniffer agrees — ParserSpec pins the channel name).
ch.detect = lambda contents: {
    "encoding": "latin-1" if b"\xe9" in contents else "utf-8"}


def engine_name(meta_name):
    """The engine's cast-id normalization (CastHeader): the header
    FileName is often a Windows path ('D:\\CTD DATA\\...\\G01L04S01.hex');
    posix Path.stem leaves the backslash components in place (a reference
    wart), the engine takes the last path component minus the extension."""
    base = re.split(r"[\\/]", meta_name)[-1]
    dot = base.rfind(".")
    return base[:dot] if dot > 0 else base


def bad_flag_of(path):
    """The `# bad_flag = X` sentinel, straight from the header text."""
    txt = _read_file(path).read()
    m = re.search(r"#\s*bad_flag\s*=\s*(\S+)", txt)
    return float(m.group(1)) if m else None


def mask_bad(df, flag):
    """Engine divergence (documented): sentinel values become null."""
    if flag is None:
        return df
    num = df.select_dtypes(include=[np.number]).columns
    out = df.copy()
    out[num] = out[num].where(out[num] != flag)
    return out


def write(name, cols):
    """Write a dict of (name -> array-like) as parquet; NaN -> NULL."""
    arrays, fields = [], []
    for c, v in cols.items():
        if isinstance(v, (list, tuple)):
            v = np.asarray(v)
        if getattr(v, "dtype", None) is not None and v.dtype.kind == "f":
            arr = pa.array(v, mask=np.isnan(v))
        else:
            arr = pa.array(v)
        arrays.append(arr)
        fields.append(c)
    pq.write_table(pa.table(arrays, names=fields), f"{OUT}/{name}.parquet")
    print(f"{name}: {len(arrays[0])} rows")


# --------------------------------------------------------------- q16 ----
cnv_path = f"{DATA}/CTD_with_sigma_e00.cnv"
cast = ctd.from_cnv(cnv_path)
cast_meta = cast._metadata
cast = mask_bad(cast, bad_flag_of(cnv_path))
write("q16_cnv_read", {
    "cast_id": [engine_name(cast_meta["name"])] * len(cast),
    "scan_order": np.arange(len(cast), dtype=np.int64),
    "pressure": cast.index.to_numpy(dtype=float),
    "t068C": cast["t068C"].to_numpy(dtype=float),
    "sal00": cast["sal00"].to_numpy(dtype=float),
})

# --------------------------------------------------------------- q17 ----
ros_path = f"{DATA}/CTD/g01l01s01.ros"
ros = ctd.rosette_summary(ros_path)
# prkey: the reference's own candidate list (read.py:445-456) against the
# parsed column set — from_cnv consumes the winner into the index, so
# re-ask the parser which column won
PRKEYS = ["prM", "prE", "prDM", "pr50M", "pr50M1", "prSM", "prdM", "pr",
          "depSM", "prDE"]


def prkey_of(path):
    meta = _parse_seabird(_read_file(path).readlines(), ftype="cnv")
    return next(k for k in PRKEYS if k in meta["names"])


rows = []
for m, path, n in ((cast_meta, cnv_path, len(cast)),
                   (ros._metadata, ros_path, len(ros))):
    rows.append((engine_name(m["name"]), float(m["lat"]), float(m["lon"]),
                 prkey_of(path), n))
rows.sort()
write("q17_casts_meta", {
    "cast_id": [r[0] for r in rows],
    "lat": np.array([r[1] for r in rows]),
    "lon": np.array([r[2] for r in rows]),
    "prkey": [r[3] for r in rows],
    "n_rows": np.array([r[4] for r in rows], dtype=np.int64),
})

# --------------------------------------------------------------- q18 ----
# the reference doctest (read.py:540-545): groupby(nbf).mean() -> int
g = ros.groupby(ros.index)["pressure"].mean()
write("q18_rosette_golden", {
    "nbf": g.index.to_numpy(dtype=np.int32),
    "mean_pressure_int": g.to_numpy().astype(np.int32),
})

# --------------------------------------------------------------- q19 ----
btl_path = f"{DATA}/btl/bottletest.btl"
btl = ctd.from_btl(btl_path)
btl = mask_bad(btl, bad_flag_of(btl_path))
btl = btl.sort_values(["Bottle", "Statistic"], kind="stable")
write("q19_btl_read", {
    "Bottle": btl["Bottle"].to_numpy(dtype=np.int64),
    "Statistic": btl["Statistic"].tolist(),
    "Date": btl["Date"].dt.to_pydatetime().tolist(),
    "sal00": btl["Sal00"].to_numpy(dtype=float),
})

# --------------------------------------------------------------- q20 ----
counts = {
    "edf": len(ctd.from_edf(f"{DATA}/XBT.EDF.zip")),
    "fsi": len(ctd.from_fsi(f"{DATA}/FSI.txt.gz")),
    "bl": len(ctd.from_bl(f"{DATA}/bl/bottletest.bl")),
    "castaway": len(ctd.from_castaway_csv(f"{DATA}/castaway_data.csv")),
}
fmts = sorted(counts)
write("q20_multiformat_read", {
    "fmt": fmts,
    "n": np.array([counts[f] for f in fmts], dtype=np.int64),
})

# --------------------------------------------------------------- q37 ----
import glob  # noqa: E402

DELTA = 50.0
frames, stations = [], []
for path in sorted(glob.glob(f"{DATA}/CTD/*.cnv.gz")):
    c = ctd.from_cnv(path)
    c_meta = c._metadata
    c = mask_bad(c, bad_flag_of(path))
    name = engine_name(c_meta["name"])
    stations.append((name, float(c_meta["lon"]),
                     float(c_meta["lat"])))
    c = c[c.index >= 0]                      # remove_above_water
    down, _up = ctd.processing.split(c)      # reference split (argmax rule)
    s = down["t090C"]
    # reference _bindata(method="average") verbatim semantics
    start = np.ceil(s.index[0])
    stop = np.floor(s.index[-1])
    edges = np.arange(start, stop, DELTA)
    binned = pd.cut(s.index, bins=edges)
    counts_b = s.groupby(binned, observed=False).count()
    means = s.groupby(binned, observed=False).mean()
    mid = edges[:-1] + DELTA / 2
    keep = counts_b.to_numpy() > 0           # engine keepEmpty=false
    frames.append(pd.DataFrame({
        "cast_id": name,
        "pressure": mid[keep],
        "t090C": means.to_numpy()[keep],
    }))
sec = pd.concat(frames, ignore_index=True)

# cumulative along-track distance: stations ordered by (lon, lat, cast),
# haversine with R=6371000 (Extras.haversineM's documented formula)
stations.sort(key=lambda t: (t[1], t[2], t[0]))
dist, acc = {}, 0.0
prev = None
for name, lon, lat in stations:
    if prev is not None:
        lon1, lat1 = prev
        d2r = np.pi / 180.0
        s_lat = np.sin((lat - lat1) * d2r * 0.5)
        s_lon = np.sin((lon - lon1) * d2r * 0.5)
        a = s_lat * s_lat + np.cos(lat1 * d2r) * np.cos(lat * d2r) * s_lon * s_lon
        acc += 6371000.0 * 2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))
    dist[name] = acc
    prev = (lon, lat)
sec["station_dist_m"] = sec["cast_id"].map(dist)
write("q37_section", {
    "cast_id": sec["cast_id"].tolist(),
    "pressure": sec["pressure"].to_numpy(dtype=float),
    "t090C": sec["t090C"].to_numpy(dtype=float),
    "station_dist_m": sec["station_dist_m"].to_numpy(dtype=float),
})

# --------------------------------------------------------------- q38 ----
ros_m = mask_bad(ros.reset_index(), bad_flag_of(ros_path))
ros_m = ros_m[ros_m["nbf"] > 0]
df38 = pd.DataFrame({
    "nbf": ros_m["nbf"].to_numpy(dtype=np.int64),
    "pressure": ros_m["pressure"].to_numpy(dtype=float),
    "t090C": ros_m["t090C"].to_numpy(dtype=float),
    "cond": ros_m["c0S/m"].to_numpy(dtype=float),
})
stats = []
for stat, fn in (("avg", "mean"), ("sdev", lambda x: x.std(ddof=1)),
                 ("min", "min"), ("max", "max")):
    agg = df38.groupby("nbf").agg(fn).reset_index()
    agg["Statistic"] = stat
    stats.append(agg)
st = pd.concat(stats, ignore_index=True).sort_values(
    ["nbf", "Statistic"], kind="stable")
write("q38_bottle_stats", {
    "nbf": st["nbf"].to_numpy(dtype=np.int64),
    "Statistic": st["Statistic"].tolist(),
    "pressure": st["pressure"].to_numpy(dtype=float),
    "t090C": st["t090C"].to_numpy(dtype=float),
    "cond": st["cond"].to_numpy(dtype=float),
})

# -------------------------------------------------------------- q181 ----
# Full QC chain, REFERENCE-EXECUTED (VERDICT r12 task #2): for each of the
# four real .cnv.gz casts run the reference's own processing functions
#     despike(n1=2, n2=20, block=100) -> press_check -> split()[down]
#     -> bindata(delta=1.0, method="average")
# over EVERY channel (DataFrame.apply semantics, ctd/processing.py:38-194),
# then melt to long (cast_id, pressure-bin-mid, channel, value). This
# anchors the engine's §2.5 chain COMPOSITION end-to-end to the reference's
# numpy/pandas values — r10 proved shape parity (2,916 binned rows), this
# pins the values. The only data-prep divergence replayed is the engine's
# documented bad_flag -> null masking (none of these four casts actually
# contains its sentinel, so masking is a no-op here either way).
q181_frames = []
for path in sorted(glob.glob(f"{DATA}/CTD/*.cnv.gz")):
    c = ctd.from_cnv(path)
    name = engine_name(c._metadata["name"])
    c = mask_bad(c, bad_flag_of(path))
    c = ctd.processing.despike(c, n1=2, n2=20, block=100)
    c = ctd.processing.press_check(c)
    down, _up = ctd.processing.split(c)
    binned = ctd.processing.bindata(down, delta=1.0, method="average")
    melted = binned.reset_index(names="pressure").melt(
        id_vars="pressure", var_name="channel", value_name="value")
    melted.insert(0, "cast_id", name)
    q181_frames.append(melted)
q181 = pd.concat(q181_frames, ignore_index=True).sort_values(
    ["cast_id", "pressure", "channel"], kind="stable")
write("q181_qc_chain", {
    "cast_id": q181["cast_id"].tolist(),
    "pressure": q181["pressure"].to_numpy(dtype=float),
    "channel": q181["channel"].tolist(),
    "value": q181["value"].to_numpy(dtype=float),
})

print("done ->", OUT)
