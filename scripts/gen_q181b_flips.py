#!/usr/bin/env python3
"""Regenerate golden_oracle/q181b_flips.parquet — the enumerated
knife-edge cells of the q181b anchor.

q181b hash-anchors the 16 step-quantized QC-chain channels (the ones
q181 documents out) against the reference-executed golden parquet. On
those channels a residual set of binned cells sits on an FP knife edge
at the despike |x - mean| = n*std threshold, where numpy's pairwise
summation and the engine's sequential recurrences legitimately disagree
by 1 ulp — the flag, and with it the bin mean, is decided by summation
order. Neither side owns that decision, so the divergent cells are
ENUMERATED here and anti-joined by BOTH the engine query and the DuckDB
oracle; everything else is hash-anchored. (The constant-plateau class
that used to dominate this list — 6,513 cells — was a real engine
defect, fixed in r14 by the exactly-constant-window guard in
CastOps.despike; what remains is genuine summation-order noise:
86 cells, 0.18%.)

Run from the repo root AFTER any despike/bindata/reader change:

    python3 scripts/gen_q181b_flips.py

The script (1) writes an EMPTY flip list, (2) runs graft.Verify for
q181b only (so the dump carries every cell), (3) diffs the dump against
golden_oracle/q181_qc_chain.parquet under the q181 quantization, and
(4) writes the divergent (cast_id, pressure*2, channel) keys back. It
refuses to finish if the flip fraction exceeds 1% — a budget that large
means a behavioral regression, not knife-edge noise.
"""
import glob
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ANCHORED = {"c0S/m", "dz/dtM", "pla", "sbeox0Mm/Kg", "sbeox1Mm/Kg", "scan",
            "sva", "t090C", "t190C", "timeS", "tsa", "v5", "wetCDOM"}
FLIPS = "golden_oracle/q181b_flips.parquet"
GOLD = "golden_oracle/q181_qc_chain.parquet"
DUMP = "/tmp/q181b_flips_regen"

ADD_OPENS = [f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in (
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar")]


def write_flips(rows: pd.DataFrame) -> None:
    t = pa.Table.from_pandas(
        rows[["cast_id", "pressure_k2", "channel"]].astype(
            {"cast_id": str, "pressure_k2": "int64", "channel": str}),
        preserve_index=False)
    pq.write_table(t, FLIPS)


def main() -> None:
    empty = pd.DataFrame({"cast_id": pd.Series(dtype=str),
                          "pressure_k2": pd.Series(dtype="int64"),
                          "channel": pd.Series(dtype=str)})
    write_flips(empty)

    subprocess.run(
        ["java", *ADD_OPENS, "-Xmx8g", "-Xss32m",
         "-Dspark.ui.enabled=false",
         "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
         "graft.Verify", "/root/testdata/sf0.001", DUMP,
         "q181b_qc_chain_full"],
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    eng = pd.concat([pq.read_table(p).to_pandas() for p in
                     glob.glob(f"{DUMP}/q181b_qc_chain_full/*.parquet")])
    gold = pq.read_table(GOLD).to_pandas()
    g = gold[~gold.channel.isin(ANCHORED)].copy()
    g["gq"] = np.floor(g["value"].to_numpy() * 1e5 + 0.31830988618)
    g["pressure_k2"] = (g["pressure"] * 2).astype("int64")
    e = eng.copy()
    e["pressure_k2"] = (e["pressure"] * 2).astype("int64")
    m = g.merge(
        e.rename(columns={"value_q5": "eq"})[
            ["cast_id", "pressure_k2", "channel", "eq"]],
        on=["cast_id", "pressure_k2", "channel"], how="outer",
        indicator=True)
    if (m["_merge"] != "both").any():
        raise SystemExit(f"cell sets differ: "
                         f"{m['_merge'].value_counts().to_dict()} — the "
                         "engine dump and the golden melt must cover the "
                         "same (cast, bin, channel) grid")
    bad = (~(m["gq"].isna() & m["eq"].isna())) & (m["gq"] != m["eq"])
    fl = m[bad].sort_values(["cast_id", "pressure_k2", "channel"])
    frac = len(fl) / len(m)
    print(f"flips: {len(fl)} of {len(m)} cells ({frac:.2%})")
    print(fl.groupby("channel").size().sort_values(ascending=False)
          .to_string())
    if frac > 0.01:
        raise SystemExit("flip fraction exceeds the 1% knife-edge budget — "
                         "this is a behavioral regression; fix the engine "
                         "instead of committing a bigger exclusion list")
    write_flips(fl)
    print(f"wrote {len(fl)} flips -> {FLIPS}")


if __name__ == "__main__":
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
