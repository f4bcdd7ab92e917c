#!/usr/bin/env python3
"""Verify the q181b anchor has ZERO knife-edge flips (r15 contract).

History: q181b hash-anchors the 16 step-quantized QC-chain channels
against the reference-executed golden parquet. Through r14 a residual
set of binned cells sat on an FP knife edge at the despike
|x - mean| = n*std threshold (numpy pairwise summation vs the engine's
Spark-recurrence arithmetic disagreeing by 1 ulp) and was ENUMERATED
here as an anti-joined flip list (86 cells after the r14 plateau fix).
r15 retired the list: the QC chain's despike now runs refExact —
graft.dsp.NumpyPairwise replays the reference's numpy.ma reductions
(fill-zero pairwise sums, two-pass variance, the masked-slot/tail
data-leak warts) bit-for-bit — so EVERY cell matches and neither the
engine query nor the oracle anti-joins anything.

Run from the repo root AFTER any despike/bindata/reader change:

    python3 scripts/gen_q181b_flips.py

The script (1) writes an EMPTY flip list, (2) runs graft.Verify for
q181b only, (3) diffs the dump against
golden_oracle/q181_qc_chain.parquet under the q181 quantization, and
(4) FAILS if ANY cell diverges — a non-empty flip set now means an
engine regression (the committed q181b_flips.parquet must stay empty;
GoldenOracleSpec pins that).
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
    if len(fl):
        print(fl.groupby("channel").size().sort_values(ascending=False)
              .to_string())
        raise SystemExit("q181b has divergent cells — since r15 the "
                         "refExact despike makes every cell bit-exact, so "
                         "ANY flip is an engine regression; fix the engine "
                         "(the committed flip list stays empty)")
    write_flips(fl)
    print(f"verified 0 flips; {FLIPS} stays empty")


if __name__ == "__main__":
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
