#!/usr/bin/env python3
"""Golden fixture for graft.dsp.NumpyPairwise: random masked windows with
this container's numpy.ma mean/std(ddof=0) results, BIT-pinned.

The despike refExact path (CastOps.despike) claims bit-parity with the
reference's `masked_invalid(rolling_window).mean/std(axis=1)` — the q181/
q181b anchors prove it end-to-end on the 4 fixture casts, and this fixture
pins the primitive itself on adversarial shapes (fully masked, constants,
step-quantized values, every length class of the pairwise algorithm:
n<8, 8<=n<=128 with remainders, n>128 recursion).

Writes golden_oracle/numpy_ma_stats.parquet:
  case_id, values (list<double>), mask (list<bool>),
  cnt (int64), mean_bits (int64), std_bits (int64)
mean/std encoded via float64 raw bits (numpy .view). Fully-masked rows
carry cnt=0 and NaN bits (the engine treats cnt==0 as the masked
sentinel; NumpyPairwiseSpec asserts cnt first).

Run from the repo root: python3 scripts/gen_golden_numpy_stats.py
"""
import numpy as np
import numpy.ma as ma
import pyarrow as pa
import pyarrow.parquet as pq

OUT = "golden_oracle/numpy_ma_stats.parquet"
rng = np.random.default_rng(20260816)

cases = []
# every pairwise length class + the despike block size
lengths = list(range(1, 18)) + [31, 32, 63, 64, 100, 127, 128, 129,
                                160, 200, 255, 256, 300]
for n in lengths:
    for kind in range(6):
        x = rng.normal(size=n) * (10.0 ** rng.integers(-3, 4))
        if kind == 1:          # step-quantized (the q181b channel shape)
            x = np.round(x, 2)
        elif kind == 2:        # exact constant plateau
            x = np.full(n, float(np.round(rng.normal(), 3)))
        elif kind == 3:        # constant + one outlier
            x = np.full(n, 5.25)
            if n > 2:
                x[n // 2] = 1e6
        m = rng.random(n) < (0.0, 0.15, 0.3, 0.5, 0.9, 1.0)[kind]
        if kind == 5:
            m[:] = True        # fully masked
        cases.append((x, m))

case_id, values, mask_l, cnts, mean_bits, std_bits = [], [], [], [], [], []
for i, (x, m) in enumerate(cases):
    arr = ma.masked_array(x.reshape(1, -1), mask=m.reshape(1, -1))
    mean = arr.mean(axis=1)
    std = arr.std(axis=1)
    cnt = int((~m).sum())
    if cnt == 0:
        mb = np.float64(np.nan).view(np.int64)
        sb = np.float64(np.nan).view(np.int64)
    else:
        mb = np.float64(mean.filled(np.nan)[0]).view(np.int64)
        sb = np.float64(std.filled(np.nan)[0]).view(np.int64)
    case_id.append(i)
    values.append(x.tolist())
    mask_l.append(m.tolist())
    cnts.append(cnt)
    mean_bits.append(int(mb))
    std_bits.append(int(sb))

t = pa.table({
    "case_id": pa.array(case_id, pa.int64()),
    "values": pa.array(values, pa.list_(pa.float64())),
    "mask": pa.array(mask_l, pa.list_(pa.bool_())),
    "cnt": pa.array(cnts, pa.int64()),
    "mean_bits": pa.array(mean_bits, pa.int64()),
    "std_bits": pa.array(std_bits, pa.int64()),
})
pq.write_table(t, OUT)
print(f"wrote {len(case_id)} cases -> {OUT}")
