#!/usr/bin/env python3
"""Adjudicate the r10->r11 local-bench drift (VERDICT r11 task #3).

Inputs: the two same-binary protocol runs from run_bench_protocol_ab.sh
  A = /tmp/bench_ab_r12/bench_a_reps5_gc.json   (r11 protocol)
  B = /tmp/bench_ab_r12/bench_b_reps3_nogc.json (r10 protocol)
plus the committed BENCH_LOCAL_r10.json / BENCH_LOCAL_r11.json records.

Prints the adjudication table: per-protocol totals on the same binary,
median per-query ratios for every pairing, and the tail of queries whose
same-protocol ratio vs r10 exceeds 1.3x (each needs a named cause).
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def ratios(a, b):
    """median and distribution of a[q]/b[q] over common queries."""
    common = sorted(set(a) & set(b))
    rs = [(q, a[q] / b[q]) for q in common if b[q] > 0]
    med = statistics.median(r for _, r in rs)
    slower = sum(1 for _, r in rs if r > 1.0)
    return common, rs, med, slower


def total(d, keys):
    return sum(d[q] for q in keys)


def main():
    a = load("/tmp/bench_ab_r12/bench_a_reps5_gc.json")
    b = load("/tmp/bench_ab_r12/bench_b_reps3_nogc.json")
    r10 = load("BENCH_LOCAL_r10.json")
    r11 = load("BENCH_LOCAL_r11.json")

    print("== same binary (r12), protocol A (reps5+GC) vs B (reps3 noGC) ==")
    common, rs, med, slower = ratios(a, b)
    print(f"common={len(common)} total_A={total(a, common):.1f}s "
          f"total_B={total(b, common):.1f}s median A/B={med:.3f} "
          f"A-slower={slower}/{len(rs)}")

    print("\n== r12 binary (protocol B = r10 protocol) vs committed r10 ==")
    common2, rs2, med2, slower2 = ratios(b, r10)
    print(f"common={len(common2)} total_B={total(b, common2):.1f}s "
          f"total_r10={total(r10, common2):.1f}s median B/r10={med2:.3f} "
          f"B-slower={slower2}/{len(rs2)}")
    tail = sorted((r for r in rs2 if r[1] > 1.3), key=lambda x: -x[1])
    print(f">1.3x vs r10 under the SAME protocol: {len(tail)}")
    for q, r in tail[:15]:
        print(f"  {q}: {r:.2f}x  (B={b[q]:.2f}s r10={r10[q]:.2f}s "
              f"r11={r11.get(q, float('nan')):.2f}s)")

    print("\n== committed r11 vs committed r10 (the original drift) ==")
    common3, rs3, med3, slower3 = ratios(r11, r10)
    print(f"common={len(common3)} median r11/r10={med3:.3f} "
          f"slower={slower3}/{len(rs3)}")

    print("\n== r12 protocol A vs committed r11 (same protocol, r11->r12 code) ==")
    common4, rs4, med4, slower4 = ratios(a, r11)
    print(f"common={len(common4)} median A/r11={med4:.3f} "
          f"slower={slower4}/{len(rs4)}")


if __name__ == "__main__":
    sys.exit(main())
