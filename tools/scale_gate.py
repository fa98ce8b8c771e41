#!/usr/bin/env python3
"""Sub-linearity gate over a 10x scale bench.

Usage: scale_gate.py <bench_sf01.json> <bench_scale10.json> [max_ratio]

Reads two graft.Bench JSON lines (the sf0.1 run and the 10x run produced by
tools/run_scale10.sh) and asserts every query grew by LESS than `max_ratio`
(default 9.0 — i.e. sub-linear for 10x data) — except the documented parity
forms, which reproduce a reference-mandated single-partition plan and are
expected to scale super-linearly (their scale-safe twins are gated instead).

Exit 0 = gate passed; exit 1 = at least one non-parity query scaled
super-linearly (a plan that won't survive 100 TB).
"""
import json
import sys

# Parity forms: reproduce the reference's single-partition global-rank window
# (jobs/vdt4.py:48-49) byte-for-byte; the scale hazard is documented in
# BASELINE.md and the oracle-identical q_vdt4_scalable twin IS gated.
PARITY_EXEMPT = {"q_vdt4"}
# Sub-second queries: absolute time too small for a stable ratio (a 0.2s ->
# 2.1s move is noise-dominated); gate only when the 10x time is material.
MIN_SECONDS_AT_10X = 3.0


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    base, big = load(sys.argv[1]), load(sys.argv[2])
    max_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 9.0
    bq, gq = base["queries"], big["queries"]
    failures, rows = [], []
    for name in sorted(gq):
        if name not in bq:
            continue
        t0, t1 = bq[name], gq[name]
        if t0 < 0 or t1 < 0:
            failures.append(f"{name}: bench error (base={t0}, 10x={t1})")
            continue
        ratio = t1 / t0 if t0 > 0 else float("inf")
        flag = ""
        if name in PARITY_EXEMPT:
            flag = "parity-exempt"
        elif ratio > max_ratio and t1 >= MIN_SECONDS_AT_10X:
            flag = "FAIL"
            failures.append(f"{name}: {t0:.2f}s -> {t1:.2f}s = {ratio:.1f}x "
                            f"(> {max_ratio}x for 10x data)")
        rows.append(f"  {name:24s} {t0:7.2f}s -> {t1:7.2f}s  {ratio:5.1f}x {flag}")
    print("\n".join(rows))
    total0 = sum(v for v in bq.values() if v >= 0)
    total1 = sum(v for v in gq.values() if v >= 0)
    print(f"== total {total0:.1f}s -> {total1:.1f}s "
          f"({total1 / total0 if total0 else 0:.1f}x for 10x rows) ==")
    if failures:
        print("GATE FAILED:")
        for f in failures:
            print(f"  {f}")
        sys.exit(1)
    print("GATE PASSED: every non-parity query scales sub-linearly")


if __name__ == "__main__":
    main()
