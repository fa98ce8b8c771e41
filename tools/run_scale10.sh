#!/bin/bash
# Standing 10x scale gate (VERDICT r8 item 8): synthesize 10x data, bench
# the headline queries at sf0.1 and at 10x in one JVM each, then assert
# per-query sub-linearity with tools/scale_gate.py.
#
# Usage: tools/run_scale10.sh [round-tag]   (run from the repo root)
# Writes BENCH_sf01_<tag>.json, BENCH_scale10_<tag>.json in the repo root.
set -euo pipefail
TAG=${1:-local}
SF=${SF:-/root/testdata/sf0.1}
BIG=${BIG:-/tmp/graft_sf1}
CPUS=${SPARK_GRAFT_CPUS:-32}
# min-of-3 per query: the heavy versioned-write/window queries at 10x are
# GC/page-cache sensitive and swing up to 3x between min-of-2 runs (observed
# r11: q_vdt4_scalable 13.1s/23.0s/38.7s across three gate invocations);
# a third pass restores a stable, gateable number.
export SPARK_GRAFT_BENCH_RUNS=${SPARK_GRAFT_BENCH_RUNS:-3}

if [ ! -f "$BIG/lineitem.parquet" ]; then
  echo "== synthesizing 10x copy of $SF at $BIG =="
  python3 tools/make_scale10.py "$SF" "$BIG"
fi

echo "== bench at sf0.1 =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | tail -1 \
  | sed 's/^\[info\] //' \
  > "BENCH_sf01_$TAG.json"
cat "BENCH_sf01_$TAG.json"

echo "== bench at 10x =="
SPARK_GRAFT_SF_DIR="$BIG" SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | tail -1 \
  | sed 's/^\[info\] //' \
  > "BENCH_scale10_$TAG.json"
cat "BENCH_scale10_$TAG.json"

echo "== sub-linearity gate =="
python3 tools/scale_gate.py "BENCH_sf01_$TAG.json" "BENCH_scale10_$TAG.json"
