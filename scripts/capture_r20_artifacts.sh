#!/bin/bash
# Round-20 artifact capture chain: SCALE_SMOKE_r20.json (distinct 10x,
# neardup 10x, stream 10x on sf0.1) then SCALE_STRESS_r20.json
# (distinct 100x on sf0.01, the 512-d wide-vector ANN line, the
# binary-ANN (corpus, pool, recall) surface, the past-kCeiling-bind
# semantic probe line, and the graph_triangles attribution line), then
# the clean bench (bench_clean_r20.json) — the final-HEAD re-capture
# VERDICT r19 ask #7 requires on the last round.
# Runs sequentially to keep each line's load marker honest.
set -euo pipefail
cd "$(dirname "$0")/.."
SMOKE=SCALE_SMOKE_r20.json
STRESS=SCALE_STRESS_r20.json
: > "$SMOKE.tmp"; : > "$STRESS.tmp"

run() { # outfile cmd... — keep only the JSON line
  local out="$1"; shift
  "$@" 2>&1 | grep -E '^\{"metric"' >> "$out"
}

SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SCALE=10 SPARK_GRAFT_MODE=distinct \
  run "$SMOKE.tmp" sbt -batch "runMain graft.ScaleSmoke /root/testdata/sf0.1"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SCALE=10 SPARK_GRAFT_MODE=neardup \
  run "$SMOKE.tmp" sbt -batch "runMain graft.ScaleSmoke /root/testdata/sf0.1"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SCALE=10 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  run "$SMOKE.tmp" sbt -batch "runMain graft.StreamScaleSmoke"

SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SCALE=100 SPARK_GRAFT_MODE=distinct \
  run "$STRESS.tmp" sbt -batch "runMain graft.ScaleSmoke /root/testdata/sf0.01"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SCALE=100 SPARK_GRAFT_MODE=distinct \
  SPARK_GRAFT_VEC_MULT=8 \
  SPARK_GRAFT_SMOKE_ONLY=dedup_embedding,emb_,sim_,q15 \
  run "$STRESS.tmp" sbt -batch "runMain graft.ScaleSmoke /root/testdata/sf0.01"
# binary-ANN recall surface at 512-d; BinaryRecallStress auto-appends
# recommendedPool(n) per scale, so the r20 n/16 rule's own points ride
SPARK_GRAFT_CPUS=32 \
  run "$STRESS.tmp" sbt -batch "runMain graft.BinaryRecallStress /root/testdata/sf0.01"
# 24g driver heap: pre-cap points still build ~9M-pair candidate joins
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  run "$STRESS.tmp" sbt -batch "runMain graft.SemanticStress /root/testdata/sf0.1"
SPARK_GRAFT_CPUS=32 \
  run "$STRESS.tmp" sbt -batch "runMain graft.GraphStress /root/testdata/sf0.01"

mv "$SMOKE.tmp" "$SMOKE"
mv "$STRESS.tmp" "$STRESS"

# clean bench: fresh-session sweep, 3-iter medians, calib markers
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=bench_clean_r20.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r20_stdout.log 2>&1 || {
    tail -5 /tmp/bench_r20_stdout.log; echo "BENCH FAILED"; exit 1; }
tail -2 /tmp/bench_r20_stdout.log

echo "CAPTURE DONE: $(wc -l "$SMOKE" "$STRESS" 2>/dev/null)"
