#!/bin/bash
# Standing per-round sf1 scale probe: synthesize 10x data (honest 10x —
# key-shifted replicas + content/vector perturbation, see ScaleUp.scala),
# run the FULL suite against it, commit the artifact, and gate on
# growth-rate (tools/scale_ratio.py flags >15x or a 2x ratio-of-ratios
# regression vs the prior round).
#
#   bash tools/scale_probe.sh <round> [prior-round]
#   e.g. bash tools/scale_probe.sh 10 9
#
# Run AFTER the round's sf0.1 bench (BENCH_FULL_latest.json must be the
# current round's sf0.1 numbers) and never concurrently with another sbt.
set -euo pipefail
RND=${1:?usage: scale_probe.sh <round> [prior-round]}
PRIOR=${2:-}

sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1 10"
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_BENCH_OUT=/tmp/graft_bench_sf1.json \
  sbt -batch "runMain graft.Bench"
cp /tmp/graft_bench_sf1.json "BENCH_SF1_r${RND}.json"
echo "wrote BENCH_SF1_r${RND}.json"

if [ -n "$PRIOR" ] && [ -f "BENCH_FULL_r${PRIOR}.json" ] && [ -f "BENCH_SF1_r${PRIOR}.json" ]; then
  python3 tools/scale_ratio.py BENCH_FULL_latest.json "BENCH_SF1_r${RND}.json" \
    "BENCH_FULL_r${PRIOR}.json" "BENCH_SF1_r${PRIOR}.json"
else
  python3 tools/scale_ratio.py BENCH_FULL_latest.json "BENCH_SF1_r${RND}.json"
fi
