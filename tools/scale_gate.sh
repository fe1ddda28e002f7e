#!/bin/bash
# Standing three-decade exponent gate (r13 verdict item 5): the r13
# round proved the plan lint structurally cannot see PAIR-VOLUME
# superlinearity (dedup_containment e(1->3)=2.19 with a perfectly
# bucketed plan) — only the measured growth exponent can. So every
# round's closing gate now fits e across sf0.1 -> sf1 -> sf3 for AT
# LEAST the top-30 sf1 entries and FAILS (exit 1) on any
# e(1->3) > 1.3 that lacks a SURVEY adjudication line.
#
#   bash tools/scale_gate.sh <round>
#
# Preconditions (run strictly sequentially, never beside another sbt):
#   - BENCH_FULL_latest.json is the round's final-HEAD sf0.1 bench
#   - BENCH_SF1_r<round>.json exists (tools/scale_probe.sh)
# The script synthesizes the 30x dir if missing, benches the top-30
# sf1 entries there, writes BENCH_SF3_r<round>.json + SCALE_FIT_r<round>.txt.
set -euo pipefail
RND=${1:?usage: scale_gate.sh <round>}
SF1="BENCH_SF1_r${RND}.json"
[ -f "$SF1" ] || { echo "missing $SF1 — run tools/scale_probe.sh first"; exit 2; }

TOP=$(python3 - "$SF1" <<'EOF'
import json, sys
q = json.load(open(sys.argv[1]))["queries"]
names = sorted((n for n, v in q.items() if v > 0), key=lambda n: -q[n])[:30]
print(" ".join(names))
EOF
)
echo "top-30 sf1 entries: $TOP"

if [ ! -f /tmp/graft_sf3/documents.parquet/_SUCCESS ] && [ ! -d /tmp/graft_sf3/documents.parquet ]; then
  sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf3 30"
fi
SPARK_GRAFT_SF_DIR=/tmp/graft_sf3 SPARK_GRAFT_BENCH_OUT=/tmp/graft_bench_sf3.json \
  sbt -batch "runMain graft.Bench $TOP"
cp /tmp/graft_bench_sf3.json "BENCH_SF3_r${RND}.json"

python3 tools/scale_fit.py BENCH_FULL_latest.json "$SF1" "BENCH_SF3_r${RND}.json" \
  | tee "SCALE_FIT_r${RND}.txt"

# gate: any e(1-3) > 1.3 must carry a STRUCTURED, ROUND-SCOPED
# adjudication marker in SURVEY.md: a line containing the literal
# token "ADJUDICATED r<round>: <entry>". The r14 loose match (entry
# name + any 'e(1'/'super-linear' substring on a SURVEY line) was
# permanently satisfied by SURVEY's own r13/r14 history for exactly
# the entries the gate was built to watch, so a future regression
# would have passed silently (r14 ADVICE, medium). Each round's
# overage now needs a FRESH adjudication line naming that round.
BAD=$(python3 - "SCALE_FIT_r${RND}.txt" "$RND" <<'EOF'
import re, sys
txt = open(sys.argv[1]).read()
rnd = sys.argv[2]
names = re.findall(r"^(\S+).*<-- super-linear tail", txt, re.M)
survey = open("SURVEY.md").read()
missing = [n for n in names
           if not re.search(rf"ADJUDICATED r{re.escape(rnd)}: {re.escape(n)}\b", survey)]
print(" ".join(missing))
EOF
)
if [ -n "$BAD" ]; then
  echo "SCALE GATE FAIL: e(1-3) > 1.3 without a SURVEY adjudication: $BAD"
  exit 1
fi
echo "scale gate OK"
