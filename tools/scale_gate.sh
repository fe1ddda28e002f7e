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

# ---- density-stressed leg (r14 verdict item 2): the pair budget exists
# for corpora with ELEVATED duplicate density, but the standard decades
# perturb replicas below the near-dup thresholds, so density stays flat
# and the budget saturates late. This leg scales DOCUMENTS ONLY with
# near-dup replicas (cross-replica Jaccard ~0.8 -> pair volume ~ r^2*N),
# benches the budget family at dense-10x / dense-30x, fits e(1->3), and
# proves the audit entry oracle-green with the budget ENGAGED
# (sample_ppm < 1e6). Same adjudication contract as the main gate.
DENSE_ENTRIES="dedup_ngram_jaccard dedup_containment dedup_minhash_calibration dedup_lsh_tuning dedup_pair_budget_audit"
for D in 10 30; do
  if [ ! -d "/tmp/graft_dense$D/documents.parquet" ]; then
    sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_dense$D $D dense-docs"
  fi
done
SPARK_GRAFT_SF_DIR=/tmp/graft_dense10 SPARK_GRAFT_BENCH_OUT=/tmp/graft_bench_dense1.json \
  sbt -batch "runMain graft.Bench $DENSE_ENTRIES"
cp /tmp/graft_bench_dense1.json "BENCH_DENSE1_r${RND}.json"
SPARK_GRAFT_SF_DIR=/tmp/graft_dense30 SPARK_GRAFT_BENCH_OUT=/tmp/graft_bench_dense3.json \
  sbt -batch "runMain graft.Bench $DENSE_ENTRIES"
cp /tmp/graft_bench_dense3.json "BENCH_DENSE3_r${RND}.json"

# audit entry must be oracle-green ON THE DENSE DIR with the budget engaged
rm -rf /tmp/graft_dense_verify
sbt -batch "runMain graft.Verify /tmp/graft_dense10 /tmp/graft_dense_verify dedup_pair_budget_audit"
python3 - "$RND" <<'EOF'
import json, math, re, sys, glob
import duckdb
rnd = sys.argv[1]
b1 = json.load(open(f"BENCH_DENSE1_r{rnd}.json"))["queries"]
b3 = json.load(open(f"BENCH_DENSE3_r{rnd}.json"))["queries"]
survey = open("SURVEY.md").read()
bad = []
lines = []
for n in sorted(b1):
    t1, t3 = b1.get(n, -1), b3.get(n, -1)
    if t1 <= 0 or t3 <= 0:
        bad.append(f"{n}(missing)")
        continue
    e = math.log(t3 / t1) / math.log(3)
    flag = " <-- super-linear dense tail" if e > 1.3 else ""
    lines.append(f"{n:32s} dense10={t1:8.2f}s dense30={t3:8.2f}s e(1-3)={e:5.2f}{flag}")
    if e > 1.3 and not re.search(rf"ADJUDICATED r{re.escape(rnd)}: {re.escape(n)}\b", survey):
        bad.append(f"{n}(e={e:.2f})")
txt = "\n".join(lines)
print(txt)
open(f"SCALE_FIT_DENSE_r{rnd}.txt", "w").write(txt + "\n")
# audit row: budget must actually be engaged, and the Spark dump must
# match the DuckDB replay on the dense dir
files = glob.glob("/tmp/graft_dense_verify/dedup_pair_budget_audit/*.parquet")
oracle = json.load(open("/tmp/graft_dense_verify/oracle_sql.json"))
con = duckdb.connect()
con.execute("CREATE VIEW documents AS SELECT * FROM '/tmp/graft_dense10/documents.parquet/*.parquet'")
got = con.execute(f"SELECT * FROM read_parquet({files!r}) ORDER BY 1").df()
exp = con.execute(oracle["dedup_pair_budget_audit"]).df()
exp = exp.reindex(sorted(exp.columns), axis=1); got = got.reindex(sorted(got.columns), axis=1)
row = got.iloc[0]
print(f"audit: volume={row['candidate_volume']} keep_ppm={row['keep_ppm']} "
      f"scored={row['n_scored_occurrences']} exhaustive={row['exhaustive']}")
if not got.equals(exp.astype(got.dtypes.to_dict())):
    bad.append("pair_budget_audit(oracle-mismatch)")
if bool(row["exhaustive"]):
    bad.append("pair_budget_audit(budget-not-engaged)")
if bad:
    print("DENSE GATE FAIL: " + " ".join(bad)); sys.exit(1)
print("dense gate OK")
EOF
