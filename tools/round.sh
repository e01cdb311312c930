#!/usr/bin/env bash
# One full round drive: unit suite -> oracle gate -> 10x scale soak ->
# bench. Run from the repo root on an otherwise-idle box (concurrent
# compiles pollute bench medians; loadavg is stamped in the record so a
# polluted run self-identifies).
#
#   tools/round.sh [sf_dir_verify] [sf_dir_bench]
#
# The soak (SoakSpec, tag graft.Soak) is opt-in in build.sbt; this script
# is what makes it once-per-round instead of adjudication-only — paste its
# wall times into SCALE.md's soak table.
set -euo pipefail
VERIFY_SF="${1:-/root/testdata/sf0.01}"
BENCH_SF="${2:-/root/testdata/sf0.1}"

echo "== unit/property suite =="
sbt -batch test

echo "== oracle gate (Verify + DuckDB diff at $VERIFY_SF) =="
sbt -batch "runMain graft.Verify $VERIFY_SF /tmp/graft_verify"
python3 tools/diffcheck.py "$VERIFY_SF" /tmp/graft_verify

echo "== 10x scale soak (SoakSpec) =="
sbt -batch 'set Test/testOptions := Seq(); testOnly graft.SoakSpec -- -n graft.Soak'

echo "== bench ($BENCH_SF) =="
SPARK_GRAFT_SF_DIR="$BENCH_SF" SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench"
echo "bench record: BENCH_LAST.json"
