#!/usr/bin/env bash
# Round-close checklist (round-19, VERDICT r18 #7): the cross-SF oracle
# habit, mechanized so it cannot silently lapse. Runs, in order:
#   1. the full ScalaTest suite,
#   2. Verify + DuckDB oracle compare at sf0.01 (the driver's gate SF),
#   3. Verify + DuckDB oracle compare at sf0.1 (10x the gate SF — the
#      cross-SF hardening round 18 introduced),
#   4. the full bench at sf0.1 (median-of-3 + the 10x probe), whose
#      complete JSON lands in bench_last.json.
# Record both oracle results + the bench totals in BASELINE.md's round
# notes when closing. Any step failing fails the close.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/4] sbt test"
sbt -batch test

echo "== [2/4] Verify + oracle @ sf0.01 (gate SF)"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_sf001"
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_sf001

echo "== [3/4] Verify + oracle @ sf0.1 (10x cross-SF)"
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01"
python3 tools/oracle_check.py /root/testdata/sf0.1 /tmp/verify_sf01

echo "== [4/4] bench @ sf0.1 (median-of-3 + 10x probe) -> bench_last.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 \
  | grep '"metric"' | tail -1

echo "== round close green"
