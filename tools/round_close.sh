#!/usr/bin/env bash
# Round-close checklist (round-19, VERDICT r18 #7; extended round-20,
# VERDICT r19 #7): the cross-SF oracle habit, mechanized so it cannot
# silently lapse. Runs, in order:
#   1. a LEAKCHECK-style grep over src/ and the round docs (the
#      driver's per-round scan, pre-empted locally) + a git diff --stat
#      sanity line so the close records what actually changed,
#   2. the full ScalaTest suite,
#   3. Verify + DuckDB oracle compare at sf0.01 (the driver's gate SF),
#   4. Verify + DuckDB oracle compare at sf0.1 (10x the gate SF — the
#      cross-SF hardening round 18 introduced),
#   5. the full bench at sf0.1 (median-of-3 + the 10x probe), whose
#      complete JSON lands in bench_last.json.
# Record both oracle results + the bench totals in BASELINE.md's round
# notes when closing. Any step failing fails the close.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/5] leak grep + diff stat"
# the driver's LEAKCHECK greps for internal/proprietary markers; this
# local twin fails the close on any hit in tracked source/docs
if grep -rniE 'anthropic|claude|sonnet|opus[- ]4|internal[- ]only' \
    src/ tools/ README.md SURVEY.md BASELINE.md SCALE.md docs/ 2>/dev/null \
    | grep -v 'round_close.sh'; then
  echo "LEAKCHECK-style grep HIT — fix before closing" >&2
  exit 1
fi
echo "leak grep clean"
git diff --stat HEAD | tail -5
git status --short | head -20

echo "== [2/5] sbt test"
sbt -batch test

echo "== [3/5] Verify + oracle @ sf0.01 (gate SF)"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_sf001"
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_sf001

echo "== [4/5] Verify + oracle @ sf0.1 (10x cross-SF)"
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01"
python3 tools/oracle_check.py /root/testdata/sf0.1 /tmp/verify_sf01

echo "== [5/5] bench @ sf0.1 (median-of-3 + 10x probe) -> bench_last.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 \
  | grep '"metric"' | tail -1

echo "== round close green"
