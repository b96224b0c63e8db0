#!/usr/bin/env bash
# Pre-snapshot gate: refuse to call a tree "done" unless every hard
# signal the driver checks is green LOCALLY first.
#
#   tools/preflight.sh            # compile + test + verify + oracle
#   tools/preflight.sh --fast     # compile + oracle-affecting queries only
#
# Round-5 lesson: a single unescaped '\s' in an oracle string shipped in
# the end-of-round snapshot, sbt compile failed, and every round-5
# correctness/bench/test signal was voided. This script is the guard:
# run it before ANY milestone commit that touches src/main.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
OUT_DIR="${PREFLIGHT_OUT:-/tmp/preflight_verify}"
FAST="${1:-}"

echo "== preflight: compile =="
sbt -batch compile

if [ "$FAST" != "--fast" ]; then
  echo "== preflight: full test suite =="
  sbt -batch test
fi

echo "== preflight: Verify dump @ $SF_DIR =="
rm -rf "$OUT_DIR"
VERIFY_T0=$(date +%s)
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
VERIFY_WALL=$(( $(date +%s) - VERIFY_T0 ))

# Wall-budget guard (round-12 item 2): the registry grew 73 -> 393
# queries across 11 rounds and round 11's driver sweep timed out, which
# zeroed every correctness/bench signal despite a green tree. Preflight
# therefore gates WALL, not just green-ness: the full Verify sweep must
# fit the budget (default 2400 s — r11's serial sf0.01 run was ~2040 s
# at 8 CPUs; regressions past this level are what eat driver rounds).
VERIFY_BUDGET="${PREFLIGHT_VERIFY_BUDGET:-2400}"
echo "== preflight: Verify wall = ${VERIFY_WALL}s (budget ${VERIFY_BUDGET}s) =="
if [ "$VERIFY_WALL" -gt "$VERIFY_BUDGET" ]; then
  echo "== preflight: FAIL — Verify wall ${VERIFY_WALL}s exceeds budget ${VERIFY_BUDGET}s ==" >&2
  exit 1
fi

echo "== preflight: DuckDB oracle compare =="
python3 tools/oracle_check.py "$SF_DIR" "$OUT_DIR"

# Registry size, GENERATED from the Verify dump (one dir per registered
# query; oracle_sql.json holds the oracle-paired subset) — the number
# the docs must quote, so it is printed here instead of hand-counted.
NQ="$(find "$OUT_DIR" -mindepth 1 -maxdepth 1 -type d | wc -l)"
NO="$(python3 -c "import json;print(len(json.load(open('$OUT_DIR/oracle_sql.json'))))")"
echo "== preflight: registry = $NQ queries ($NO with DuckDB oracles) =="
echo "== preflight: ALL GREEN =="
