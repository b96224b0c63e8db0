#!/usr/bin/env bash
# End-of-round snapshot gate. The snapshot commit has shipped unverified
# code twice (r5: compile break from an unescaped '\s'; r6: red
# PlanLint on two newly registered queries) — both times because the
# closing commit skipped the full suite. This script makes the gate
# unconditional: it runs tools/preflight.sh in FULL mode (never --fast)
# and only commits on green, recording the gate run in the message.
#
#   tools/snapshot.sh "commit message"
#
# Refuses to commit on ANY nonzero preflight exit.
set -euo pipefail
cd "$(dirname "$0")/.."

MSG="${1:?usage: tools/snapshot.sh \"commit message\"}"

echo "== snapshot gate: tools/preflight.sh (full) =="
if ! tools/preflight.sh; then
  echo "== snapshot gate: PREFLIGHT RED — refusing to commit ==" >&2
  exit 1
fi

git add -A
git commit -m "$MSG" -m "Gate: tools/preflight.sh (full: compile + sbt test + Verify + DuckDB oracle) green on this tree."
echo "== snapshot gate: committed on green =="
