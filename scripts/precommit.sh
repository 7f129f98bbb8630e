#!/usr/bin/env bash
# Pre-commit / end-of-session gate: the minimum that must be green before
# ANY commit lands — r06's round-zeroing lesson (an uncompiled edit swept
# into the end-of-round snapshot empties the driver artifacts for the whole
# round). Compile main+tests + the driver-style smoke in ONE sbt JVM, then
# FAIL on a dirty tree: a passing working tree over an uncommitted fix is
# exactly the state that zeroed round 6. The full oracle gate stays in
# run_gate.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch Test/compile "runMain graft.Smoke" | tee /tmp/precommit_smoke.out

# Gate-count consistency (round-12 directive 4): SURVEY.md's "FINAL gate: N
# queries" claim must equal len(SparkEntry.queries), which the Smoke run
# just printed — the docs froze at 178 in round 11 while the gate shipped
# 179, and typed-not-derived close-out numbers are how that recurs.
# `|| true`: a no-match grep exits 1, and under set -e/pipefail that would
# kill the script HERE — before the guards below that exist to handle
# exactly the no-match cases with a real message / a deliberate skip
actual=$(grep -oE 'gate_queries=[0-9]+' /tmp/precommit_smoke.out | cut -d= -f2 || true)
# LAST match: earlier rounds' historical "FINAL gate: N" claims stay as-is
claimed=$(grep -oE 'FINAL gate: [0-9]+ queries' SURVEY.md | grep -oE '[0-9]+' | tail -1 || true)
if [[ -z "$actual" ]]; then
  echo "FAIL: Smoke did not report gate_queries" >&2
  exit 1
fi
if [[ -n "$claimed" && "$actual" != "$claimed" ]]; then
  echo "FAIL: SURVEY.md claims a $claimed-query gate but SparkEntry.queries has $actual" >&2
  exit 1
fi

if [[ -n "$(git status --porcelain)" ]]; then
  echo "FAIL: working tree dirty — commit or drop before round end:" >&2
  git status --porcelain >&2
  exit 1
fi
echo "precommit: green"
