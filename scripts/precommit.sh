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

sbt -batch Test/compile "runMain graft.Smoke"

if [[ -n "$(git status --porcelain)" ]]; then
  echo "FAIL: working tree dirty — commit or drop before round end:" >&2
  git status --porcelain >&2
  exit 1
fi
echo "precommit: green"
