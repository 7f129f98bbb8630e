#!/usr/bin/env bash
# Pre-commit / end-of-session gate: the minimum that must be green before
# ANY commit lands — r06's round-zeroing lesson (an uncompiled edit swept
# into the end-of-round snapshot empties the driver artifacts for the whole
# round). Compile main+tests, then the driver-style smoke. Fast (~2 min);
# the full oracle gate stays in run_gate.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch Test/compile
sbt -batch "runMain graft.Smoke"

if [[ -n "$(git status --porcelain)" ]]; then
  echo "WARNING: working tree dirty — commit or drop before round end:" >&2
  git status --porcelain >&2
fi
echo "precommit: green"
