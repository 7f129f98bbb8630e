#!/usr/bin/env bash
# Local replica of the driver's full per-round gate:
#   compile → smoke (entry>0 @ sf0.001) → verify+oracle (@ sf0.01) → bench (@ sf0.1)
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch compile
sbt -batch "runMain graft.Smoke"

OUT=${1:-/tmp/verify_gate}
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
python scripts/check_oracle.py /root/testdata/sf0.01 "$OUT"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | sed 's/^\[info\] //'
