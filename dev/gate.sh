#!/usr/bin/env bash
# Full local gate in one command: compile + tests (incl. golden suites) +
# Verify/oracle at sf0.01 + flagship smoke. Bench is separate (slow):
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== sbt test =="
sbt -batch test 2>&1 | grep -E "Tests:|All tests passed|FAILED" | tail -3

echo "== Verify + DuckDB oracle (sf0.01) =="
rm -rf /tmp/vout
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout" 2>&1 | grep "\[verify\]" || true
python3 dev/check_oracle.py /tmp/vout /root/testdata/sf0.01 | tail -3

echo "== EntrySmoke =="
sbt -batch "runMain graft.EntrySmoke" 2>&1 | grep ENTRY_ROWS
