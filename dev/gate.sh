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

# 10x scale gate: the same 288 oracles at sf0.1 (catches overflow,
# precision drift, and cardinality-dependent divergence that hides at
# sf0.01 — round 8 found five). Skip with GATE_SKIP_SF01=1 when iterating.
if [ "${GATE_SKIP_SF01:-0}" != "1" ]; then
  echo "== Verify + DuckDB oracle (sf0.1) =="
  rm -rf /tmp/vout_sf01
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vout_sf01" 2>&1 | grep "\[verify\]" || true
  python3 dev/check_oracle.py /tmp/vout_sf01 /root/testdata/sf0.1 | tail -3
fi

echo "== EntrySmoke =="
sbt -batch "runMain graft.EntrySmoke" 2>&1 | grep ENTRY_ROWS
