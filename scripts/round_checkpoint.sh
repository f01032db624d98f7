#!/bin/bash
# Round-end checkpoint: run every gate the round must close with, in
# order, and stop at the first red one. Encodes the checklist that was
# previously carried in prose so no round can skip a gate by accident:
#
#   1. compile
#   2. full test suite
#   3. full Verify + DuckDB oracle at sf0.01 (the driver's gate)
#   4. full Verify + DuckDB oracle at sf0.1  (boundary-value classes —
#      div bucketing, HUGEINT promotion, decimal-literal arithmetic —
#      only bite beyond sf0.01; writes CORRECTNESS_SF01_local.json)
#   5. decimal-literal lint (the t23 class: bare decimal literals in
#      oracle SQL whose Spark twin computes in DOUBLE — semantic
#      original-vs-CAST-to-DOUBLE compare at sf0.1 + swept-safe ratchet)
#   6. plan audit regeneration (row count must equal query count)
#   7. generated coverage ledger (fails on any ungated rows-only query)
#   8. bench adjudication (round 14 — so the honest-measurement
#      machinery cannot be skipped by habit): when GRAFT_ROUND=N is set
#      and this round's canonical capture BENCH_FULL_rN.json exists,
#      run diff_bench against the previous round WITH every same-round
#      sibling capture as --confirm, then the cumulative trend gate
#      (gen_trend.py). Skipped with a visible notice otherwise.
#
# The sf0.1 bench is run separately (scripts position it on an idle
# machine — timing under checkpoint load would be weather, not signal).
set -e
cd "$(dirname "$0")/.."

echo "=== [1/7] compile"
sbt -batch compile

echo "=== [2/7] full test suite"
sbt -batch test

echo "=== [3/7] Verify + oracle @ sf0.01"
rm -rf /tmp/ckpt_v001
sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/ckpt_v001'
python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/ckpt_v001

echo "=== [4/7] Verify + oracle @ sf0.1"
rm -rf /tmp/ckpt_v01
SPARK_GRAFT_CPUS=16 sbt -batch \
  'runMain graft.Verify /root/testdata/sf0.1 /tmp/ckpt_v01'
python3 scripts/check_oracle.py /root/testdata/sf0.1 /tmp/ckpt_v01 \
  CORRECTNESS_SF01_local.json

echo "=== [5/7] decimal-literal lint @ sf0.1"
python3 scripts/lint_decimals.py /root/testdata/sf0.001 --selftest
python3 scripts/lint_decimals.py /root/testdata/sf0.1 /tmp/ckpt_v01

echo "=== [6/7] plan audit"
sbt -batch 'runMain graft.PlanAudit /root/testdata/sf0.001'
audit_rows=$(grep -cE '^\| [a-z]+[0-9]' docs/PLAN_AUDIT.md)
echo "plan audit rows: $audit_rows"

echo "=== [6.5/7] multi-scan ratchet"
python3 scripts/check_scans.py

echo "=== [7/7] coverage ledger"
python3 scripts/gen_ledger.py CORRECTNESS_SF01_local.json > docs/COVERAGE.md
if [ "$audit_rows" -ne "$(grep -cE '^\| [a-z]+[0-9]' docs/COVERAGE.md)" ]; then
  echo "FATAL: plan-audit row count != ledger row count" >&2
  exit 1
fi

echo "=== [8/8] bench adjudication (diff vs last round + cumulative trend)"
if [ -n "${GRAFT_ROUND:-}" ] && [ -f "BENCH_FULL_r${GRAFT_ROUND}.json" ]; then
  prev=$((GRAFT_ROUND - 1))
  while [ $prev -gt 0 ] && [ ! -f "BENCH_FULL_r${prev}.json" ]; do
    prev=$((prev - 1))
  done
  confirms=""
  for sib in BENCH_FULL_r${GRAFT_ROUND}[a-z].json; do
    [ -f "$sib" ] && confirms="$confirms --confirm $sib"
  done
  # shellcheck disable=SC2086
  python3 scripts/diff_bench.py "BENCH_FULL_r${prev}.json" \
    "BENCH_FULL_r${GRAFT_ROUND}.json" $confirms
  python3 scripts/gen_trend.py > docs/TREND.md
  tail -1 docs/TREND.md
else
  echo "SKIPPED: set GRAFT_ROUND=N and stamp BENCH_FULL_rN.json first"
  echo "(the bench gates did NOT run — the checkpoint is only green"
  echo " for code; rerun with the round's captures before closing)"
fi

echo "=== checkpoint green"
