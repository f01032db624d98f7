#!/bin/bash
# Round-stamp chore, mechanized (the round-12 verdict's perennial nit:
# driver-written artifacts land AFTER the builder's last commit and sit
# as working-tree drift at judge time, four rounds running).
#
# Run at the START of round N+1 (or any time the tree is dirty with
# driver/judge artifacts): commits the previous round's BENCH_r*/
# CORRECTNESS_r* and any refreshed judge artifacts in one commit, zero
# code. Then stamp THIS round's canonical captures as you take them
# (cp bench_full.json BENCH_FULL_r<N>.json && git add ...).
#
# Usage: scripts/stamp_round.sh <N-of-the-artifacts>   e.g. 13
set -e
cd "$(dirname "$0")/.."
N=${1:?usage: stamp_round.sh <round number of the artifacts>}
git add -A -- "BENCH_r${N}.json" "CORRECTNESS_r${N}.json" \
  bench_full.json bench_last.json LEAKCHECK.json COPYCHECK.json \
  VERDICT.md ADVICE.md sched_probe.json artifact_probe.json \
  stream_bench.json soak.json 2>/dev/null || true
if git diff --cached --quiet; then
  echo "nothing to stamp: tree already clean for round $N artifacts"
else
  git commit -m "round $N: commit driver/judge artifacts"
  echo "stamped round $N artifacts"
fi
