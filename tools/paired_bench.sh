#!/bin/bash
# Paired-worktree A/B bench (round-11: the rounds-8/10 manual drift
# protocol as one command). Builds the baseline sha in a gitignored
# worktree, then alternates FULL bench legs baseline/tip/baseline/tip...
# on the same box, so host-noise windows hit both sides equally; the
# per-query paired ratios land in paired_baseline.json, which graft.Bench
# embeds as the "paired" section of its next JSON line (self-describing:
# shas, sf, legs, timestamp — staleness is visible, never implied away).
#
# Usage: tools/paired_bench.sh <baseline-sha> [sf_dir] [legs_per_side] [only] [out]
#   PAIRED_STREAM=1   additionally alternates a STREAM leg per side
#                     (the bench's e2e-latency + load-scaled throughput
#                     sweep, no batch catalog) and merges a "stream"
#                     ratio section — round-11 verdict: stream drift was
#                     unadjudicated because the paired tool only covered
#                     the batch catalog.
#   out               defaults to paired_baseline.json (what graft.Bench
#                     embeds); targeted adjudication runs should name
#                     their own file so the embedded full-catalog
#                     pairing is not clobbered by a subset.
set -euo pipefail
SHA=$1
SF=${2:-/root/testdata/sf0.1}
LEGS=${3:-2}
ONLY=${4:-}
OUT=${5:-paired_baseline.json}
WT=.wt-baseline
ROOT=$(pwd)
TIP=$(git rev-parse --short HEAD)
BASE=$(git rev-parse --short "$SHA")

git worktree remove --force $WT 2>/dev/null || true
# stale leg files from a previously aborted run (set -e exits before the
# end-of-script rm) would be globbed by paired_merge.py and silently mix
# a different baseline/tip pair into this run's ratios — clear them first
rm -f .wt-paired-*.json
git worktree add --force $WT "$SHA" >/dev/null
echo "[paired] building baseline $BASE in $WT"
# copyResources too: plain `compile` leaves META-INF/services out of the
# worktree's classes dir, so the graft-feed V2 streaming source is
# unregistered and every baseline STREAM leg dies DATA_SOURCE_NOT_FOUND
# (degrading to an empty stream section — how r12's first PAIRED_STREAM
# run silently lost its stream ratios)
(cd $WT && sbt -batch "compile; Compile/copyResources" >/dev/null)
sbt -batch "compile; Compile/copyResources" >/dev/null   # tip classes current

run_leg() { # $1=side(base|tip) $2=leg-index $3=mode(batch|stream)
  local side=$1 leg=$2 mode=${3:-batch} out classes dir
  out=$(pwd)/.wt-paired-$side-$mode-$leg.json
  if [ "$side" = base ]; then classes=$(pwd)/$WT/target/scala-2.13/classes; dir=$WT
  else classes=$(pwd)/target/scala-2.13/classes; dir=.; fi
  echo "[paired] leg $leg $side $mode"
  # always the TIP's runner (the baseline tree's jrun.sh may predate the
  # GRAFT_CLASSES override); cwd stays in the leg's tree for PLANS.md
  if [ "$mode" = stream ]; then
    # stream-only: an allowlist that matches no catalog query skips the
    # batch passes entirely; the stream block (e2e + throughput) runs
    (cd $dir && env GRAFT_CLASSES=$classes SPARK_GRAFT_SF_DIR=$SF \
      SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
      SPARK_GRAFT_BENCH_ONLY=__stream_only__ SPARK_GRAFT_BENCH_FULL=$out \
      "$ROOT"/tools/jrun.sh graft.Bench >/dev/null)
  else
    (cd $dir && env GRAFT_CLASSES=$classes SPARK_GRAFT_SF_DIR=$SF \
      SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
      SPARK_GRAFT_BENCH_NO_STREAM=1 SPARK_GRAFT_BENCH_FULL=$out \
      ${ONLY:+SPARK_GRAFT_BENCH_ONLY=$ONLY} \
      "$ROOT"/tools/jrun.sh graft.Bench >/dev/null)
  fi
}

for leg in $(seq 1 "$LEGS"); do
  run_leg base "$leg" batch
  run_leg tip "$leg" batch
  if [ -n "${PAIRED_STREAM:-}" ]; then
    run_leg base "$leg" stream
    run_leg tip "$leg" stream
  fi
done

python3 tools/paired_merge.py "$BASE" "$TIP" "$SF" "$LEGS" \
  > "$OUT"
git worktree remove --force $WT
rm -f .wt-paired-*.json
echo "[paired] wrote $OUT:"
python3 -c "
import json, sys; d = json.load(open('$OUT'))
print('  total base %.1fs tip %.1fs ratio %.2fx' %
      (d['total_base'], d['total_tip'], d['ratio_total']))
worst = sorted(d['queries'].items(), key=lambda kv: -kv[1]['ratio'])[:5]
for k, v in worst:
    print('  %-28s base %6.2f tip %6.2f ratio %.2fx' %
          (k, v['base'], v['tip'], v['ratio']))
for k, v in sorted(d.get('stream', {}).items()):
    print('  stream %-24s base %8.3f tip %8.3f ratio %.2fx' %
          (k, v['base'], v['tip'], v['ratio']))"
