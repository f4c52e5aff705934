#!/bin/bash
# Spark-side dumper for the full-catalog sf10 oracle sweep (round 11).
# Runs graft.Verify in crash-isolated batches (a single OOM/refusal must
# not take down the rest of the catalog), logging per-batch stderr to
# $LOGDIR. Batches come from $1 (comma-joined names, one batch per line).
set -u
BATCHES=${1:-/tmp/sf10_batches.txt}
SF=${2:-testdata-sf10}
OUT=${3:-verify-sf10}
LOGDIR=${4:-/tmp/sf10_logs}
mkdir -p "$LOGDIR" "$OUT"
i=0
while IFS= read -r batch; do
  i=$((i+1))
  echo "=== batch $i: $batch ==="
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$batch" \
    timeout 3600 tools/jrun.sh graft.Verify "$SF" "$OUT" \
    > "$LOGDIR/batch_$i.out" 2> "$LOGDIR/batch_$i.err"
  rc=$?
  grep -h "\[verify\]" "$LOGDIR/batch_$i.err" | grep -v "persistent RDDs"
  [ $rc -ne 0 ] && echo "batch $i rc=$rc (timeout/crash — members without dumps recorded as such)"
done < "$BATCHES"
echo "=== dump sweep complete ==="
