#!/usr/bin/env bash
# Session-factor control: rebuild the BASELINE-frozen commit in a detached
# worktree and run the SAME full bench in the same session, so whole-session
# ambient drift (measured up to 1.7x on this shared box) can be divided out
# of the round's raw ratio before reading anything into per-query numbers.
#
# Standing end-of-round procedure (BASELINE.md "Comparison rule"):
#   1. Run the round's own bench (BENCH_LOCAL_latest.json / BENCH_r{N}).
#   2. Run THIS script immediately after, same box:
#        scripts/bench_control.sh <frozen-commit> [out.json]
#   3. Report raw ratio AND raw/control — the session-normalized ratio is
#      the one the 2x criterion applies to.
set -euo pipefail
FROZEN=${1:?usage: bench_control.sh <frozen-commit> [out.json]}
OUT=${2:-BENCH_CONTROL_latest.json}
# Absolutize before the cd into the worktree; an already-absolute out.json
# must pass through untouched (prefixing it with $PWD would mangle it).
case "$OUT" in
  /*) ABS_OUT=$OUT ;;
  *)  ABS_OUT=$PWD/$OUT ;;
esac
WT=$(mktemp -d /tmp/graft_control.XXXX)
git worktree add --detach "$WT" "$FROZEN"
trap 'git worktree remove --force "$WT"' EXIT
(cd "$WT" && SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_BENCH_REPS=${SPARK_GRAFT_BENCH_REPS:-3} \
  SPARK_GRAFT_BENCH_OUT="$ABS_OUT" \
  sbt -batch "runMain graft.Bench")
echo "control written to $OUT (frozen commit $FROZEN)"
