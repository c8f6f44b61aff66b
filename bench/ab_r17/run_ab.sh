#!/bin/bash
# Interleaved r15-vs-r16 full-suite bench A/B (VERDICT r16 item 1).
# Per-side /tmp/graft_q* state isolation via stash-swap; one warmup
# run per side builds its state; then 4 interleaved pairs with
# alternating order: r15 r16 | r16 r15 | r15 r16 | r16 r15.
set -u
AB=/tmp/ab
log() { echo "[$(date +%H:%M:%S)] $*" >> $AB/driver.log; }

stash_current_to() { # move any live /tmp/graft_q* into side stash
  local side=$1
  shopt -s nullglob
  for d in /tmp/graft_q*; do mv "$d" "$AB/state_$side/"; done
}
restore_from() {
  local side=$1
  shopt -s nullglob
  for d in "$AB/state_$side"/graft_q*; do mv "$d" /tmp/; done
}

LIVE=none   # which side's state is currently live in /tmp
run_one() { # run_one <side> <tag>
  local side=$1 tag=$2
  if [ "$LIVE" != "$side" ]; then
    [ "$LIVE" != "none" ] && stash_current_to "$LIVE"
    restore_from "$side"
    LIVE=$side
  fi
  local wt=/tmp/ab_$side
  log "run $tag ($side) starting; load=$(cut -d' ' -f1 /proc/loadavg)"
  ( cd "$wt" && \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ITERS=1 \
    SPARK_GRAFT_BENCH_FULL=$AB/out/$tag.json \
    sbt -batch "runMain graft.Bench" > $AB/out/$tag.stdout 2>&1 )
  log "run $tag ($side) done rc=$? load=$(cut -d' ' -f1 /proc/loadavg)"
}

log "=== precompile ==="
( cd /tmp/ab_r15 && sbt -batch compile > $AB/out/compile_r15.log 2>&1 ); log "r15 compile rc=$?"
( cd /tmp/ab_r16 && sbt -batch compile > $AB/out/compile_r16.log 2>&1 ); log "r16 compile rc=$?"

log "=== warmup (state build, unmeasured) ==="
run_one r15 warmup_r15
run_one r16 warmup_r16

log "=== measured pairs ==="
run_one r15 p1_r15; run_one r16 p1_r16
run_one r16 p2_r16; run_one r15 p2_r15
run_one r15 p3_r15; run_one r16 p3_r16
run_one r16 p4_r16; run_one r15 p4_r15
stash_current_to "$LIVE"
log "=== all done ==="
