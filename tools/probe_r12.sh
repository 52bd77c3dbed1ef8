#!/bin/bash
# Round-12 probe sweep (run on a COMMITTED tree — sbt compiles the
# working tree at each arm). Corpora: /tmp/sf1x10, /tmp/sf1x50 from
# graft.tools.ScaleUp (reused from r11 — data only, tool unchanged).
# One arm at a time; output accumulates in /tmp/probe_r12.out with
# greppable [probe-arm] prefixes.
set -u
OUT=/tmp/probe_r12.out
: > $OUT
log() { echo "[probe-arm] $*" >> $OUT; }

run_bench() { # name sfdir only reps mem
  local name=$1 dir=$2 only=$3 reps=$4 mem=${5:-16g}
  log "BENCH $name dir=$dir only=$only"
  SPARK_DRIVER_MEM=$mem SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY=$only SPARK_GRAFT_REPS=$reps \
    sbt -batch 'runMain graft.Bench' 2>/dev/null | grep '"metric"' >> $OUT
}

# 1. the round's new queries at sf0.1, 10x, 50x
NEW=w22_holt_winters,st29_stream_holt_winters,st30_stream_kll_state,g17_louvain_coarsen
run_bench new_sf01 /root/testdata/sf0.1 $NEW 2
run_bench new_10x /tmp/sf1x10 $NEW 2
run_bench new_50x /tmp/sf1x50 $NEW 2 48g

# 2. mandate #6: the reorder family's LATENESS sweep at 10x —
#    L in {15 min, 1 h, 6 h}, stateful parallelism at the documented
#    scale knob (results partition-invariant; st23's oracle row owns
#    correctness)
log "REORDER L-sweep 10x parts=8"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_STREAM_PARTS=8 \
  sbt -batch 'runMain graft.tools.ReorderProbe /tmp/sf1x10 15,60,360 2' \
  2>/dev/null | grep reorderprobe >> $OUT

# 3. eviction-path overhead A/B at 10x is not benchable through the
#    driver (no driver query sets a horizon by design — horizon off
#    keeps oracle rows exact); the StreamSpec eviction cases plus the
#    L-sweep's state_bytes axis are the evidence.

echo "probe_r12 done" >> $OUT
