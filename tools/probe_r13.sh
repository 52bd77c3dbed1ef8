#!/bin/bash
# Round-13 probe sweep (run on a COMMITTED tree — sbt compiles the
# working tree at each arm). Corpora: /tmp/sf1x10, /tmp/sf1x50 from
# graft.tools.ScaleUp (reused from r11/r12 — data only).
set -u
OUT=/tmp/probe_r13.out
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
NEW=t31_ffd_pack,t32_unigram_train,t33_unigram_segment,g18_louvain_full,g18b_louvain_trace,st33_stream_nextfit_pack
run_bench new_sf01 /root/testdata/sf0.1 $NEW 2
run_bench new_10x /tmp/sf1x10 $NEW 2
run_bench new_50x /tmp/sf1x50 $NEW 2 48g

# 2. mandate #1's churn axis: rotating entity population at 10x —
#    KLL/MG per-entity state with the eviction horizon on vs off;
#    expect state_rows_final ~ 2 x residents (on) vs epochs x
#    residents (off)
log "CHURN 10x epochs=10 residents=2000"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 \
  sbt -batch 'runMain graft.tools.ChurnProbe /tmp/sf1x10 10 2000 2' \
  2>/dev/null | grep churnprobe >> $OUT

echo "probe_r13 done" >> $OUT
