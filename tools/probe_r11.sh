#!/bin/bash
# Round-11 probe sweep (run on a COMMITTED tree — sbt compiles the
# working tree at each arm). Corpora: /tmp/sf1x10, /tmp/sf1x50 from
# graft.tools.ScaleUp. One arm at a time; output accumulates in
# /tmp/probe_r11.out with greppable [probe-arm] prefixes.
set -u
OUT=/tmp/probe_r11.out
: > $OUT
log() { echo "[probe-arm] $*" >> $OUT; }

run_bench() { # name sfdir only reps mem
  local name=$1 dir=$2 only=$3 reps=$4 mem=${5:-16g}
  log "BENCH $name dir=$dir only=$only"
  SPARK_DRIVER_MEM=$mem SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY=$only SPARK_GRAFT_REPS=$reps \
    sbt -batch 'runMain graft.Bench' 2>/dev/null | grep '"metric"' >> $OUT
}

# 1. SMOTE: candidate-volume A/B at 10x (mandate #2 evidence), then
#    timing at sf0.1 and 10x for the e(10) exponent
log "SMOTE volume A/B 10x"
SPARK_DRIVER_MEM=48g sbt -batch 'runMain graft.tools.SmoteProbe /tmp/sf1x10 volume' 2>/dev/null | grep '"probe"' >> $OUT
log "SMOTE timing sf0.1"
SPARK_DRIVER_MEM=16g sbt -batch 'runMain graft.tools.SmoteProbe /root/testdata/sf0.1' 2>/dev/null | grep '"probe"' >> $OUT
log "SMOTE timing 10x"
SPARK_DRIVER_MEM=48g sbt -batch 'runMain graft.tools.SmoteProbe /tmp/sf1x10' 2>/dev/null | grep '"probe"' >> $OUT

# 2. CapProbe arms (mandate #3 gaps + the round's sn arm): sf0.1 -> 10x;
#    linear arms also 50x
for arm in a07 asof f02 proj lsh sn; do
  for dir in /root/testdata/sf0.1 /tmp/sf1x10; do
    log "CAPPROBE $arm $dir"
    SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.tools.CapProbe $dir $arm 2" 2>/dev/null | grep capprobe >> $OUT
  done
done
for arm in a07 asof f02 proj; do
  log "CAPPROBE $arm /tmp/sf1x50"
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.tools.CapProbe /tmp/sf1x50 $arm 2" 2>/dev/null | grep capprobe >> $OUT
done

# 3. s16 gzip re-probe (mandate #4): 10x and 50x
run_bench s16_10x /tmp/sf1x10 s16_json_roundtrip 2
run_bench s16_50x /tmp/sf1x50 s16_json_roundtrip 2 48g

# 4. mandate #6: n21 / m12d / m28 at 50x (and 10x rows for the pair)
run_bench m6_10x /tmp/sf1x10 n21_rbo,m12d_rf_score,m28_platt 2
run_bench m6_50x /tmp/sf1x50 n21_rbo,m12d_rf_score,m28_platt 2 48g

# 5. the round's new queries at 10x and 50x
NEW=st23_stream_velocity_reorder,st24_stream_ewma_reorder,st25_stream_kll,st26_stream_heavy_hitters,a49_kll_quantiles,a50_heavy_hitters
run_bench new_10x /tmp/sf1x10 $NEW 2
run_bench new_50x /tmp/sf1x50 $NEW 2 48g

# 6. second-batch operators (AMS, sorted-neighborhood, modularity)
NEW2=a51_ams_f2,st27_stream_ams_f2,d21_sorted_neighborhood,g14_modularity,g15_community_move
run_bench new2_sf01 /root/testdata/sf0.1 $NEW2 2
run_bench new2_10x /tmp/sf1x10 $NEW2 2
run_bench new2_50x /tmp/sf1x50 $NEW2 2 48g
log "CAPPROBE sn /tmp/sf1x50"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.tools.CapProbe /tmp/sf1x50 sn 2" 2>/dev/null | grep capprobe >> $OUT

log DONE
