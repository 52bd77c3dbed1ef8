#!/bin/bash
# Round-9 asymptote probe (r8 verdict #3): the round-8 operators that
# were only 10x-probed (g09 g10 t27 c03 n15 sm13) plus the prefix-
# filter join family that has never seen 50x (d14 d15 d20 — candidate
# volume depends on the df distribution, which the shifted-copy corpus
# reshapes at scale). Same protocol as probe_r8: sf0.1 -> 10x -> 50x,
# reps=2, 48g driver heap, 90s settle between scales, quiet box.
set -u
OUT=${OUT:-/tmp/probe_r9.jsonl}
QS=g09_kcore,g10_label_spread,t27_ngram_novelty,c03_pareto_docs,n15_rrf_fusion,sm13_kcenter_coreset,d14_setjoin_prefix,d15_entity_resolution,d20_containment
: > "$OUT"
for SF in /root/testdata/sf0.1 /tmp/sf1x10 /tmp/sf1x50; do
  sleep 90
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_ONLY=$QS SPARK_GRAFT_REPS=2 \
    sbt -batch 'runMain graft.Bench' 2>&1 | grep '"metric"' >> "$OUT"
done
echo PROBE_DONE
