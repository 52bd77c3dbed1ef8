#!/bin/bash
# Round-8 asymptote probe: the r7 top-exponent queries + decoupling
# twins, at sf0.1 -> 10x -> 50x, reps=2, 48g driver heap, 90s settle
# between scales. Emits one bench JSON line per scale to $OUT.
set -u
OUT=${OUT:-/tmp/probe_r8b.jsonl}
QS=d02_minhash_lsh,e01_eval_metrics,g03_triangles,j10_geo_radius_join,m15_naive_bayes,m15b_naive_bayes_mindf,t22_bm25_retrieval,t22b_bm25_fixed_queries
: > "$OUT"
for SF in /root/testdata/sf0.1 /tmp/sf1x10 /tmp/sf1x50; do
  sleep 90
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_ONLY=$QS SPARK_GRAFT_REPS=2 \
    sbt -batch 'runMain graft.Bench' 2>&1 | grep '"metric"' >> "$OUT"
done
echo PROBE_DONE
