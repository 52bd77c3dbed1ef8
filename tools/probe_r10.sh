#!/bin/bash
# Round-10 asymptote probe (r9 verdict mandates #3 + #7): the round-9
# operators that have never seen the protocol — m22 boosted stumps,
# g11 pointer-jumping components, g12 Bellman-Ford, a43 Spearman,
# a44 Kruskal-Wallis, a46 Theil-Sen, st20 incremental eval metrics,
# st21 streaming A/B, n17/n17b kNN vote — plus the uncapped LOF family
# (LofProbe: n16/n16b are vec_id<300-capped in the driver suite, so
# their driver curves are vacuous) and SMOTE (SmoteProbe, mandate #7).
# Protocol: sf0.1 -> 10x -> 50x, reps=2 best-of, 48g driver heap,
# settle between scales, quiet box. ANN nPlanes grows with the corpus
# (n/cells ~ constant): 4 / 7 / 9.
set -u
OUT=${OUT:-/tmp/probe_r10.jsonl}
QS=m22_boosted_stumps,g11_components,g12_shortest_paths,a43_spearman,a44_kruskal_wallis,a46_theil_sen,st20_stream_eval_metrics,st21_stream_ab_test,n17_knn_vote,n17b_knn_vote_ann
: > "$OUT"
for SF in /root/testdata/sf0.1 /tmp/sf1x10 /tmp/sf1x50; do
  sleep "${SETTLE:-90}"
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_ONLY=$QS SPARK_GRAFT_REPS=2 \
    sbt -batch 'runMain graft.Bench' 2>&1 | grep '"metric"' >> "$OUT"
done
# uncapped LOF: exact arm only to 10x (n^2 — 50x is ~1e10 pairs, the
# arm exists to SHOW the quadratic term, not to suffer it); ANN arm to
# 50x with corpus-scaled nPlanes
for ARGS in "/root/testdata/sf0.1 exact" "/tmp/sf1x10 exact" \
            "/root/testdata/sf0.1 ann 4" "/tmp/sf1x10 ann 7" \
            "/tmp/sf1x50 ann 9"; do
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.tools.LofProbe $ARGS" 2>&1 \
    | grep '"probe"' >> "$OUT"
done
for SF in /root/testdata/sf0.1 /tmp/sf1x10 /tmp/sf1x50; do
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.tools.SmoteProbe $SF" 2>&1 \
    | grep '"probe"' >> "$OUT"
done
echo PROBE_DONE
