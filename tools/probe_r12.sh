#!/bin/bash
# Round-12 probe queue — a short list of tools/probe.sh invocations (the
# committed parameterized harness), ordered so the highest-priority
# evidence lands first if the wall clock cuts the queue:
#
#   A. task-5 drift re-pin: isolated Bench runs for gate_area_ratio,
#      explode_boxes, filter_score_exact1 at sf0.1 (one JVM each)
#   B. task-1 A/B: 100x knn_graph on 4 executors, packed vs unpacked
#      proposal exchange, interleaved same-window min-of-2 each side
#   C. task-1 re-measure: 100x knn_graph single-JVM 48g packed min-of-2
#   D. task-3: incremental_dedup + dedup_corpus at 100x and 50x on both
#      topologies (first samples early, second samples later)
#   E. task-6: full-suite Bench at sf0.1 on the 4-executor topology
#
# Runs against a SNAPSHOT of the classes dir so later compiles can't
# mutate classes mid-probe.
set -x
cd /root/repo
SNAP=/tmp/graft_probe_classes_r12
rm -rf "$SNAP"; cp -a target/scala-2.13/classes "$SNAP"
export GRAFT_PROBE_CP="$SNAP:/opt/spark/jars/*"
SF=/root/testdata/sf0.1

# A. isolated single-query bench re-pins (task 5)
for q in gate_area_ratio explode_boxes filter_score_exact1; do
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$q SPARK_GRAFT_REPEATS=3 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r12_iso_$q.json \
    tools/probe.sh -T iso_$q -M graft.Bench
done

# B. 100x knn cluster4: packed / unpacked interleaved, min-of-2 each
tools/probe.sh -T knn100_c4_packed_a -t cluster4 SPARK_GRAFT_SHUFFLE=3200 $SF 100 knn_graph
tools/probe.sh -T knn100_c4_unpacked_a -t cluster4 SPARK_GRAFT_SHUFFLE=3200 SPARK_GRAFT_KNN_PACK=0 $SF 100 knn_graph
tools/probe.sh -T knn100_c4_packed_b -t cluster4 SPARK_GRAFT_SHUFFLE=3200 $SF 100 knn_graph
tools/probe.sh -T knn100_c4_unpacked_b -t cluster4 SPARK_GRAFT_SHUFFLE=3200 SPARK_GRAFT_KNN_PACK=0 $SF 100 knn_graph

# C. 100x knn single-JVM 48g packed, min-of-2 (same window family as B)
tools/probe.sh -T knn100_s48_packed -n 2 SPARK_GRAFT_SHUFFLE=3200 $SF 100 knn_graph

# D. dedup family tiers (task 3): 100x first samples, 50x first samples,
#    then second samples
tools/probe.sh -T dedup100_s48_a $SF 100 incremental_dedup,dedup_corpus
tools/probe.sh -T dedup100_c4_a -t cluster4 $SF 100 incremental_dedup,dedup_corpus
tools/probe.sh -T dedup50_s48_a $SF 50 incremental_dedup,dedup_corpus
tools/probe.sh -T dedup50_c4_a -t cluster4 $SF 50 incremental_dedup,dedup_corpus

# E. full-suite cluster bench (task 6)
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_BENCH_OUT=/root/repo/bench_cluster_sf0.1.json \
  tools/probe.sh -T bench_c4_full -t cluster4 -M graft.Bench

# D'. second samples for the dedup tiers (min-of-2 closure)
tools/probe.sh -T dedup100_s48_b $SF 100 incremental_dedup,dedup_corpus
tools/probe.sh -T dedup100_c4_b -t cluster4 $SF 100 incremental_dedup,dedup_corpus
tools/probe.sh -T dedup50_s48_b $SF 50 incremental_dedup,dedup_corpus
tools/probe.sh -T dedup50_c4_b -t cluster4 $SF 50 incremental_dedup,dedup_corpus

echo ALL R12 PROBES DONE
