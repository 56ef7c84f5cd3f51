#!/bin/bash
# Round-13 probe queue — ordered so the highest-priority evidence lands
# first if the wall clock cuts the queue:
#
#   A. knn_graph re-measure after the pack-domain fix + id densification
#      (ADVICE r12 high/medium + verdict task 2): 100x single-JVM
#      packed/unpacked/aliased-salt interleaved same-window, then 50x
#      packed min-of-2. The packed legs double as the FIXED side of the
#      fixed-vs-aliased corpus CPU pair.
#   B. dedup_corpus fused-chain tax (verdict task 1): 100x single vs
#      cluster4 interleaved min-of-2, plus CKPT_SER=1 cluster4 A/B.
#   C. tokenizer-trainer tiers (task 4): all four families at 50x/100x
#      on the preferred single topology, two samples each.
#   D. dispatch floor (task 6): dispatch_floor at 100x on both
#      topologies, min-of-2.
#
# Runs against a SNAPSHOT of the classes dir so later compiles can't
# mutate classes mid-probe.
set -x
cd /root/repo
SNAP=/tmp/graft_probe_classes_r13
rm -rf "$SNAP"; cp -a target/scala-2.13/classes "$SNAP"
export GRAFT_PROBE_CP="$SNAP:/opt/spark/jars/*"
SF=/root/testdata/sf0.1

# A. 100x knn single-JVM 48g: packed(fixed) / unpacked(fixed) /
#    packed(aliased-salt) interleaved, two rounds
for leg in a b; do
  tools/probe.sh -T knn100_s48_packed_$leg  SPARK_GRAFT_SHUFFLE=3200 $SF 100 knn_graph
  tools/probe.sh -T knn100_s48_unpacked_$leg SPARK_GRAFT_SHUFFLE=3200 SPARK_GRAFT_KNN_PACK=0 $SF 100 knn_graph
  tools/probe.sh -T knn100_s48_aliased_$leg SPARK_GRAFT_SHUFFLE=3200 SPARK_GRAFT_SALT_ALIASED=1 $SF 100 knn_graph
done
# A'. 50x knn single packed min-of-2
tools/probe.sh -T knn50_s48_packed -n 2 SPARK_GRAFT_SHUFFLE=1600 $SF 50 knn_graph

# B. dedup_corpus 100x: single / cluster4 / cluster4+SER interleaved
for leg in a b; do
  tools/probe.sh -T dedup100_s48_$leg $SF 100 dedup_corpus
  tools/probe.sh -T dedup100_c4_$leg -t cluster4 $SF 100 dedup_corpus
  tools/probe.sh -T dedup100_c4ser_$leg -t cluster4 SPARK_GRAFT_CKPT_SER=1 $SF 100 dedup_corpus
done

# C. tokenizer tiers, two samples per tier
for leg in a b; do
  tools/probe.sh -T tok100_s48_$leg $SF 100 bpe_train,wordpiece_train,unigram_train,unigram_train_em
  tools/probe.sh -T tok50_s48_$leg  $SF 50  bpe_train,wordpiece_train,unigram_train,unigram_train_em
done

# D. dispatch floor on both topologies
tools/probe.sh -T dispatch_s48 -n 2 $SF 100 dispatch_floor
tools/probe.sh -T dispatch_c4 -t cluster4 -n 2 $SF 100 dispatch_floor

echo ALL R13 PROBES DONE
