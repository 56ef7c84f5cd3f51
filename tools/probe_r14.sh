#!/bin/bash
# Round-14 probe queue — ordered so the highest-priority evidence lands
# first if the wall clock cuts the queue:
#
#   A. ANN recall-at-scale (verdict task 1): recall_tiers at 50x/100x —
#      recall@5 per tier (binary/ivf/ivfpq/lsh) vs exact truth on the
#      bounded query sample; the in-run 1x legs give the same-window
#      floor to compare against.
#   B. unigram_train_fertility watch item (task 2): isolated bench
#      repeats=3 + a fresh-JVM Profile of the memoized hard-EM build.
#   C. knn cluster-side pack pair re-pin (task 6): interleaved
#      packed/unpacked cluster4 pairs at 100x on valid densified ids.
#   D. dedup-corpus residual locality tax (task 5): cluster4 100x
#      interleaved legs — baseline / SORT_CKPT=1 / locality.wait=0s /
#      locality.wait=30s, two rounds.
#   E. composed video pipelines to 50x/100x (task 3): frame_mining +
#      bg_curation on both topologies, interleaved, two rounds.
#   F. streaming state probe (task 4): StreamProbe extend/users modes
#      at 50x/100x — per-microbatch state rows vs the active-key bound.
#   G. deep-chain JIT cold tail (task 7): fresh-JVM Profile of
#      pipeline_dedup_corpus under codegen method-size confs.
#
# Runs against a SNAPSHOT of the classes dir so later compiles can't
# mutate classes mid-probe.
set -x
cd /root/repo
SNAP=/tmp/graft_probe_classes_r14
rm -rf "$SNAP"; cp -a target/scala-2.13/classes "$SNAP"
export GRAFT_PROBE_CP="$SNAP:/opt/spark/jars/*"
SF=/root/testdata/sf0.1

# A. recall tiers at 50x and 100x (single 48g; recall is geometry, not topology)
tools/probe.sh -T recall50_s48  SPARK_GRAFT_SHUFFLE=1600 $SF 50  recall_tiers
tools/probe.sh -T recall100_s48 SPARK_GRAFT_SHUFFLE=3200 $SF 100 recall_tiers

# B. unigram fertility watch item: isolated repeats=3 bench + Profile
tools/probe.sh -T unifert_bench -M graft.Bench \
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=unigram_train,unigram_train_fertility \
  SPARK_GRAFT_REPEATS=3
tools/probe.sh -T unifert_prof -n 2 -M graft.Profile $SF unigram_train_fertility

# C. knn cluster pack pair: interleaved packed/unpacked, two rounds
for leg in a b; do
  tools/probe.sh -T knn100_c4_packed_$leg -t cluster4 SPARK_GRAFT_SHUFFLE=3200 $SF 100 knn_graph
  tools/probe.sh -T knn100_c4_unpacked_$leg -t cluster4 SPARK_GRAFT_SHUFFLE=3200 SPARK_GRAFT_KNN_PACK=0 $SF 100 knn_graph
done

# D. dedup-corpus locality-tax experiments: cluster4 interleaved, plus a
#    single-JVM anchor leg per round for the same-window ratio
for leg in a b; do
  tools/probe.sh -T dedup100_s48_$leg $SF 100 dedup_corpus
  tools/probe.sh -T dedup100_c4_base_$leg -t cluster4 $SF 100 dedup_corpus
  tools/probe.sh -T dedup100_c4_sortckpt_$leg -t cluster4 SPARK_GRAFT_SORT_CKPT=1 $SF 100 dedup_corpus
  tools/probe.sh -T dedup100_c4_lw0_$leg -t cluster4 "SPARK_GRAFT_CONF=spark.locality.wait=0s" $SF 100 dedup_corpus
  tools/probe.sh -T dedup100_c4_lw30_$leg -t cluster4 "SPARK_GRAFT_CONF=spark.locality.wait=30s" $SF 100 dedup_corpus
done

# E. composed video pipelines at 50x/100x, both topologies, interleaved
for leg in a b; do
  tools/probe.sh -T vid100_s48_$leg $SF 100 frame_mining,bg_curation
  tools/probe.sh -T vid100_c4_$leg -t cluster4 $SF 100 frame_mining,bg_curation
  tools/probe.sh -T vid50_s48_$leg $SF 50 frame_mining,bg_curation
  tools/probe.sh -T vid50_c4_$leg -t cluster4 $SF 50 frame_mining,bg_curation
done

# F. streaming state probe: both modes at 50x/100x (single topology —
#    state metrics come from the progress API, not task placement)
tools/probe.sh -T stream_ext50   -M graft.StreamProbe $SF 50  extend 16
tools/probe.sh -T stream_ext100  -M graft.StreamProbe $SF 100 extend 16
tools/probe.sh -T stream_usr50   -M graft.StreamProbe $SF 50  users 16
tools/probe.sh -T stream_usr100  -M graft.StreamProbe $SF 100 users 16

# G. deep-chain JIT cold tail: fresh-JVM Profile per conf, two rounds
for leg in a b; do
  tools/probe.sh -T jit_base_$leg -M graft.Profile $SF pipeline_dedup_corpus
  tools/probe.sh -T jit_hml8k_$leg -M graft.Profile \
    "SPARK_GRAFT_CONF=spark.sql.codegen.hugeMethodLimit=8000" $SF pipeline_dedup_corpus
  tools/probe.sh -T jit_split256_$leg -M graft.Profile \
    "SPARK_GRAFT_CONF=spark.sql.codegen.methodSplitThreshold=256" $SF pipeline_dedup_corpus
done

echo ALL R14 PROBES DONE
