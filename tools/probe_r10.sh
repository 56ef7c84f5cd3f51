#!/bin/bash
# Round-10 scale-probe queue: two-executor same-window pairs for the
# steepest non-knn families, then the knn_graph single-JVM 48g 50x run
# under the new chunked NN-descent (working-set bound). Sequential on
# purpose: same-window pairs are the noise-robust comparison on this
# shared host. Outputs append to /tmp/probe_r10_*.log.
set -x
cd /root/repo
FAMS=semdedup,lsh_calib,incremental_dedup,dedup_corpus

# A. single-JVM (local[32], 48g sbt heap) 20x — the same-window anchor
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 20 $FAMS" \
  > /tmp/probe_r10_single20.log 2>&1

# B. two-executor (2x24g) 20x — the paired measurement
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER="local-cluster[2,16,26624]" SPARK_GRAFT_EXEC_MEM=24g \
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 20 $FAMS" \
  > /tmp/probe_r10_cluster20.log 2>&1

# C. two-executor 50x for the two cheap steep families (per-item slope leg)
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER="local-cluster[2,16,26624]" SPARK_GRAFT_EXEC_MEM=24g \
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 50 semdedup,lsh_calib" \
  > /tmp/probe_r10_cluster50.log 2>&1

# D. knn_graph 50x on a SINGLE 48g JVM with chunked NN-descent
#    (auto: 160M proposals / 96M target = 2 slices; partitions ∝ data)
SPARK_GRAFT_SHUFFLE=1600 \
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 50 knn_graph" \
  > /tmp/probe_r10_knn50_chunked.log 2>&1

echo ALL PROBES DONE
