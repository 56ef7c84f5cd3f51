#!/bin/bash
# Round-10 probe queue, part 2 — launched right after probe_r10.sh run D
# so E pairs with D in the same host window:
#   E. knn_graph 50x on the SAME single 48g JVM config but with chunking
#      DISABLED (chunk target 10^12 -> 1 slice): the clean same-window
#      A/B for the chunked-NN-descent working-set claim.
#   F/G. second samples of the 20x single-JVM and two-executor family
#      runs (min-of-2 discipline: cross-window tcpu swings up to ~3x on
#      this box, so every published cell quotes the per-config MIN).
set -x
cd /root/repo
FAMS=semdedup,lsh_calib,incremental_dedup,dedup_corpus

# E. knn 50x single-JVM 48g, chunking OFF (same window as run D)
SPARK_GRAFT_SHUFFLE=1600 SPARK_GRAFT_KNN_CHUNK_PROPOSALS=1000000000000 \
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 50 knn_graph" \
  > /tmp/probe_r10_knn50_unchunked.log 2>&1

# F. single-JVM 20x, second sample
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 20 $FAMS" \
  > /tmp/probe_r10_single20_b.log 2>&1

# G. two-executor 20x, second sample
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER="local-cluster[2,16,26624]" SPARK_GRAFT_EXEC_MEM=24g \
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 20 $FAMS" \
  > /tmp/probe_r10_cluster20_b.log 2>&1

echo ALL PART2 PROBES DONE
