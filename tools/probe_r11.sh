#!/bin/bash
# Round-11 probe queue — the verdict's scale-evidence ladder:
#   A. FOUR-executor topology (local-cluster[4,8,13312], 4x12g = the same
#      48g total heap and 32 total cores as the single-JVM and 2x24g
#      configs — executor COUNT is the only variable): 50x lsh_calib and
#      50x knn_graph, two samples each (min-of-2 discipline). This
#      measures the "a real cluster restores the advantage by ADDING
#      executors" claim the r10 lsh 24g-crossover leaned on.
#   B. Same-window single-48g-JVM 50x lsh_calib pair: verify-join
#      chunking AUTO (250k docs -> 3 slices) vs DISABLED (chunk-docs
#      target huge -> 1 slice) — the clean A/B for the chunked
#      verify-join working-set claim (the knn r10 methodology).
#   C. 20x single-JVM trainer probes: unigram_train, unigram_train_em,
#      wordpiece_train (vocab-bounded families — cpu ratios).
#   D. MemoProbe + full Verify at sf0.001 under the 4-executor topology.
set -x
cd /root/repo

CLUSTER4="local-cluster[4,8,13312]"
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13

# C. trainer 20x probes (cheap, single JVM) — run first so the trainer
# rows land even if the long 50x queue is cut short
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 20 unigram_train,unigram_train_em,wordpiece_train" \
  > /tmp/probe_r11_trainers20.log 2>&1

# B. single-JVM 50x lsh_calib, chunked (auto) vs unchunked, same window
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 50 lsh_calib" \
  > /tmp/probe_r11_lsh50_single_chunked.log 2>&1
SPARK_GRAFT_LSH_CHUNK_DOCS=1000000000000 \
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 50 lsh_calib" \
  > /tmp/probe_r11_lsh50_single_unchunked.log 2>&1

# A. four-executor 50x lsh_calib, two samples
SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g \
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 50 lsh_calib" \
  > /tmp/probe_r11_lsh50_cluster4_a.log 2>&1
SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g \
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 50 lsh_calib" \
  > /tmp/probe_r11_lsh50_cluster4_b.log 2>&1

# A. four-executor 50x knn_graph (partitions prop. to data, the r10 knn
# config), two samples
SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g SPARK_GRAFT_SHUFFLE=1600 \
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 50 knn_graph" \
  > /tmp/probe_r11_knn50_cluster4_a.log 2>&1
SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g SPARK_GRAFT_SHUFFLE=1600 \
sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 50 knn_graph" \
  > /tmp/probe_r11_knn50_cluster4_b.log 2>&1

# D. memo law + the FULL suite on the 4-executor topology
SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g \
sbt -batch "runMain graft.MemoProbe" > /tmp/probe_r11_memo_cluster4.log 2>&1
SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g \
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/verify_out_r11_cluster4" \
  > /tmp/probe_r11_verify_cluster4.log 2>&1
python3 tools/check.py /root/testdata/sf0.001 /tmp/verify_out_r11_cluster4 \
  > /tmp/probe_r11_check_cluster4.log 2>&1

echo ALL R11 PROBES DONE
