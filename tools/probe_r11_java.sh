#!/bin/bash
# Round-11 probe queue (java-launched variant of probe_r11.sh).
#
# Same measurements, launched with plain `java` against the sbt-built
# classes dir instead of `sbt runMain`: each step skips ~60 s of sbt
# startup, and the sbt lock stays free for test/bench work between
# probe windows. `java.class.path` (which local-cluster executors
# inherit via spark.executor.extraClassPath) reflects the expanded
# wildcard, so executor JVMs see the same classpath sbt-forked runs do.
#
# Queue (the round-10 verdict's scale-evidence ladder):
#   C. 20x single-JVM trainer probes (unigram, unigram_em, wordpiece)
#   B. single-JVM 48g 50x lsh_calib: verify-join chunking AUTO vs
#      DISABLED, same host window (the knn r10 A/B methodology)
#   A. FOUR-executor topology (local-cluster[4,8,13312], 4x12g = same
#      48g total heap / 32 total cores as the 1x48g and 2x24g configs;
#      executor COUNT is the only variable): 50x lsh_calib and 50x
#      knn_graph, two samples each (min-of-2)
#   D. MemoProbe + full Verify at sf0.001 on the 4-executor topology
set -x
cd /root/repo

CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JFLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
run_graft() { # run_graft Xmx mainClass args...
  local xmx="$1"; shift
  java -cp "$CP" $ADD_OPENS $JFLAGS "-Xmx$xmx" "$@"
}

CLUSTER4="local-cluster[4,8,13312]"
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13

# C. trainer 20x probes (cheap, single JVM) — first, so the trainer rows
# land even if the long 50x queue is cut short
run_graft 48g graft.ScaleProbe /root/testdata/sf0.1 20 \
    unigram_train,unigram_train_em,wordpiece_train \
  > /tmp/probe_r11_trainers20.log 2>&1

# B. single-JVM 50x lsh_calib, chunked (auto) vs unchunked, same window
run_graft 48g graft.ScaleProbe /root/testdata/sf0.1 50 lsh_calib \
  > /tmp/probe_r11_lsh50_single_chunked.log 2>&1
SPARK_GRAFT_LSH_CHUNK_DOCS=1000000000000 \
run_graft 48g graft.ScaleProbe /root/testdata/sf0.1 50 lsh_calib \
  > /tmp/probe_r11_lsh50_single_unchunked.log 2>&1

# A. four-executor 50x lsh_calib, two samples
SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g \
run_graft 8g graft.ScaleProbe /root/testdata/sf0.1 50 lsh_calib \
  > /tmp/probe_r11_lsh50_cluster4_a.log 2>&1
SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g \
run_graft 8g graft.ScaleProbe /root/testdata/sf0.1 50 lsh_calib \
  > /tmp/probe_r11_lsh50_cluster4_b.log 2>&1

# A. four-executor 50x knn_graph (shuffle partitions prop. to data, the
# r10 knn config), two samples
SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g SPARK_GRAFT_SHUFFLE=1600 \
run_graft 8g graft.ScaleProbe /root/testdata/sf0.1 50 knn_graph \
  > /tmp/probe_r11_knn50_cluster4_a.log 2>&1
SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g SPARK_GRAFT_SHUFFLE=1600 \
run_graft 8g graft.ScaleProbe /root/testdata/sf0.1 50 knn_graph \
  > /tmp/probe_r11_knn50_cluster4_b.log 2>&1

# D. memo law + the FULL suite on the 4-executor topology
SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g \
run_graft 8g graft.MemoProbe > /tmp/probe_r11_memo_cluster4.log 2>&1
SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g \
run_graft 8g graft.Verify /root/testdata/sf0.001 /tmp/verify_out_r11_cluster4 \
  > /tmp/probe_r11_verify_cluster4.log 2>&1
python3 tools/check.py /root/testdata/sf0.001 /tmp/verify_out_r11_cluster4 \
  > /tmp/probe_r11_check_cluster4.log 2>&1

echo ALL R11 PROBES DONE
