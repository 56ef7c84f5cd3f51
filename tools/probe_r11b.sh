#!/bin/bash
# Round-11 probe queue, part 2 — the cluster half of probe_r11_java.sh
# (its first attempt launched executors with a RELATIVE app-classes path,
# which vanishes from standalone executors' work-dir CWD; fixed by
# graft.ops.ExecClasspath + the absolute CP below), plus one new leg:
#   E. SMALL-HEAP single-JVM 50x lsh_calib pair (16g, chunked-auto vs
#      chunking disabled): the direct demonstration of what the
#      verify-join chunking BUYS — at 48g both variants fit and the
#      r11 same-window pair read tcpu 0.95x / wall 1.33x for chunking
#      (barriers cost wall when memory is plentiful); the bound exists
#      for heaps where the unchunked working set does NOT fit.
#      The unchunked leg is wrapped in `timeout` — an OOM-thrash can
#      otherwise crawl for hours; a timeout kill is itself the result.
set -x
cd /root/repo

CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JFLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
run_graft() { # run_graft Xmx mainClass args...
  local xmx="$1"; shift
  java -cp "$CP" $ADD_OPENS $JFLAGS "-Xmx$xmx" "$@"
}

CLUSTER4="local-cluster[4,8,13312]"
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13

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

# E. small-heap single-JVM 50x lsh_calib: chunked vs unchunked at 16g
run_graft 16g graft.ScaleProbe /root/testdata/sf0.1 50 lsh_calib \
  > /tmp/probe_r11_lsh50_16g_chunked.log 2>&1
SPARK_GRAFT_LSH_CHUNK_DOCS=1000000000000 \
timeout 3600 java -cp "$CP" $ADD_OPENS $JFLAGS -Xmx16g \
    graft.ScaleProbe /root/testdata/sf0.1 50 lsh_calib \
  > /tmp/probe_r11_lsh50_16g_unchunked.log 2>&1
echo "unchunked-16g exit: $?" >> /tmp/probe_r11_lsh50_16g_unchunked.log

echo ALL R11B PROBES DONE
