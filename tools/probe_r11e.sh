#!/bin/bash
# Round-11 probe queue, part 5 — the 100× tier for knn_graph (200k
# vectors; NN-descent auto-chunking at ~7 slices; shuffle partitions ∝
# data at 3200), single-48g vs 4×12g, interleaved windows, min-of-2.
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

for s in a b; do
  SPARK_GRAFT_SHUFFLE=3200 \
  run_graft 48g graft.ScaleProbe /root/testdata/sf0.1 100 knn_graph \
    > /tmp/probe_r11_knn100_single_$s.log 2>&1
  SPARK_GRAFT_MASTER="$CLUSTER4" SPARK_GRAFT_EXEC_MEM=12g SPARK_GRAFT_SHUFFLE=3200 \
  run_graft 8g graft.ScaleProbe /root/testdata/sf0.1 100 knn_graph \
    > /tmp/probe_r11_knn100_cluster4_$s.log 2>&1
done

echo ALL R11E PROBES DONE
