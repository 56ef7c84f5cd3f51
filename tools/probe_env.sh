# Shared probe-launcher preamble (sourced by tools/probe.sh and any
# round-specific queue script). One place for the java-launch flags: a
# future fix (e.g. a new --add-opens) lands here once.
#
# Exposes: CP, ADD_OPENS, JFLAGS, run_graft(), and the standard topology
# env (SPARK_HOME, SPARK_SCALA_VERSION — REQUIRED for local-cluster
# worker launch, see the verify skill gotchas).

# ABSOLUTE app-classes path: local-cluster executors run from their own
# work dirs, so a relative entry would vanish from their classpath (the
# probe mains also absolutize defensively via graft.ops.ExecClasspath).
# GRAFT_PROBE_CP overrides — a long probe queue should run against a
# SNAPSHOT copy of the classes dir (cp -a target/scala-2.13/classes
# /tmp/snap) so concurrent sbt compiles can't mutate classes mid-probe.
CP="${GRAFT_PROBE_CP:-/root/repo/target/scala-2.13/classes:/opt/spark/jars/*}"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JFLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

run_graft() { # run_graft Xmx mainClass args...
  local xmx="$1"; shift
  java -cp "$CP" $ADD_OPENS $JFLAGS "-Xmx$xmx" "$@"
}

export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
