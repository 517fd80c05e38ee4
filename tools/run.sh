#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars without
# sbt JVM startup overhead. Usage: tools/run.sh graft.Verify <args...>
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# 32g default (the sandbox has 128 GiB): an 8g heap under external load
# amplified cache contention ~8x in the round-3 driver bench.
# 512m code cache: the 240m default fills with JIT output over a long
# janino-heavy session, silently disabling the JIT (10x slowdowns).
# spark.local.dir on tmpfs: jstack sampling showed executor threads spending
# most RUNNABLE time in FileOutputStream.open0 — shuffle-file creation on the
# overlay disk dominated the staged pm pipeline. A cluster provisions NVMe
# local dirs; /dev/shm is this box's analogue. Only when the host has one
# (and the caller didn't pick a dir): shuffle/spill on tmpfs is RAM, so on a
# small-memory host the disk default is the safe choice.
LOCAL_DIR_FLAG=""
if [ -z "$SPARK_LOCAL_DIR" ] && [ -d /dev/shm ] && [ -w /dev/shm ]; then
  LOCAL_DIR_FLAG="-Dspark.local.dir=/dev/shm/spark-local"
elif [ -n "$SPARK_LOCAL_DIR" ]; then
  LOCAL_DIR_FLAG="-Dspark.local.dir=$SPARK_LOCAL_DIR"
fi
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-32g} -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  $LOCAL_DIR_FLAG \
  -cp "$CP" "$@"
