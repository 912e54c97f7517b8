#!/bin/bash
# Run a graft main class WITHOUT sbt (no project-lock contention with builds):
#   tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/out [q1,q2]
# Mirrors build.sbt's forked-run JVM flags (JDK17 add-opens, UTF-8, UTC).
set -euo pipefail
CLASSES=/root/repo/target/scala-2.13/classes
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec env LC_ALL=C.UTF-8 java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dfile.encoding=UTF-8 \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
