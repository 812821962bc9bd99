#!/bin/bash
# Run a compiled graft main (test scope) without the sbt lock, so soak
# legs can run while sbt builds/generates elsewhere. Mirrors build.sbt's
# fork options (JDK17 add-opens, UTC, SPARK_DRIVER_MEM heap).
# Usage: tools/runmain.sh <MainClass> [args...]
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/test-classes:target/scala-2.13/classes:/opt/spark/jars/*"
# scalatest/scalacheck from the coursier cache (test-scope deps)
for j in $(find ~/.cache/coursier -name '*.jar' 2>/dev/null | grep -E "scalatest|scalactic|scalacheck" ); do CP="$CP:$j"; done
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" $SPARK_GRAFT_JAVA_OPTS -cp "$CP" "$@"
