#!/bin/bash
# Run a graft main class with plain java (bypasses the sbt lock so tools
# can run concurrently with sbt test). Mirrors build.sbt's javaOptions.
# Usage: ./run-tool.sh [-mem 24g] <mainClass> [args...]
MEM="${SPARK_DRIVER_MEM:-8g}"
if [ "$1" = "-mem" ]; then MEM="$2"; shift 2; fi
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"$MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
