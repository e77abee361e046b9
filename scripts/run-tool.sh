#!/bin/bash
# Run a graft tool class against the compiled classes + /opt/spark/jars.
# Usage: scripts/run-tool.sh <mainClass> [args...]
CLS="$1"; shift
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
# probe-only extra jars (e.g. duckdb_jdbc for the second-store ingest
# probe) — never a build dependency
[ -n "$EXTRA_CP" ] && CP="$CP:$EXTRA_CP"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do OPENS="$OPENS --add-opens=$p=ALL-UNNAMED"; done
exec java $OPENS -Xmx48g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" "$CLS" "$@"
