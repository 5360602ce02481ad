#!/bin/bash
# Deep-SF runner (local iteration): raw `java` with the same JDK17
# --add-opens set build.sbt forks with (Spark 4 on Java 17 needs them when
# SparkSession is created outside spark-submit; without java.nio opens,
# Kryo dies on HeapByteBuffer — the bloom sketch broadcast path).
# Usage: run_deep.sh <MainClass> [args...]   (heap via DEEP_MEM, default 64g)
set -u
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"${DEEP_MEM:-64g}" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" "$@"
