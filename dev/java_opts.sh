# Sourced by the dev/*.sh harness scripts: the JDK17 --add-opens set
# Spark 4.x needs when SparkSession is created outside spark-submit
# (matches org.apache.spark.launcher.JavaModuleOptions and build.sbt's
# jdk17AddOpens). ONE copy — a Spark upgrade that needs another package
# edits this file, not five scripts.
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
