ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "big_data_recommendation_systemspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "6g")}",
  // Pin + pre-touch the heap. First-touch page faults on this VM are
  // a latency LOTTERY (hypervisor memory state): the same pretouch
  // measured 1.9s or 2m12s for the same size on the same box minutes
  // apart, and lazily-faulted pages hit that lottery DURING queries —
  // the round-1/2 "random mid-bench storms" (multi-second bursts of
  // 15-24 cores of pure kernel time, a different victim query each
  // run; NOTES_r2.md). Xms = Xmx stops G1 commit/uncommit churn so no
  // page is ever re-faulted, and AlwaysPreTouch moves every
  // first-touch to JVM startup, before q01 ever runs. 6g (not 16g)
  // because the fault cost is superlinear in committed size when the
  // host is tight (16g pretouch measured 4m15s/90 CPU-min) and the
  // whole 40-query bench peaks well under 5g of heap.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "6g")}",
  "-XX:+AlwaysPreTouch",
  // Metaspace starts at 21MB and every expansion forces a GC +
  // remap; hundreds of Janino classloaders cross that often.
  "-XX:MetaspaceSize=512m",
  // Dozens of distinct query plans → hundreds of Janino-generated
  // classes. With the JDK-default code cache the JIT stops compiling
  // mid-run and everything (including Spark's own hot paths) drops to
  // the interpreter at 20-50× — measured as queries running 10s fresh
  // but 200s later in the same JVM.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // C1-only JIT: dozens of huge Janino-generated methods clog the C2
  // compile queue for minutes, during which hot paths run interpreted
  // at 10-25x (measured: identical queries 10s vs 200s,
  // nondeterministically). C1 compiles in ms and has no such cliff;
  // its ~30% lower peak throughput is a far better trade here.
  "-XX:TieredStopAtLevel=1",
)
