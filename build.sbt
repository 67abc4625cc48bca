ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mbfbigdatarandomforestspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
// currently Spark 4.1.2. NOTE on upgrades: ml.TreePipeline disables the
// GBT model-size cap by reflection against the private[spark]
// o.a.s.ml.tree.TreeConfig global (uninitialized outside Spark Connect —
// it silently truncates boosting at 0 bytes otherwise). A Spark upgrade
// that renames that field downgrades the workaround to a loud stderr
// warning; re-pin it when bumping Spark.
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forward forked run output RAW, not through sbt's logger: the logger
// prefixes every stdout line with "[info] ", which is what kept the
// driver from parsing Bench's JSON contract line in rounds 1-5
// (BENCH_r*.json "parsed": null even when the full line was captured).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // GC configuration, measured on the full 153-query sf0.1 sweep with
  // -Xlog:gc (docs/SCALE.md "GC diagnosis"): Spark's broadcast/codegen
  // buffers allocate G1-humongous at the default region size, firing
  // ~1,900 concurrent-start pauses inside timed queries, and the
  // between-run System.gc() hygiene cost 459 stop-the-world Full GCs
  // (74 s). 16 MB regions lift the humongous threshold above those
  // buffers and ExplicitGCInvokesConcurrent keeps the hygiene GC (weak-
  // ref reaping for ContextCleaner) off the stop-the-world path: total
  // STW pause 91 s → 6.6 s, sweep 115.1 s → 98.5 s, zero per-query
  // regressions.
  "-XX:G1HeapRegionSize=16m",
  "-XX:+ExplicitGCInvokesConcurrent",
) ++ (
  // dev diagnostics knob (not set by the driver): SPARK_GRAFT_GCLOG=path
  // writes a unified GC log from the forked JVM, for attributing
  // full-sweep crowding between GC pauses and code-cache effects
  sys.env.get("SPARK_GRAFT_GCLOG")
    .map(p => s"-Xlog:gc*:file=$p:time,uptime").toSeq
) ++ (
  // dev experiments knob (not set by the driver): extra JVM flags for the
  // forked runs, space-separated — used to A/B GC configurations
  sys.env.get("SPARK_GRAFT_JVMFLAGS")
    .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq())
)
