ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "logverzcorespark"
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
// Forked run/runMain output goes straight to this process's stdout instead
// of through sbt's logger: the logger prefixes every line with "[info] ",
// which breaks downstream tooling that json-parses the benchmark's
// single-line output.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 152 queries in one JVM at local[32]: 8g left the old-gen near-full
  // for the tail of the bench (allocation-heavy queries randomly paid
  // 5-6x in GC — q99 went 8s -> 55s in one run). The host has 128 GiB;
  // give the single local-mode JVM a real executor's share.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Dozens of whole-stage-codegen classes across the query registry can
  // fill the default 240m code cache mid-run, silently disabling the JIT
  // (10-50x slowdown for everything after). Round 8: even at 1g the
  // 309-query board triggers roaming recompile storms late in a full run
  // (one random query per run paid 50-300 s of pure compiler-thread cpu
  // — q308 234 s, then q299 57 s, then q266 94 s on consecutive runs;
  // zero full GCs, idle host; the bench's new per-query "jit" field
  // makes the storm readable from the artifact). 2g gives the code
  // cache the same headroom treatment the heap got in round 7.
  "-XX:ReservedCodeCacheSize=2g",
  // Round 9: the 2g code cache did NOT stop the roaming C2 storms (driver
  // run r08: 25 queries 2-50x slower at 32 cores than 8, different victims
  // per run, jit ≈ cpu on each victim — ~900 s of 32-core-specific excess).
  // The default CICompilerCount on this 32-cpu host is 15 ergonomic
  // compiler threads, which compete with 32 local-mode task threads for
  // cores whenever the compile queue is deep; bounding them caps the
  // blast radius of any storm. The QUEUE itself is shrunk at
  // the source by the codegen-class-cache confs in Bench/Verify (fewer
  // generated classes reaching the JIT at all). Measured at 4 (round 9
  // run 1): storms gone (max per-query jit 14 s vs r08's 175-s windows),
  // but the board's one-time ~380 s cold-compile wave drained too slowly
  // and taxed the first third of the run (q106 12 s jit inside a 32 s
  // wall, thirds of run at 166/124/87 s jit); 8 drains twice as fast
  // while still bounding worst-case theft to a quarter of the 32 task
  // threads.
  "-XX:CICompilerCount=8",
)
