ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "advbigdataindexingspark"
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
// Tests pin the disk-artifact memo OFF: suites assert plan SHAPES
// (exchange counts, pushdown, exchange-free bucketed joins), which would
// otherwise depend on whether a prior JVM left artifacts in the store.
// ArtifactStoreSpec re-enables it locally around its own assertions.
Test / javaOptions += "-Dgraft.disk.memo=0"
// The 10x scale soak (SoakSpec) is opt-in: heavy, and its point is a
// manual scaling measurement. Run with:
//   sbt "testOnly graft.SoakSpec -- -n graft.Soak"
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.Soak")
// Without this, sbt echoes the forked process's stdout through its logger
// with an "[info] " prefix — which breaks any line-oriented JSON scrape of
// the bench output (json.loads("[info] {...}") fails). StdoutOutput wires
// the forked stdout/stderr straight through.
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
  // 32g default, sized to the box (128 GiB). The round-9 A/B that kept
  // 8g ("heap is a non-factor": 62.6 s @8g vs 61.6 s @24g) predates the
  // ArtifactStore: by round 11 the 132 queries' persisted shared
  // relations oversubscribe an 8g JVM's storage pool (~4g), and LRU
  // eviction made a handful of queries re-derive shared artifacts on
  // EVERY timed rep — x_sketch_kmv_jaccard benched 8.8 s median while a
  // fresh-JVM RunOne showed 1.2 s warm. The bench must measure
  // steady-state plans, so the storage pool now fits the full artifact
  // working set; Bench.scala additionally stamps eviction/spill counters
  // into the record so a still-polluted run self-identifies. Override
  // with SPARK_DRIVER_MEM for smaller boxes.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
