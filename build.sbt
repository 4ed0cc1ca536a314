ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparklycleanspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---- Parallel forked test groups ----------------------------------------
// One forked JVM used to run all ~39 suites SEQUENTIALLY (~26 min wall; the
// longest end-to-end suites dominate). The suites are independent — every
// test writes only to its own java.nio temp dir, fixture reads are
// read-only, and the shared SparkSpec.session is per-JVM — so they are
// split into a few duration-balanced groups, each in its own forked JVM
// with its own local[8] session. Wall time becomes the LARGEST group
// (~6 min on a 32-core box), not the sum. Suites not listed fall into the
// catch-all group; balance numbers come from target/test-reports.
val testGroupOf: Map[String, String] = Map(
  "graft.cli.CliSpec" -> "cli",                       // ~305 s
  "graft.cli.CliReportSpec" -> "cli-reports",         // ~350 s
  "graft.streaming.EventStreamsSpec" -> "streams",    // ~230 s
  "graft.ops.EventsSpec" -> "streams",
  "graft.ops.EventsPropertySpec" -> "streams",
  "graft.PlanSpec" -> "plans",                        // ~200 s
  "graft.ops.TextOpsSpec" -> "plans",
  "graft.ops.EmbeddingsSpec" -> "embed",              // ~120 s
  "graft.ops.TextOpsPropertySpec" -> "embed",
  "graft.ops.GraphPatchPropertySpec" -> "embed",
  "graft.ops.IndexFamilySpec" -> "embed",
  "graft.ops.GraphIndexSpec" -> "embed",
  "graft.ops.MultimodalSpec" -> "embed",
)
Test / testGrouping := {
  // each group's session is local[8]; without ActiveProcessorCount every
  // forked JVM sizes GC/thread pools for all 32 cores and six JVMs
  // thrash each other
  val jvmOpts = (Test / javaOptions).value.toVector :+
    "-XX:ActiveProcessorCount=8"
  (Test / definedTests).value
    .groupBy(d => testGroupOf.getOrElse(d.name, "rest"))
    .toSeq.map { case (g, tests) =>
      Tests.Group(g, tests,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(jvmOpts)))
    }
}
// sbt's default caps concurrently-running forked test groups at 1; lift it
// to the group count so the groups actually overlap.
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(12),
)
