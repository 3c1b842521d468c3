ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkhudietlpipelinespark"
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
// ---- Parallel forked test groups -------------------------------------
// The suite is ~450 Spark-heavy tests whose per-test durations sum to
// ~870 s; one forked JVM runs them sequentially in ~25 min, past the
// driver's test budget (r17's VERIFY recorded tests_ok=false with a
// tail of only PASSING tests — a budget kill, not a failure). Split
// into four forked JVMs (each with its own SparkSession on local[8];
// 4×8 cores fits the 32-core box). Groups are deterministic: the
// artifact-sharing suites (IvfIndex/IvfPq/Similarity reuse the
// committed model under target/graft-index — concurrent training
// races would be flaky) are pinned together, the measured heaviest
// suites are spread one per group, the rest round-robin by name.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value
  val n = 4
  val pinned: Map[String, Int] = Map(
    // target/graft-index sharers — MUST stay in one JVM
    "graft.ops.IvfIndexSpec" -> 0, "graft.ops.IvfPqSpec" -> 0,
    "graft.ops.SimilaritySpec" -> 0,
    // heaviest suites, balanced by measured duration (bench of
    // 2026-08-19: SqlIndex 107 s, Streaming 60, PlanAssert 59,
    // BucketTable 57, BloomTable 53, SqlCall 52, PartitionedTable 45,
    // SqlDdl 42, LshIndex 32, CdcLog 31, SqlMerge 27, IvfIndex 27)
    "graft.etl.SqlIndexSpec" -> 0, "graft.etl.SqlRoutingSpec" -> 0,
    "graft.ops.DedupSpec" -> 0,
    "graft.streaming.StreamingSpec" -> 1, "graft.etl.BucketTableSpec" -> 1,
    "graft.etl.SqlMergeSpec" -> 1, "graft.etl.SqlReadSpec" -> 1,
    "graft.etl.TimelineSpec" -> 1,
    "graft.ops.PlanAssertSpec" -> 2, "graft.etl.BloomTableSpec" -> 2,
    "graft.etl.CdcLogSpec" -> 2, "graft.etl.StatsIndexSpec" -> 2,
    "graft.etl.SqlCallSpec" -> 3, "graft.etl.PartitionedTableSpec" -> 3,
    "graft.etl.SqlDdlSpec" -> 3, "graft.ops.LshIndexSpec" -> 3,
    "graft.etl.RecordIndexSpec" -> 3)
  tests.sortBy(_.name).zipWithIndex
    .groupBy { case (t, i) => pinned.getOrElse(t.name, i % n) }
    .toSeq.sortBy(_._1)
    .map { case (g, ts) =>
      Tests.Group(s"g$g", ts.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts.toVector)))
    }
}
// sbt's default caps forked test groups at 1 concurrent; allow all four
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4),
  Tags.limitAll(16))
// Pass the forked process's stdout through unprefixed — the driver parses
// graft.Bench's one-line JSON from the process tail, and sbt's default
// `[info] ` decoration would break a strict per-line json parse.
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
  // 24g default: the 96-query bench accretes cached blocks and shuffle
  // buffers across queries; at 8g GC churn doubled total bench time
  // (measured 205s → 100s at sf0.1 local[32]).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
