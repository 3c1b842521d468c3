package graft.etl

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** End-to-end pipeline semantics (SURVEY.md §5.4): full-load first run,
  * incremental rerun is a no-op, empty-batch short-circuit, failure
  * logging, watermark recovery — the reference's T1-T5
  * (pipeline_architecture.py:262-335) on real testdata.
  */
class PipelineSpec extends SparkSpec {

  private def freshConf(clockTimes: Seq[Long]): PipelineConfig = {
    val base = Files.createTempDirectory("pipeline").toString
    val it = Iterator(clockTimes: _*) ++ Iterator.continually(clockTimes.last)
    PipelineConfig(
      name = "events_pipeline",
      sourcePath = s"$sf0001/events.parquet",
      targetPath = s"$base/target",
      logPath = s"$base/log",
      clock = () => it.next())
  }

  test("first run is a full load; rerun is an incremental no-op") {
    // clock well past all 2024 event times → second run's watermark
    // filter excludes everything
    val conf = freshConf(Seq(2000000000000L, 2000000001000L,
      2000000002000L, 2000000003000L))
    val r1 = Pipeline.run(spark, conf)
    assert(r1.status == "SUCCESS" && r1.mode == "full")
    assert(r1.recordsProcessed == 1000)
    val target1 = spark.read.parquet(conf.targetPath)
    assert(target1.count() == 1000)
    assert(target1.select("record_id").distinct().count() == 1000)

    val r2 = Pipeline.run(spark, conf)
    assert(r2.status == "SUCCESS" && r2.mode == "incremental")
    assert(r2.recordsProcessed == 0, "rerun must be a no-op")
    assert(r2.watermark.contains(2000000000000L),
      "watermark must recover the first run's start time")
    assert(spark.read.parquet(conf.targetPath).count() == 1000)

    val log = spark.read.parquet(conf.logPath)
    assert(log.count() == 2)
    assert(log.filter(col("status") === "SUCCESS").count() == 2)
  }

  test("incremental run picks up only post-watermark events") {
    val conf = freshConf(Seq(2000000000000L))
    // seed the log with a fake successful run watermarked mid-January
    Watermark.writeEntry(spark, conf.logPath, LogEntry(
      "events_pipeline", None, graft.ops.PipelineQueries.WatermarkMs,
      "SUCCESS", 0, 0.0, None, 1L))
    val r = Pipeline.run(spark, conf)
    assert(r.mode == "incremental")
    assert(r.recordsProcessed > 0 && r.recordsProcessed < 1000,
      s"expected a strict subset, got ${r.recordsProcessed}")
    assert(spark.read.parquet(conf.targetPath).count() == r.recordsProcessed)
  }

  test("backfill reprocesses without duplicating and leaves the watermark chain alone") {
    val conf = freshConf(Seq(2000000000000L, 2000000001000L,
      2000000002000L, 2000000003000L, 2000000004000L, 2000000005000L))
    val r1 = Pipeline.run(spark, conf)
    assert(r1.recordsProcessed == 1000)
    // full-history backfill: every record re-extracted, none duplicated
    val bf = Pipeline.backfill(spark, conf, fromMs = 0L)
    assert(bf.status == "SUCCESS" && bf.mode == "backfill")
    assert(bf.recordsProcessed == 1000)
    val target = spark.read.parquet(conf.targetPath)
    assert(target.count() == 1000, "backfill must replace, not append")
    assert(target.select("record_id").distinct().count() == 1000)
    // the backfill logs under its own name; the pipeline's watermark
    // still reflects the original run
    assert(Watermark.lastSuccessfulRun(spark, conf.logPath, conf.name)
      .contains(2000000000000L))
    val r2 = Pipeline.run(spark, conf)
    assert(r2.mode == "incremental" && r2.recordsProcessed == 0)
  }

  test("failure writes a FAILED log entry and rethrows") {
    val conf = freshConf(Seq(2000000000000L))
      .copy(sourcePath = "/nonexistent/events.parquet")
    intercept[Exception] { Pipeline.run(spark, conf) }
    val log = spark.read.parquet(conf.logPath)
    assert(log.filter(col("status") === "FAILED").count() == 1)
    val row = log.head()
    assert(!row.isNullAt(row.fieldIndex("error_message")))
  }

  test("watermark recovery ignores FAILED runs and missing logs") {
    val base = Files.createTempDirectory("wm").toString
    assert(Watermark.lastSuccessfulRun(spark, s"$base/nope", "p").isEmpty)
    Watermark.writeEntry(spark, s"$base/log",
      LogEntry("p", None, 100L, "FAILED", 0, 0.0, Some("boom"), 1L))
    assert(Watermark.lastSuccessfulRun(spark, s"$base/log", "p").isEmpty)
    Watermark.writeEntry(spark, s"$base/log",
      LogEntry("p", None, 50L, "SUCCESS", 5, 1.0, None, 2L))
    assert(Watermark.lastSuccessfulRun(spark, s"$base/log", "p").contains(50L))
    // another pipeline's runs must not leak in
    assert(Watermark.lastSuccessfulRun(spark, s"$base/log", "other").isEmpty)
  }

  test("status report filters by cutoff and sorts newest first") {
    val base = Files.createTempDirectory("status").toString
    val log = s"$base/log"
    Watermark.writeEntry(spark, log, LogEntry("p", None, 1000L, "SUCCESS", 1, 1.0, None, 1L))
    Watermark.writeEntry(spark, log, LogEntry("p", None, 5000L, "FAILED", 0, 0.5, Some("x"), 2L))
    Watermark.writeEntry(spark, log, LogEntry("p", None, 9000L, "SUCCESS", 3, 2.0, None, 3L))
    val got = Watermark.status(spark, log, days = 7, now = 10000L)
    assert(got.count() == 3)
    val times = got.select("run_time").collect().map(_.getTimestamp(0).getTime)
    assert(times.toSeq == times.sortBy(-_).toSeq, "newest first")
    val old = Watermark.status(spark, log, days = 7, now = 700000000L)
    assert(old.count() == 0, "cutoff must exclude old runs")
  }
}
