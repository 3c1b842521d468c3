package graft.tools


import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Dev profiler (guide §1): run named registry queries with a
  * SparkListener that attributes wall time to Spark jobs (by call
  * site) vs driver-side gaps (filesystem/metadata work between jobs).
  * The split tells us whether a lifecycle entry's cost is "too many
  * Spark jobs", "one slow job", or "driver-side metadata churn" —
  * the three have entirely different fixes. Combine with
  * `-Dgraft.prof=1` for the MaintProf sub-step attribution.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileQ q1 q2"
  */
object ProfileQ {
  private final case class JobRow(id: Int, site: String, sub: Long, var end: Long,
      var tasks: Int, var taskNanos: Long)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the same cost classes Bench warms so first-query numbers are real
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Tables.views(spark, sf)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.table(t).limit(64).collect()
    }

    val jobs = new ConcurrentLinkedQueue[JobRow]()
    val open = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val fromCallSite = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.long")))
          .flatMap(_.linesIterator.find(l =>
            l.contains("graft") && !l.contains("ProfileQ")))
        val site = fromCallSite
          .orElse(e.stageInfos.headOption.map(_.details.linesIterator
            .find(l => l.contains("graft") && !l.contains("ProfileQ"))
            .getOrElse(e.stageInfos.head.name)))
          .getOrElse("?")
        val r = JobRow(e.jobId, site.take(120), System.nanoTime(), 0L, 0, 0L)
        open.put(e.jobId, r); jobs.add(r)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // attribute task time to whichever jobs are open (local mode: ~1)
        open.asScala.values.foreach { r =>
          r.tasks += e.stageInfo.numTasks
          r.taskNanos += (e.stageInfo.taskMetrics.executorRunTime) * 1000000L
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(open.remove(e.jobId)).foreach(_.end = System.nanoTime())
      }
    })

    val reps = sys.env.get("SPARK_GRAFT_PROFQ_REPS").flatMap(_.toIntOption).getOrElse(1)
    val names = if (args.nonEmpty) args.toSeq else Seq("p_sql_index_part")
    for (name <- names; rep <- 1 to reps) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      jobs.clear(); open.clear()
      val t0 = System.nanoTime()
      fn(spark, sf).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val rows = jobs.asScala.toSeq.filter(_.end > 0)
      val jobSec = rows.map(r => (r.end - r.sub) / 1e9).sum
      println(f"\n==== $name rep$rep: wall=$wall%.2fs jobs=${rows.size}%d " +
        f"jobTime=$jobSec%.2fs driverGap=${wall - jobSec}%.2fs ====")
      val bySite = rows.groupBy(_.site).map { case (s, rs) =>
        (s, rs.map(r => (r.end - r.sub) / 1e9).sum, rs.size)
      }.toSeq.sortBy(-_._2).take(28)
      bySite.foreach { case (s, sec, n) =>
        println(f"  $sec%7.3fs x$n%-3d $s")
      }
      graft.etl.MaintProf.dump(); graft.etl.MaintProf.reset()
    }
    spark.stop()
  }
}
