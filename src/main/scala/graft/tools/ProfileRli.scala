package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: stage timing of the p_rli_lookup lifecycle. */
object ProfileRli {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    time("warmup")(spark.range(1000000).selectExpr("sum(id)").collect())
    val S = graft.ops.PipelineQueries.SplitUs
    val path = java.nio.file.Files.createTempDirectory("rlip").toString + "/t"
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts_us"))
    time("bloom create")(graft.etl.BloomTable.create(
      ev.filter(col("ts_us") <= S), path,
      keys = Seq("user_id"), precombine = "ts_us", tieBreak = Seq("event_id"),
      numFiles = 8))
    time("rli build")(graft.etl.RecordIndex.build(spark, path, numShards = 16))
    time("bloom upsert")(graft.etl.BloomTable.upsertInto(spark, path,
      ev.filter(col("ts_us") > S && col("user_id") < 100)))
    time("rli refresh")(graft.etl.RecordIndex.refresh(spark, path))
    time("rli lookup")(graft.etl.RecordIndex.lookup(spark, path, Seq(7L)).collect())
    time("rli lookup 2")(graft.etl.RecordIndex.lookup(spark, path, Seq(8L)).collect())
    spark.stop()
  }
}
