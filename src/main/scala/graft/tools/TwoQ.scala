package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm-timing probe: runs a query twice, reports both. */
object TwoQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(args(0))(spark, args(1)).queryExecution.toRdd.count()
      println(f"TWOQ rep$rep ${args(0)} rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
