package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad main — ad-hoc checks against the testdata. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.eventsRaw(spark, s"$sf/events.parquet")
    ev.printSchema()
    ev.withColumn("ts_us", org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts div 1000"))).show(3, truncate = false)
    spark.read.parquet(s"$sf/orders.parquet").show(3)
    spark.read.parquet(s"$sf/customer.parquet")
      .select("c_mktsegment").distinct().show()
    spark.read.parquet(s"$sf/region.parquet").show()
    spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("min(o_totalprice)", "max(o_totalprice)", "min(o_orderdate)", "max(o_orderdate)").show()
    spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("min(l_shipdate)", "max(l_shipdate)").show()
    spark.stop()
  }
}
