package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: stage timing of the p_sql_index_mor / p_sql_index_part
  * lifecycles, with the MaintProf sub-step attribution (run with
  * `-Dgraft.prof=1`) — attributes the index-maintenance tax among
  * beforeAfter probes, reconcile Spark jobs, covered-head writes and
  * serve-time freshness gates.
  */
object ProfileIdx {
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

    // ---- p_sql_index_mor, stage by stage -----------------------------
    {
      val src = graft.Tables.orders(spark, sf)
        .select(col("o_orderkey").as("k"), lit(1L).as("pc"),
          col("o_orderstatus").as("st"), col("o_totalprice").as("v"))
      val path = java.nio.file.Files
        .createTempDirectory("profimor").toString + "/t"
      time("mor: create")(graft.etl.MorTable.create(src, path,
        keys = Seq("k"), precombine = "pc"))
      graft.etl.Catalog.registerLayoutTable(spark, "prof_simor", "mor", path)
      time("mor: CREATE INDEX")(graft.etl.SqlIndex.exec(spark,
        "CREATE INDEX simor1 ON prof_simor USING SECONDARY (st)"))
      src.filter(col("k") % 10 === 3)
        .withColumn("pc", lit(2L)).withColumn("st", lit("X"))
        .withColumn("v", col("v") + 1000)
        .createOrReplaceTempView("prof_simor_src")
      time("mor: MERGE")(graft.etl.SqlMerge.exec(spark,
        """MERGE INTO prof_simor t USING prof_simor_src s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
      time("mor: DELETE")(graft.etl.SqlMerge.exec(spark,
        "DELETE FROM prof_simor WHERE st = 'O'"))
      time("mor: SELECT")(graft.etl.SqlRead.select(spark,
        "SELECT k, st, v FROM prof_simor WHERE st IN ('F', 'X')").collect())
      graft.etl.MaintProf.dump()
      graft.etl.MaintProf.reset()
    }

    // ---- p_sql_index_part, stage by stage ----------------------------
    {
      val src = graft.Tables.orders(spark, sf)
        .select(substring(col("o_orderdate").cast("string"), 1, 4).as("yr"),
          col("o_orderkey").as("k"), lit(1L).as("pc"),
          col("o_orderstatus").as("st"), col("o_totalprice").as("v"))
      val path = java.nio.file.Files
        .createTempDirectory("profipart").toString + "/t"
      time("part: create")(graft.etl.PartitionedTable.create(src, path,
        keys = Seq("k"), precombine = "pc", partitionCols = Seq("yr")))
      graft.etl.Catalog.registerLayoutTable(spark, "prof_sipart",
        "partitioned", path)
      time("part: CREATE INDEX")(graft.etl.SqlIndex.exec(spark,
        "CREATE INDEX sipart1 ON prof_sipart USING SECONDARY (st)"))
      src.filter(col("k") % 10 === 3)
        .withColumn("pc", lit(2L)).withColumn("st", lit("X"))
        .withColumn("v", col("v") + 1000)
        .createOrReplaceTempView("prof_sipart_src")
      time("part: MERGE")(graft.etl.SqlMerge.exec(spark,
        """MERGE INTO prof_sipart t USING prof_sipart_src s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
      time("part: DELETE")(graft.etl.SqlMerge.exec(spark,
        "DELETE FROM prof_sipart WHERE st = 'O'"))
      time("part: SELECT")(graft.etl.SqlRead.select(spark,
        "SELECT k, st, v FROM prof_sipart WHERE st IN ('F', 'X')").collect())
      graft.etl.MaintProf.dump()
      graft.etl.MaintProf.reset()
    }

    // ---- p_rli_part, stage by stage -----------------------------------
    {
      val src = graft.Tables.orders(spark, sf)
        .select(substring(col("o_orderdate").cast("string"), 1, 4).as("yr"),
          col("o_orderkey").as("k"), lit(1L).as("pc"),
          col("o_totalprice").as("v"))
      val path = java.nio.file.Files
        .createTempDirectory("profrli").toString + "/t"
      time("rli: create")(graft.etl.PartitionedTable.create(src, path,
        keys = Seq("k"), precombine = "pc", partitionCols = Seq("yr")))
      graft.etl.Catalog.registerLayoutTable(spark, "prof_rlip",
        "partitioned", path)
      time("rli: CREATE INDEX")(graft.etl.SqlIndex.exec(spark,
        "CREATE INDEX rlip1 ON prof_rlip USING RECORD (k)"))
      src.filter(col("k") % 10 === 3)
        .withColumn("pc", lit(2L)).withColumn("v", col("v") + 1000)
        .createOrReplaceTempView("prof_rlip_src")
      time("rli: MERGE")(graft.etl.SqlMerge.exec(spark,
        """MERGE INTO prof_rlip t USING prof_rlip_src s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
      time("rli: purge_key")(graft.etl.SqlCall.exec(spark,
        "CALL purge_key('prof_rlip', 1)"))
      time("rli: SELECT")(graft.etl.SqlRead.select(spark,
        "SELECT k, v FROM prof_rlip " +
          "WHERE k IN (1, 2, 3, 4, 5, 6, 7, 32, 33, 34, 35)").collect())
      graft.etl.MaintProf.dump()
    }
    spark.stop()
  }
}
