package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** CTAS routed to layout creation: each layout kind stands up from
  * pure SQL, is immediately DML-able/readable through the front
  * doors, misconfiguration fails loudly, and a CTAS without graft
  * properties falls through to Spark untouched.
  */
class SqlDdlSpec extends SparkSpec {
  import spark.implicits._

  private def src(view: String): Unit = {
    Seq((1L, 1L, 10.0, "a"), (2L, 1L, 20.0, "b"), (2L, 2L, 22.0, "b"))
      .toDF("k", "pc", "v", "part").createOrReplaceTempView(view)
    ()
  }

  test("CTAS bucket layout: created, registered, DML-able") {
    val path = Files.createTempDirectory("ctasb").toString + "/t"
    src("ctas_src_b")
    SqlDdl.exec(spark,
      s"""CREATE TABLE ctas_bucket TBLPROPERTIES (
         |  'graft.table.layout' = 'bucket',
         |  'graft.table.path' = '$path',
         |  'graft.table.primaryKey' = 'k',
         |  'graft.table.preCombineField' = 'pc',
         |  'graft.table.numBuckets' = '4')
         |AS SELECT k, pc, v FROM ctas_src_b""".stripMargin)
    // precombine applied at create: k=2 keeps pc=2
    val got = Catalog.readTable(spark, "ctas_bucket")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> 10.0, 2L -> 22.0))
    SqlMerge.exec(spark, "UPDATE ctas_bucket SET v = v + 1 WHERE k = 1")
    assert(Catalog.readTable(spark, "ctas_bucket").filter("k = 1")
      .select("v").as[Double].head() == 11.0)
  }

  test("CTAS partitioned layout takes PARTITIONED BY; timeline CTAS time-travels") {
    val p1 = Files.createTempDirectory("ctasp").toString + "/t"
    src("ctas_src_p")
    SqlDdl.exec(spark,
      s"""CREATE TABLE ctas_part PARTITIONED BY (part) TBLPROPERTIES (
         |  'graft.table.layout' = 'partitioned',
         |  'graft.table.path' = '$p1',
         |  'graft.table.primaryKey' = 'k',
         |  'graft.table.preCombineField' = 'pc')
         |AS SELECT k, pc, v, part FROM ctas_src_p""".stripMargin)
    assert(PartitionedTable.props(p1).partitionCols == Seq("part"))
    assert(Catalog.readTable(spark, "ctas_part").count() == 2)

    val p2 = Files.createTempDirectory("ctast").toString + "/t"
    SqlDdl.exec(spark,
      s"""CREATE TABLE ctas_tl TBLPROPERTIES (
         |  'graft.table.layout' = 'timeline',
         |  'graft.table.path' = '$p2',
         |  'graft.table.primaryKey' = 'k',
         |  'graft.table.preCombineField' = 'pc')
         |AS SELECT k, pc, v FROM ctas_src_p""".stripMargin)
    assert(SqlRead.select(spark,
      "SELECT * FROM ctas_tl VERSION AS OF 0").count() == 2)
  }

  test("missing config fails loudly; plain CTAS falls through to Spark") {
    src("ctas_src_e")
    val e = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark,
        """CREATE TABLE ctas_bad TBLPROPERTIES (
          |  'graft.table.layout' = 'bucket',
          |  'graft.table.path' = '/tmp/x')
          |AS SELECT k, pc, v FROM ctas_src_e""".stripMargin)
    }
    assert(e.getMessage.contains("primaryKey"))
    val loc = Files.createTempDirectory("ctaspl").toString + "/plain"
    SqlDdl.exec(spark,
      s"""CREATE TABLE ctas_plain USING parquet LOCATION '$loc'
         |AS SELECT k, v FROM ctas_src_e""".stripMargin)
    assert(spark.table("ctas_plain").count() == 3)
  }
}
