package graft.ops

import graft.SparkSpec
import java.nio.file.Files

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct stays within 5% of exact per group") {
    val rows = Relational.approxDistinct(spark, sf0001)
      .select("approx_parts", "exact_parts").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"approx=$approx exact=$exact")
    }
  }

  test("CSV, JSON and ORC sources round-trip a table (S7 formats)") {
    val base = Files.createTempDirectory("fmt").toString
    val src = graft.Tables.customer(spark, sf0001)
    val cols = src.columns.map(org.apache.spark.sql.functions.col).toSeq

    src.write.option("header", "true").csv(s"$base/csv")
    val csv = spark.read.option("header", "true").schema(src.schema).csv(s"$base/csv")
    assert(csv.select(cols: _*).exceptAll(src).isEmpty && src.exceptAll(csv.select(cols: _*)).isEmpty)

    src.write.json(s"$base/json")
    val json = spark.read.schema(src.schema).json(s"$base/json")
    assert(json.select(cols: _*).exceptAll(src).isEmpty)

    src.write.orc(s"$base/orc")
    val orc = spark.read.orc(s"$base/orc")
    assert(orc.select(cols: _*).exceptAll(src).isEmpty)
  }

  test("join strategy hints steer the planner (merge / shuffle_hash / broadcast)") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val o = graft.Tables.orders(spark, sf0001)
    def planOf(hint: String): String =
      li.join(o.hint(hint), li("l_orderkey") === o("o_orderkey"))
        .queryExecution.executedPlan.toString
    assert(planOf("merge").contains("SortMergeJoin"))
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"))
    assert(planOf("broadcast").contains("BroadcastHashJoin"))
  }

  test("pivot columns match the fixed returnflag domain") {
    val df = Relational.pivotQuantities(spark, sf0001)
    assert(df.columns.toSeq == Seq("l_linestatus", "A", "N", "R"))
    assert(df.count() > 0)
  }
}
