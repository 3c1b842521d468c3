package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.IntegralDivide

class DivPushdownSpec extends SparkSpec {

  test("rewrite is semantically exact (trunc-div vs bound, incl. negatives)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val a = rnd.nextLong() % 1000000
      val k = rnd.nextInt(999) + 1L
      val c = rnd.nextInt(1000).toLong
      assert((a / k > c) == (a >= (c + 1) * k), s"a=$a k=$k c=$c (>)")
      assert((a / k >= c) == (a >= c * k), s"a=$a k=$k c=$c (>=)")
    }
  }

  test("rule rewrites div-comparisons out of the optimized plan") {
    val df = graft.Tables.events(spark, sf0001)
      .filter("ts_ns div 1000000 > 1705276800000")
    // projections legitimately keep their `div` columns; the rule's
    // target is comparison predicates, so inspect Filter conditions only
    def hasDiv(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.exists(_.isInstanceOf[IntegralDivide]) => ()
      }.isDefined
    val before = df.queryExecution.optimizedPlan
    assert(hasDiv(before), s"expected a div in:\n$before")
    val after = DivComparisonPushdown(before)
    assert(!hasDiv(after), s"div should be rewritten:\n$after")
    // row sets identical
    val naive = df.count()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DivComparisonPushdown
    try {
      val rewritten = graft.Tables.events(spark, sf0001)
        .filter("ts_ns div 1000000 > 1705276800000")
      assert(rewritten.count() == naive)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThanOrEqual(ts,"),
        s"watermark must reach PushedFilters:\n$plan")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DivComparisonPushdown)
    }
  }
}
