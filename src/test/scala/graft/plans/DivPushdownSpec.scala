package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.IntegralDivide

class DivPushdownSpec extends SparkSpec {

  test("rewrite is semantically exact (trunc-div vs bound, incl. negatives)") {
    // each *Holds mirrors the rule's rewrite for that comparison
    def geHolds(a: Long, k: Long, c: Long): Boolean =
      if (c == 0) a > -k else a >= c * k
    def ltHolds(a: Long, k: Long, c: Long): Boolean =
      if (c == 0) a < 1 - k else a < c * k
    def leHolds(a: Long, k: Long, c: Long): Boolean = a < (c + 1) * k
    def eqHolds(a: Long, k: Long, c: Long): Boolean =
      if (c == 0) a > -k && a < k else a >= c * k && a < (c + 1) * k
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val a = rnd.nextLong() % 1000000
      val k = rnd.nextInt(999) + 1L
      val c = rnd.nextInt(1000).toLong
      assert((a / k > c) == (a >= (c + 1) * k), s"a=$a k=$k c=$c (>)")
      assert((a / k >= c) == geHolds(a, k, c), s"a=$a k=$k c=$c (>=)")
      assert((a / k < c) == ltHolds(a, k, c), s"a=$a k=$k c=$c (<)")
      assert((a / k <= c) == leHolds(a, k, c), s"a=$a k=$k c=$c (<=)")
      assert((a / k == c) == eqHolds(a, k, c), s"a=$a k=$k c=$c (=)")
    }
    // directed: the truncation-toward-zero region that randomized draws
    // almost never hit — a in (-k, 0) and the ±k boundaries, at c = 0
    for (k <- Seq(2L, 10L, 1000L); a <- Seq(-k, -k + 1, -k / 2, -1L, 0L, k - 1, k)) {
      assert((a / k >= 0L) == geHolds(a, k, 0L), s"a=$a k=$k (>= 0)")
      assert((a / k < 0L) == ltHolds(a, k, 0L), s"a=$a k=$k (< 0)")
      assert((a / k <= 0L) == leHolds(a, k, 0L), s"a=$a k=$k (<= 0)")
      assert((a / k == 0L) == eqHolds(a, k, 0L), s"a=$a k=$k (= 0)")
    }
  }

  test("tautological Long.MaxValue literal is left unrewritten (c+1 overflow guard)") {
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DivComparisonPushdown
    try {
      val df = Seq(-3L, 0L, 7L, Long.MaxValue).toDF("a")
      // c = Long.MaxValue: c+1 wraps; the rule must fall back to the raw
      // predicate instead of rewriting to an always-false bound
      val le = df.filter(s"a div 1 <= ${Long.MaxValue}").count()
      assert(le == 4, "tautological <= must keep every row")
      val gt = df.filter(s"a div 1 > ${Long.MaxValue}").count()
      assert(gt == 0)
      val eq = df.filter(s"a div 1 = ${Long.MaxValue}").count()
      assert(eq == 1)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DivComparisonPushdown)
    }
  }

  test("injected rule keeps negative rows under `div ... >= 0`") {
    import spark.implicits._
    val df = Seq(-11L, -10L, -9L, -5L, -1L, 0L, 3L, 10L).toDF("a")
    val naive = df.filter("a div 10 >= 0").collect().map(_.getLong(0)).sorted
    assert(naive.toSeq == Seq(-9L, -5L, -1L, 0L, 3L, 10L))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DivComparisonPushdown
    try {
      val rewritten = Seq(-11L, -10L, -9L, -5L, -1L, 0L, 3L, 10L).toDF("a")
        .filter("a div 10 >= 0").collect().map(_.getLong(0)).sorted
      assert(rewritten.toSeq == naive.toSeq, "rule must not drop (-k,0) rows")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DivComparisonPushdown)
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
      // Pushdown: the rewrite turns `div`-comparisons into plain range
      // predicates, which reach PushedFilters when the column is a raw
      // parquet long. `ts_ns` is a derived column since the testdata
      // moved event time to TIMESTAMP(MICROS) (Tables.normalizeTsNanos),
      // so assert the scan-pruning effect on lineitem's physical
      // `l_orderkey`;
      // the watermark path's own pushdown is covered by PlanAssertSpec's
      // extract-scan assertion.
      val pushed = graft.Tables.lineitem(spark, sf0001)
        .filter("l_orderkey div 100 > 5")
      assert(pushed.count() ==
        graft.Tables.lineitem(spark, sf0001).filter("l_orderkey >= 600").count())
      val plan = pushed.queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThanOrEqual(l_orderkey,"),
        s"rewritten bound must reach PushedFilters:\n$plan")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DivComparisonPushdown)
    }
  }
}
