package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native as-of exec against the window-composed reference
  * implementation, plus plan-shape and edge-case checks.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of matches the union+window composition on events") {
    val native = graft.ops.Analytics.asofSignupNative(spark, sf0001)
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(r => (r._2, r._3, r._1))
    val composed = graft.ops.Analytics.asofSignup(spark, sf0001)
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(r => (r._2, r._3, r._1))
    assert(native.length == composed.length)
    assert(native.toSeq == composed.toSeq)
  }

  test("edge cases: no prior right row, exact-tie timestamp, unmatched key") {
    val left = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L))
      .toDF("k", "ts")
    val right = Seq((1L, 10L), (1L, 15L), (2L, 6L), (4L, 1L))
      .toDF("k", "rts")
    val got = AsOfJoin.asof(left, right, "k", "ts", "rts", "asof")
      .as[(Long, Long, Option[Long])].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, 10L, Some(10L)),  // tie: rts == ts matches
      (1L, 20L, Some(15L)),  // greatest rts <= 20
      (2L, 5L, None),        // right row exists but is later
      (3L, 7L, None)))       // key absent on right
  }

  test("null keys and null timestamps never match and never crash") {
    val left = Seq((Some(1L), Some(10L)), (None, Some(5L)), (Some(1L), None))
      .toDF("k", "ts")
    val right = Seq((Some(1L), Some(8L)), (None, Some(1L)))
      .toDF("k", "rts")
    val got = AsOfJoin.asof(left, right, "k", "ts", "rts", "asof")
      .as[(Option[Long], Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (Some(1L), Some(10L), Some(8L)), // normal match
      (None, Some(5L), None),          // null key: no match
      (Some(1L), None, None)))         // null ts: no match
  }

  test("exec plan co-partitions and sorts both children, no window") {
    val df = graft.ops.Analytics.asofSignupNative(spark, sf0001)
    df.count() // finalize the adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native exec missing:\n$plan")
    assert(!plan.contains("Window"), "native path must not fall back to a window")
    assert("hashpartitioning\\(user_id".r.findAllIn(plan.toLowerCase).length >= 2,
      s"both sides hash-partitioned on the key:\n$plan")
  }
}
