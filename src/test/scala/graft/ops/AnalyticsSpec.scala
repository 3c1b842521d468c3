package graft.ops

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the greatest right ts at-or-before each left row") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (1L, 50L, "c"), (2L, 100L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 60L), (1L, 150L), (3L, 10L)).toDF("k", "rt")
    val got = Analytics.asofJoin(left, right, "k", "t", "rt", "asof_t")
      .select("tag", "asof_t").as[(String, Option[Long])].collect().toMap
    assert(got("a").contains(60L), "100 → greatest right ≤ 100 is 60")
    assert(got("b").contains(150L))
    assert(got("c").isEmpty, "50 has no prior right row")
    assert(got("d").isEmpty, "key 2 has no right rows at all")
  }

  test("asofJoin matches an equal timestamp (at-or-before, not strictly-before)") {
    val left = Seq((1L, 100L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L)).toDF("k", "rt")
    val got = Analytics.asofJoin(left, right, "k", "t", "rt", "asof_t")
      .select("asof_t").as[Option[Long]].head()
    assert(got.contains(100L))
  }

  test("approx percentiles land within 2% of the exact values") {
    val exact = Analytics.percentiles(spark, sf0001)
      .select("l_returnflag", "price_p50", "price_p99")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val approx = Analytics.approxPercentiles(spark, sf0001)
      .as[(String, Double, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (flag, p50, p99) =>
      val (e50, e99) = exact(flag)
      assert(math.abs(p50 - e50) / e50 < 0.02, s"$flag p50 approx=$p50 exact=$e50")
      assert(math.abs(p99 - e99) / e99 < 0.02, s"$flag p99 approx=$p99 exact=$e99")
    }
  }

  test("sessions are disjoint, ordered, and cover all events") {
    val sess = Analytics.sessionize(spark, sf0001)
      .select("user_id", "session_id", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long, Long)].collect()
    val total = sess.map(_._3).sum
    assert(total == 1000, "every event lands in exactly one session")
    sess.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1L to ordered.length), "dense ids")
      ordered.sliding(2).foreach {
        case Array(prev, next) =>
          assert(next._4 - prev._5 > Analytics.SessionGapUs,
            "consecutive sessions separated by more than the gap")
        case _ =>
      }
      rows.foreach(r => assert(r._4 <= r._5))
    }
  }
}
