package graft.plans

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the native as-of exec: on arbitrary keyed
  * timestamped tables it must agree exactly with (a) the union+window
  * composition and (b) a straightforward in-memory reference.
  */
object AsOfJoinProps extends Properties("AsOfJoin") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // small key space + ts space forces key collisions, ties, and
  // duplicate timestamps — the regions where merge logic breaks
  private val leftRow: Gen[(Long, Long)] = for {
    k <- Gen.chooseNum(0L, 6L)
    ts <- Gen.chooseNum(0L, 30L)
  } yield (k, ts)

  private val rightRow: Gen[(Long, Long)] = for {
    k <- Gen.chooseNum(0L, 6L)
    rts <- Gen.chooseNum(0L, 30L)
  } yield (k, rts)

  property("matches an in-memory as-of reference") =
    Prop.forAllNoShrink(Gen.listOfN(30, leftRow), Gen.listOfN(30, rightRow)) {
      (ls, rs) =>
        // tag left rows with a unique id so duplicates stay comparable
        val left = ls.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
        val got = AsOfJoin.asof(
            left.toDF("id", "k", "ts"), rs.toDF("k", "rts"), "k", "ts", "rts", "asof")
          .as[(Long, Long, Long, Option[Long])].collect()
          .map(r => (r._1, r._4)).toMap
        val expected = left.map { case (id, k, ts) =>
          val cands = rs.filter(r => r._1 == k && r._2 <= ts).map(_._2)
          id -> (if (cands.isEmpty) None else Some(cands.max))
        }.toMap
        got == expected
    }
}
