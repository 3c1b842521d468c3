package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the skew toolkit: `saltedJoin` must be
  * result-identical to the plain join under exactly the distribution it
  * exists for — one key carrying ≥30% of the fact table's mass (the
  * pathological skew AQE's splitter can't always rebalance).
  */
object ScaleProps extends Properties("Scale") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val hotKey = 0L

  /** Fact table: ~30-45% of rows on the hot key, the rest spread over a
    * small key space (guaranteeing both matched and unmatched keys).
    */
  private val factGen: Gen[List[(Long, Long)]] = for {
    nHot <- Gen.chooseNum(8, 15)
    nCold <- Gen.chooseNum(15, 25)
    hot <- Gen.listOfN(nHot, Gen.chooseNum(0L, 1000L).map((hotKey, _)))
    cold <- Gen.listOfN(nCold, for {
      k <- Gen.chooseNum(1L, 12L)
      v <- Gen.chooseNum(0L, 1000L)
    } yield (k, v))
  } yield hot ++ cold

  /** Build side: unique keys over a range that may or may not include
    * the hot key and may miss some fact keys entirely.
    */
  private val buildGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(0L, 10L).flatMap { lo =>
      Gen.chooseNum(lo, lo + 8).map(hi =>
        (lo to hi).toList.map(k => (k, s"dim$k")))
    }

  private val saltGen: Gen[Int] = Gen.chooseNum(2, 9)

  property("saltedJoin == plain join under 30%-mass key skew") =
    Prop.forAllNoShrink(factGen, buildGen, saltGen) { (f, b, salt) =>
      val fact = f.toDF("fk", "payload")
      val build = b.toDF("bk", "dim")
      val plain = fact.join(build, fact("fk") === build("bk"))
        .select("fk", "payload", "dim")
      val salted = Scale.saltedJoin(fact, build, "fk", "bk", salt)
        .select("fk", "payload", "dim")
      // multiset equality: duplicates in the fact side must be preserved
      // exactly once each, never replicated by the salt expansion
      salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty &&
        salted.count() == plain.count()
    }

  property("salt expansion replicates the build side, not the fact side") =
    Prop.forAllNoShrink(factGen, saltGen) { (f, salt) =>
      val fact = f.toDF("fk", "payload")
      val build = List((hotKey, "hot")).toDF("bk", "dim")
      val out = Scale.saltedJoin(fact, build, "fk", "bk", salt)
      out.count() == f.count(_._1 == hotKey)
    }
}
