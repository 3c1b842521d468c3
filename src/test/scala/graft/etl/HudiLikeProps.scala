package graft.etl

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the upsert kernel (SURVEY.md §5.3):
  * idempotency, key conservation, and watermark monotonicity over
  * generated tables.
  */
object HudiLikeProps extends Properties("HudiLike") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val row: Gen[(String, Long, Double)] = for {
    k <- Gen.chooseNum(0, 12).map(i => s"k$i")
    pc <- Gen.chooseNum(0L, 50L)
    v <- Gen.chooseNum(0, 1000).map(_ / 10.0)
  } yield (k, pc, v)

  private val table: Gen[List[(String, Long, Double)]] =
    Gen.listOfN(25, row)

  // deduplicate a generated batch so `existing` is a valid keyed table
  private def dedup(rows: List[(String, Long, Double)]) =
    HudiLike.precombineLatest(rows.toDF("k", "pc", "v"), Seq("k"), "pc", Seq("v"))

  property("upsert is idempotent") = Prop.forAllNoShrink(table, table) { (e, i) =>
    val existing = dedup(e)
    val incoming = i.toDF("k", "pc", "v")
    val once = HudiLike.upsert(existing, incoming, Seq("k"), "pc", Seq("v"))
    val twice = HudiLike.upsert(once, incoming, Seq("k"), "pc", Seq("v"))
    once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty
  }

  property("upsert emits exactly one row per key in the key union") =
    Prop.forAllNoShrink(table, table) { (e, i) =>
      val existing = dedup(e)
      val incoming = i.toDF("k", "pc", "v")
      val merged = HudiLike.upsert(existing, incoming, Seq("k"), "pc", Seq("v"))
      val keyUnion = (e.map(_._1) ++ i.map(_._1)).distinct.size
      merged.count() == keyUnion &&
        merged.select("k").distinct().count() == keyUnion
    }

  property("upsert never decreases a key's precombine value") =
    Prop.forAllNoShrink(table, table) { (e, i) =>
      val existing = dedup(e)
      val incoming = i.toDF("k", "pc", "v")
      val before = existing.select("k", "pc").as[(String, Long)].collect().toMap
      val after = HudiLike.upsert(existing, incoming, Seq("k"), "pc", Seq("v"))
        .select("k", "pc").as[(String, Long)].collect().toMap
      before.forall { case (k, pc) => after(k) >= pc }
    }
}
