package graft.etl

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the bucket-index table: an arbitrary
  * SEQUENCE of upsert batches applied through the full on-disk
  * lifecycle (create → N partial-rewrite commits → read) must agree
  * with the in-memory reference semantics — latest (pc, then v) row
  * per key over the concatenation of all batches. This pins the parts
  * the single-batch specs can't: manifest bookkeeping across many
  * commits, bucket routing stability, and merge associativity over
  * commit boundaries.
  */
object BucketTableProps extends Properties("BucketTable") {

  // each sample exercises a full on-disk lifecycle (several parquet
  // commits + reads); 12 generated lifecycles is plenty of coverage at
  // ~unit-test cost, where ScalaCheck's default 100 would take minutes
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val row: Gen[(String, Long, Double)] = for {
    k <- Gen.chooseNum(0, 12).map(i => s"k$i")
    pc <- Gen.chooseNum(0L, 50L)
    v <- Gen.chooseNum(0, 1000).map(_ / 10.0)
  } yield (k, pc, v)

  private val batch: Gen[List[(String, Long, Double)]] = Gen.listOfN(12, row)
  private val batches: Gen[List[List[(String, Long, Double)]]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, batch))

  /** Reference: latest row per key by (pc, then v as tie-break, then
    * later batch wins) — the same ordering `HudiLike.upsert` applies
    * with tieBreak = v and incoming-wins.
    */
  private def reference(all: List[List[(String, Long, Double)]]): Map[String, (Long, Double)] =
    all.zipWithIndex.flatMap { case (b, i) => b.map(r => (r, i)) }
      .groupBy(_._1._1)
      .map { case (k, rows) =>
        val ((_, pc, v), _) = rows.maxBy { case ((_, pc, v), i) => (pc, i, v) }
        // maxBy (pc, batch index, v): later batches win precombine ties
        // (HudiLike.upsert's __src ordering), v breaks within-batch ties
        k -> (pc, v)
      }

  property("N-commit lifecycle equals latest-per-key over all batches") =
    Prop.forAllNoShrink(batches) { bs =>
      val dir = java.nio.file.Files.createTempDirectory("bucket-prop").toString + "/t"
      BucketTable.create(bs.head.toDF("k", "pc", "v"), dir,
        keys = Seq("k"), precombine = "pc", tieBreak = Seq("v"), numBuckets = 4)
      bs.tail.foreach(b =>
        BucketTable.upsertInto(spark, dir, b.toDF("k", "pc", "v")))
      val got = BucketTable.read(spark, dir)
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val want = reference(bs)
      Prop(got == want) :| s"got $got, want $want"
    }

  property("compaction and cleaning preserve the merged contents") =
    Prop.forAllNoShrink(batches) { bs =>
      val dir = java.nio.file.Files.createTempDirectory("bucket-prop").toString + "/t"
      BucketTable.create(bs.head.toDF("k", "pc", "v"), dir,
        keys = Seq("k"), precombine = "pc", tieBreak = Seq("v"), numBuckets = 4)
      bs.tail.foreach(b =>
        BucketTable.upsertInto(spark, dir, b.toDF("k", "pc", "v")))
      val before = BucketTable.read(spark, dir)
        .as[(String, Long, Double)].collect().sorted.toSeq
      BucketTable.compact(spark, dir)
      BucketTable.clean(dir)
      val after = BucketTable.read(spark, dir)
        .as[(String, Long, Double)].collect().sorted.toSeq
      Prop(before == after) :| s"compact+clean changed contents"
    }
}
