package graft.etl

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the bloom-index table: arbitrary
  * SEQUENCES of upserts and deletes applied through the full on-disk
  * lifecycle must agree with the in-memory reference semantics. This
  * pins what the single-batch specs can't: manifest bookkeeping as
  * candidate tagging splits every commit differently (append vs
  * rewrite, varying file counts), index reconciliation across many
  * versions, and that bloom FALSE POSITIVES (guaranteed to occur at
  * the default fp rate over enough generated batches) only cost extra
  * file rewrites, never wrong contents.
  */
object BloomTableProps extends Properties("BloomTable") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val row: Gen[(Long, Long, Double)] = for {
    k <- Gen.chooseNum(0L, 30L)
    pc <- Gen.chooseNum(0L, 50L)
    v <- Gen.chooseNum(0, 1000).map(_ / 10.0)
  } yield (k, pc, v)

  private val batch: Gen[List[(Long, Long, Double)]] = Gen.listOfN(12, row)
  private val batches: Gen[List[List[(Long, Long, Double)]]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, batch))

  private def reference(all: List[List[(Long, Long, Double)]]): Map[Long, (Long, Double)] =
    all.zipWithIndex.flatMap { case (b, i) => b.map(r => (r, i)) }
      .groupBy(_._1._1)
      .map { case (k, rows) =>
        val ((_, pc, v), _) = rows.maxBy { case ((_, pc, v), i) => (pc, i, v) }
        k -> (pc, v)
      }

  property("N-commit lifecycle equals latest-per-key over all batches") =
    Prop.forAllNoShrink(batches) { bs =>
      val dir = java.nio.file.Files.createTempDirectory("bloom-prop").toString + "/t"
      BloomTable.create(bs.head.toDF("k", "pc", "v"), dir,
        keys = Seq("k"), precombine = "pc", tieBreak = Seq("v"), numFiles = 3)
      bs.tail.foreach(b =>
        BloomTable.upsertInto(spark, dir, b.toDF("k", "pc", "v")))
      val got = BloomTable.read(spark, dir)
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val want = reference(bs)
      Prop(got == want) :| s"got $got, want $want"
    }

  property("interleaved deletes equal filter-then-merge of the reference") =
    Prop.forAllNoShrink(batches, Gen.listOfN(6, Gen.chooseNum(0L, 30L))) {
      (bs, delKeys) =>
        val dir = java.nio.file.Files.createTempDirectory("bloom-prop").toString + "/t"
        BloomTable.create(bs.head.toDF("k", "pc", "v"), dir,
          keys = Seq("k"), precombine = "pc", tieBreak = Seq("v"), numFiles = 3)
        bs.tail.foreach(b =>
          BloomTable.upsertInto(spark, dir, b.toDF("k", "pc", "v")))
        // delete AFTER all upserts; reference = merged state minus keys
        BloomTable.deleteFrom(spark, dir, delKeys.toDF("k"))
        val want = reference(bs) -- delKeys
        if (want.isEmpty)
          // every key died: the manifest must be empty (read() refuses
          // an empty table by contract)
          Prop(BloomTable.manifest(dir).isEmpty) :| "expected empty manifest"
        else {
          val got = BloomTable.read(spark, dir)
            .as[(Long, Long, Double)].collect()
            .map(r => r._1 -> (r._2, r._3)).toMap
          Prop(got == want) :| s"got $got, want $want"
        }
    }

  property("compaction and cleaning preserve the merged contents") =
    Prop.forAllNoShrink(batches) { bs =>
      val dir = java.nio.file.Files.createTempDirectory("bloom-prop").toString + "/t"
      BloomTable.create(bs.head.toDF("k", "pc", "v"), dir,
        keys = Seq("k"), precombine = "pc", tieBreak = Seq("v"), numFiles = 3)
      bs.tail.foreach(b =>
        BloomTable.upsertInto(spark, dir, b.toDF("k", "pc", "v")))
      val before = BloomTable.read(spark, dir)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      BloomTable.compact(spark, dir)
      BloomTable.clean(dir)
      val after = BloomTable.read(spark, dir)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      Prop(before == after) :| "compact+clean changed contents"
    }
}
