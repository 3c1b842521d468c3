package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SecondaryIndexSpec extends SparkSpec {
  import spark.implicits._

  // (key, secondary, precombine, data)
  private def rows(t: (String, String, Long, Double)*) =
    t.toSeq.toDF("k", "cat", "pc", "v")

  private def fresh(): (String, String) = {
    val base = Files.createTempDirectory("secidx").toString
    (s"$base/primary", s"$base/index")
  }

  private def found(primary: String, index: String, cat: String): Set[String] =
    SecondaryIndex.lookup(spark, primary, index, Seq(cat))
      .select("k").as[String].collect().toSet

  test("lookup resolves by secondary value; stale mappings are tombstoned") {
    val (primary, index) = fresh()
    BucketTable.create(
      rows(("u1", "click", 1L, 1.0), ("u2", "view", 1L, 2.0),
        ("u3", "click", 1L, 3.0)),
      primary, keys = Seq("k"), precombine = "pc", numBuckets = 8)
    SecondaryIndex.create(spark, primary, index, secCols = Seq("cat"),
      numBuckets = 8)
    assert(found(primary, index, "click") == Set("u1", "u3"))

    // u1's current category moves click → view; u4 arrives as click
    SecondaryIndex.upsertThrough(spark, primary, index,
      rows(("u1", "view", 2L, 9.0), ("u4", "click", 1L, 4.0)))
    assert(found(primary, index, "click") == Set("u3", "u4"))
    assert(found(primary, index, "view") == Set("u1", "u2"))

    // flip back: u1 view → click must resurrect the (click, u1) mapping
    SecondaryIndex.upsertThrough(spark, primary, index,
      rows(("u1", "click", 3L, 10.0)))
    assert(found(primary, index, "click") == Set("u1", "u3", "u4"))
    assert(found(primary, index, "view") == Set("u2"))
    // and the fetched row is the CURRENT primary version
    val r = SecondaryIndex.lookup(spark, primary, index, Seq("click"))
      .filter($"k" === "u1").select("pc", "v").as[(Long, Double)].head()
    assert(r == ((3L, 10.0)))
  }

  test("a stale batch row loses the precombine race and the index follows the primary") {
    val (primary, index) = fresh()
    BucketTable.create(rows(("u1", "click", 5L, 1.0)),
      primary, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    SecondaryIndex.create(spark, primary, index, secCols = Seq("cat"),
      numBuckets = 4)
    // late-arriving older event must NOT re-point the index
    SecondaryIndex.upsertThrough(spark, primary, index,
      rows(("u1", "view", 2L, 0.0)))
    assert(found(primary, index, "click") == Set("u1"))
    assert(found(primary, index, "view") == Set.empty[String])
  }

  test("lookup scans one index bucket and only the matched keys' primary buckets") {
    val (primary, index) = fresh()
    val base = (1 to 64).map(i =>
      (s"u$i", if (i % 8 == 0) "rare" else s"cat${i % 4}", 1L, i.toDouble))
    BucketTable.create(rows(base: _*), primary,
      keys = Seq("k"), precombine = "pc", numBuckets = 16)
    SecondaryIndex.create(spark, primary, index, secCols = Seq("cat"),
      numBuckets = 16)
    val res = SecondaryIndex.lookup(spark, primary, index, Seq("rare"))
    assert(res.select("k").as[String].collect().toSet ==
      base.filter(_._2 == "rare").map(_._1).toSet)
    // the primary-side scan touches only the buckets owning the 8 hits
    val wanted = base.filter(_._2 == "rare").map(_._1)
    val buckets = wanted.map(k => BucketTable.bucketOf(spark, primary, Seq(k))).toSet
    val primFiles = res.inputFiles.filter(_.contains("/primary/")).toSeq
    assert(primFiles.nonEmpty && primFiles.forall(f =>
      buckets.exists(b => f.contains(s"__bucket=$b/"))),
      s"primary scan read unexpected buckets: $primFiles")
  }
}
