package graft.etl

import graft.SparkSpec
import java.nio.file.Files

class HudiLikeSpec extends SparkSpec {
  import spark.implicits._

  private def rows(t: (String, Long, Double)*) =
    t.toSeq.toDF("k", "pc", "v")

  test("precombineLatest keeps max precombine per key") {
    val got = HudiLike.precombineLatest(
      rows(("a", 1L, 1.0), ("a", 3L, 3.0), ("a", 2L, 2.0), ("b", 5L, 5.0)),
      Seq("k"), "pc")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 3L, 3.0), ("b", 5L, 5.0)))
  }

  test("precombineLatest breaks ties by tieBreak desc") {
    val df = Seq(("a", 1L, 10L), ("a", 1L, 20L)).toDF("k", "pc", "id")
    val got = HudiLike.precombineLatest(df, Seq("k"), "pc", Seq("id"))
      .as[(String, Long, Long)].collect()
    assert(got.toSeq == Seq(("a", 1L, 20L)))
  }

  test("upsert replaces matched keys, keeps unmatched, inserts new") {
    val existing = rows(("a", 1L, 1.0), ("b", 1L, 2.0))
    val incoming = rows(("b", 2L, 20.0), ("c", 1L, 30.0))
    val got = HudiLike.upsert(existing, incoming, Seq("k"), "pc")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 1L, 1.0), ("b", 2L, 20.0), ("c", 1L, 30.0)))
  }

  test("upsertPartial: null incoming fields inherit existing values") {
    val existing = Seq(("a", 1L, Some(1.0), Some("x")), ("b", 1L, Some(2.0), Some("y")))
      .toDF("k", "pc", "v", "tag")
    // a's update carries only v (tag null); c is a brand-new key with
    // a null field that has nothing to inherit
    val incoming = Seq(("a", 2L, Some(10.0), None: Option[String]),
      ("c", 1L, None: Option[Double], Some("z")))
      .toDF("k", "pc", "v", "tag")
    val got = HudiLike.upsertPartial(existing, incoming, Seq("k"), "pc")
      .as[(String, Long, Option[Double], Option[String])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a", 2L, Some(10.0), Some("x")), // v updated, tag inherited
      ("b", 1L, Some(2.0), Some("y")),  // untouched
      ("c", 1L, None, Some("z"))))      // nothing to inherit stays null
  }

  test("upsertPartial: stale incoming fills gaps but never overrides newer values") {
    val existing = Seq(("a", 5L, Some(1.0), None: Option[String]))
      .toDF("k", "pc", "v", "tag")
    // older record arrives late carrying a tag the newer row lacks:
    // column-wise latest-non-null takes v from pc=5, tag from pc=3
    val incoming = Seq(("a", 3L, Some(99.0), Some("late")))
      .toDF("k", "pc", "v", "tag")
    val got = HudiLike.upsertPartial(existing, incoming, Seq("k"), "pc")
      .as[(String, Long, Option[Double], Option[String])].collect()
    assert(got.toSeq == Seq(("a", 5L, Some(1.0), Some("late"))))
  }

  test("upsert: stale incoming loses to newer existing (precombine wins)") {
    val existing = rows(("a", 5L, 50.0))
    val incoming = rows(("a", 3L, 30.0))
    val got = HudiLike.upsert(existing, incoming, Seq("k"), "pc")
      .as[(String, Long, Double)].collect()
    assert(got.toSeq == Seq(("a", 5L, 50.0)))
  }

  test("upsert: incoming wins an exact precombine tie (Hudi payload rule)") {
    val existing = rows(("a", 5L, 1.0))
    val incoming = rows(("a", 5L, 2.0))
    val got = HudiLike.upsert(existing, incoming, Seq("k"), "pc")
      .as[(String, Long, Double)].collect()
    assert(got.toSeq == Seq(("a", 5L, 2.0)))
  }

  test("upsert supports composite keys (pipeline_name,created_at style)") {
    val existing = Seq(("p1", 10L, 1L, "old"), ("p1", 20L, 1L, "keep"))
      .toDF("name", "at", "pc", "v")
    val incoming = Seq(("p1", 10L, 2L, "new"), ("p2", 10L, 1L, "ins"))
      .toDF("name", "at", "pc", "v")
    val got = HudiLike.upsert(existing, incoming, Seq("name", "at"), "pc")
      .as[(String, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("p1", 10L, 2L, "new"), ("p1", 20L, 1L, "keep"), ("p2", 10L, 1L, "ins")))
  }

  test("upsert is idempotent and conserves the key union (seeded property)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val existing = rows(Seq.fill(30)(
        (s"k${rnd.nextInt(15)}", rnd.nextInt(100).toLong, rnd.nextDouble())): _*)
      val existingDeduped =
        HudiLike.precombineLatest(existing, Seq("k"), "pc", Seq("v"))
      val incoming = rows(Seq.fill(20)(
        (s"k${rnd.nextInt(20)}", rnd.nextInt(100).toLong, rnd.nextDouble())): _*)
      val once = HudiLike.upsert(existingDeduped, incoming, Seq("k"), "pc", Seq("v"))
      val twice = HudiLike.upsert(once, incoming, Seq("k"), "pc", Seq("v"))
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty,
        "upsert must be idempotent")
      val keyUnion = existingDeduped.select("k").union(incoming.select("k"))
        .distinct().count()
      assert(once.count() == keyUnion, "one row per distinct key")
    }
  }

  test("upsert evolves the schema: new incoming columns appear, nulls backfill") {
    val existing = Seq(("a", 1L, 1.0)).toDF("k", "pc", "v")
    val incoming = Seq(("b", 1L, 2.0, "extra")).toDF("k", "pc", "v", "note")
    val got = HudiLike.upsert(existing, incoming, Seq("k"), "pc")
    assert(got.columns.toSeq == Seq("k", "pc", "v", "note"))
    val rows = got.as[(String, Long, Double, Option[String])]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("a", 1L, 1.0, None), ("b", 1L, 2.0, Some("extra"))))
    // a batch missing a column nulls it on replaced rows only
    val narrow = Seq(("a", 2L)).toDF("k", "pc")
    val got2 = HudiLike.upsert(got, narrow, Seq("k"), "pc")
      .as[(String, Long, Option[Double], Option[String])].collect().sortBy(_._1)
    assert(got2.toSeq == Seq(
      ("a", 2L, None, None), ("b", 1L, Some(2.0), Some("extra"))))
  }

  test("upsertInto commits atomically and merges on re-upsert") {
    val dir = Files.createTempDirectory("hudilike").toString + "/table"
    HudiLike.upsertInto(spark, dir, rows(("a", 1L, 1.0), ("b", 1L, 2.0)), Seq("k"), "pc")
    assert(spark.read.parquet(dir).count() == 2)
    HudiLike.upsertInto(spark, dir, rows(("b", 2L, 20.0), ("c", 1L, 3.0)), Seq("k"), "pc")
    val got = spark.read.parquet(dir).as[(String, Long, Double)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 1L, 1.0), ("b", 2L, 20.0), ("c", 1L, 3.0)))
  }

  test("commit swaps a symlink pointer: table path always resolves, old snapshots cleaned") {
    import java.nio.file.{Files => F, Paths}
    val parent = F.createTempDirectory("hudiptr")
    val dir = parent.toString + "/table"
    HudiLike.commit(rows(("a", 1L, 1.0)), dir)
    val target = Paths.get(dir)
    assert(F.isSymbolicLink(target), "table path must be an atomic pointer")
    val firstSnap = F.readSymbolicLink(target)
    HudiLike.commit(rows(("a", 2L, 9.0), ("b", 1L, 2.0)), dir)
    assert(F.isSymbolicLink(target) && F.readSymbolicLink(target) != firstSnap)
    assert(spark.read.parquet(dir).count() == 2)
    // cleaning: exactly one snapshot dir remains alongside the pointer
    val siblings = F.list(parent).iterator()
    var snaps = 0
    while (siblings.hasNext) {
      val n = siblings.next().getFileName.toString
      if (n.contains(".snap-")) snaps += 1
    }
    assert(snaps == 1, "previous snapshot must be cleaned after the swap")
  }

  test("commit migrates a legacy plain-dir table to the pointer layout") {
    val dir = Files.createTempDirectory("hudimig").toString + "/table"
    rows(("a", 1L, 1.0)).write.parquet(dir) // legacy: real directory
    HudiLike.commit(rows(("a", 2L, 5.0)), dir)
    assert(java.nio.file.Files.isSymbolicLink(java.nio.file.Paths.get(dir)))
    val got = spark.read.parquet(dir).as[(String, Long, Double)].collect()
    assert(got.toSeq == Seq(("a", 2L, 5.0)))
  }
}
