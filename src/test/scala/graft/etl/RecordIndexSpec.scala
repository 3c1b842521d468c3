package graft.etl

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class RecordIndexSpec extends SparkSpec {
  import spark.implicits._

  private def rows(t: (Long, Long, Double)*) = t.toSeq.toDF("k", "pc", "v")

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("rli").toString + "/t"
    BloomTable.create(
      rows((1 to 40).map(i => (i.toLong, 1L, i.toDouble)): _*), dir,
      keys = Seq("k"), precombine = "pc", numFiles = 4)
    RecordIndex.build(spark, dir, numShards = 8)
    dir
  }

  private def one(df: org.apache.spark.sql.DataFrame): (Long, Long, Double) =
    df.as[(Long, Long, Double)].collect() match {
      case Array(r) => r
      case other => fail(s"expected exactly one row, got ${other.length}")
    }

  test("fresh-index lookup resolves through exactly one shard and one file") {
    val dir = freshTable()
    assert(one(RecordIndex.lookup(spark, dir, Seq(7L))) == (7L, 1L, 7.0))
    // absent key on a fresh index is proven absent without a table read
    assert(RecordIndex.lookup(spark, dir, Seq(999L)).isEmpty)
    // the resolved plan reads ONE data file (the RLI's reason to exist)
    val scanned = RecordIndex.lookup(spark, dir, Seq(7L))
      .queryExecution.executedPlan.collectLeaves()
      .flatMap(_.asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
        .relation.location.inputFiles)
    assert(scanned.length == 1, s"lookup must touch one file, saw $scanned")
  }

  test("refresh after an upsert rewrites only affected shards, stays exact") {
    val dir = freshTable()
    val before = RecordIndex.shardVersions(dir)
    BloomTable.upsertInto(spark, dir, rows((7L, 2L, 70.0), (41L, 1L, 41.0)))
    val touched = RecordIndex.refresh(spark, dir)
    assert(touched.nonEmpty)
    val after = RecordIndex.shardVersions(dir)
    // untouched shards keep their version (no rewrite)
    (before.keySet -- touched).foreach(s => assert(after(s) == before(s)))
    assert(one(RecordIndex.lookup(spark, dir, Seq(7L))) == (7L, 2L, 70.0))
    assert(one(RecordIndex.lookup(spark, dir, Seq(41L))) == (41L, 1L, 41.0))
    // a key colocated with 7 moved file in the rewrite; index must track
    assert(one(RecordIndex.lookup(spark, dir, Seq(8L))) == (8L, 1L, 8.0))
  }

  test("stale index self-heals through the bloom fallback") {
    val dir = freshTable()
    BloomTable.upsertInto(spark, dir, rows((7L, 2L, 70.0)))
    // NO refresh: entry for 7 points at a retired file
    assert(one(RecordIndex.lookup(spark, dir, Seq(7L))) == (7L, 2L, 70.0))
    // absent key with lagging coverage must also stay correct
    assert(RecordIndex.lookup(spark, dir, Seq(999L)).isEmpty)
  }

  test("delete purge via staleKeys removes entries; lookups stay correct") {
    val dir = freshTable()
    val dels = Seq(7L).toDF("k")
    BloomTable.deleteFrom(spark, dir, dels)
    RecordIndex.refresh(spark, dir, staleKeys = Some(dels))
    assert(RecordIndex.lookup(spark, dir, Seq(7L)).isEmpty)
    assert(one(RecordIndex.lookup(spark, dir, Seq(8L))) == (8L, 1L, 8.0))
    // the purged key's entry is gone from its shard (not just masked)
    val nShards = RecordIndex.shards(dir)
    val entries = RecordIndex.shardVersions(dir).toSeq.map { case (s, v) =>
      spark.read.parquet(s"$dir/_rli/s=$s/v=$v")
    }.reduce(_.unionByName(_)).filter($"k" === 7L)
    assert(entries.isEmpty)
  }

  test("refresh reclaims crash debris at the next shard version") {
    val dir = freshTable()
    // simulate a writer that died between moveShards and the manifest
    // write: populated v=next dirs exist but the manifest still points
    // at v=0 — whichever shards the refresh touches must reclaim them
    RecordIndex.shardVersions(dir).keys.foreach { shard =>
      val debris = Paths.get(s"$dir/_rli/s=$shard/v=1")
      Files.createDirectories(debris)
      Files.writeString(debris.resolve("junk.parquet"), "not parquet")
    }
    BloomTable.upsertInto(spark, dir, rows((7L, 2L, 70.0)))
    val touched = RecordIndex.refresh(spark, dir)
    assert(touched.nonEmpty, "refresh must proceed over the debris")
    assert(one(RecordIndex.lookup(spark, dir, Seq(7L))) == (7L, 2L, 70.0))
  }

  test("index layout is bounded: shard files versioned, old versions cleaned") {
    val dir = freshTable()
    BloomTable.upsertInto(spark, dir, rows((1 to 40).map(i => (i.toLong, 2L, -i.toDouble)): _*))
    RecordIndex.refresh(spark, dir)
    // each shard dir holds exactly ONE live version after refresh
    val shardDirs = Files.list(Paths.get(s"$dir/_rli")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("s=")).toSeq
    shardDirs.foreach { sd =>
      val vs = Files.list(sd).iterator().asScala
        .filter(_.getFileName.toString.startsWith("v=")).toSeq
      assert(vs.length == 1, s"${sd.getFileName} holds ${vs.length} versions")
    }
    assert(one(RecordIndex.lookup(spark, dir, Seq(40L))) == (40L, 2L, -40.0))
  }
}
