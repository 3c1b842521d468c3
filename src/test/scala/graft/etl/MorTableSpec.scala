package graft.etl

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class MorTableSpec extends SparkSpec {
  import spark.implicits._

  private def rows(t: (String, Long, Double)*) = t.toSeq.toDF("k", "pc", "v")

  private def snapshot(dir: String): Seq[(String, Long, Double)] =
    MorTable.readSnapshot(spark, dir).as[(String, Long, Double)]
      .collect().toSeq.sortBy(_._1)

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("mor").toString + "/t"
    MorTable.create(rows(("a", 1L, 1.0), ("b", 1L, 2.0), ("c", 1L, 3.0)),
      dir, keys = Seq("k"), precombine = "pc")
    dir
  }

  test("snapshot read merges base, upserts, and tombstones") {
    val dir = freshTable()
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0), ("d", 1L, 4.0)))
    MorTable.deleteFrom(dir, Seq(("c", 9L)).toDF("k", "pc"))
    assert(snapshot(dir) == Seq(("a", 1L, 1.0), ("b", 2L, 20.0), ("d", 1L, 4.0)))
    assert(MorTable.state(dir).contains((0L, 2L)))
  }

  test("meta columns carry the writing commit and the record key") {
    val dir = freshTable()
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0), ("d", 1L, 4.0))) // seq 1
    MorTable.upsertInto(dir, rows(("d", 2L, 40.0)))                 // seq 2
    MorTable.deleteFrom(dir, Seq(("c", 9L)).toDF("k", "pc"))        // seq 3
    val got = MorTable.readSnapshotWithMeta(spark, dir)
      .selectExpr("k", "v", "_commit_seq", "_record_key")
      .as[(String, Double, Long, String)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      ("a", 1.0, 0L, "a"),   // untouched base row → commit 0
      ("b", 20.0, 1L, "b"),  // superseded in log 1
      ("d", 40.0, 2L, "d"))) // inserted log 1, superseded log 2
    // composite keys join with a comma (Hudi's record-key encoding)
    val dir2 = Files.createTempDirectory("morm").toString + "/t"
    MorTable.create(Seq(("x", 7L, 1L, 1.0)).toDF("k", "k2", "pc", "v"),
      dir2, keys = Seq("k", "k2"), precombine = "pc")
    assert(MorTable.readSnapshotWithMeta(spark, dir2)
      .selectExpr("_record_key").as[String].head() == "x,7")
  }

  test("on a precombine tie the later commit wins (delta shadows base)") {
    val dir = freshTable()
    MorTable.upsertInto(dir, rows(("a", 1L, 100.0)))
    assert(snapshot(dir).find(_._1 == "a").map(_._3).contains(100.0))
    MorTable.upsertInto(dir, rows(("a", 1L, 200.0)))
    assert(snapshot(dir).find(_._1 == "a").map(_._3).contains(200.0))
  }

  test("upserts append O(batch) logs and never rewrite the base") {
    val dir = freshTable()
    def baseFiles = Files.walk(Paths.get(s"$dir/base=0")).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .map(p => (p.toString, Files.getLastModifiedTime(p), Files.size(p)))
      .toSet
    val before = baseFiles
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0)))
    MorTable.upsertInto(dir, rows(("c", 2L, 30.0)))
    assert(baseFiles == before, "MOR upsert must not touch base files")
    val logs = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("log=")).toSeq.sorted
    assert(logs == Seq("log=0.1", "log=0.2"))
  }

  test("read-optimized view is the base only, stale by the log lag") {
    val dir = freshTable()
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0)))
    val ro = MorTable.readOptimized(spark, dir).as[(String, Long, Double)]
      .collect().toSeq.sortBy(_._1)
    assert(ro == Seq(("a", 1L, 1.0), ("b", 1L, 2.0), ("c", 1L, 3.0)))
  }

  test("incremental pull reads only the logs after the given sequence") {
    val dir = freshTable()
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0)))
    MorTable.upsertInto(dir, rows(("e", 1L, 5.0)))
    MorTable.deleteFrom(dir, Seq(("a", 9L)).toDF("k", "pc"))
    val pulled = MorTable.incrementalRead(spark, dir, sinceSeq = 1L)
      .select("k", "_seq", "_deleted").as[(String, Long, Boolean)]
      .collect().toSeq.sortBy(_._2)
    assert(pulled == Seq(("e", 2L, false), ("a", 3L, true)))
    assert(MorTable.incrementalRead(spark, dir, sinceSeq = 3L).count() == 0)
  }

  test("compaction folds logs into a new base without changing contents") {
    val dir = freshTable()
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0), ("d", 1L, 4.0)))
    MorTable.deleteFrom(dir, Seq(("c", 9L)).toDF("k", "pc"))
    val before = snapshot(dir)
    val newBase = MorTable.compact(spark, dir)
    assert(newBase == 1L && MorTable.state(dir).contains((1L, 0L)))
    assert(snapshot(dir) == before)
    // post-compaction the read-optimized view catches up to the snapshot
    val ro = MorTable.readOptimized(spark, dir).as[(String, Long, Double)]
      .collect().toSeq.sortBy(_._1)
    assert(ro == before)
    // the old generation is still readable until clean() retires it
    val cleaned = MorTable.clean(dir)
    assert(cleaned.toSet == Set("base=0", "log=0.1", "log=0.2"))
    assert(snapshot(dir) == before)
  }

  test("change seqs survive compaction: the stale-cursor aliasing window raises") {
    // the r12 hole: checkpoint seq 3 → compaction → new deltas land.
    // Under per-epoch numbering the new epoch's seqs 1.. re-passed the
    // since<=head guard and the consumer silently received seqs 4..5 of
    // a RENUMBERED feed — missing both the folded window and the new
    // epoch's 1..3. With the monotonic head the new deltas continue at
    // 5.. and a cursor below the floor fails loudly.
    val dir = freshTable()
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0))) // seq 1
    MorTable.upsertInto(dir, rows(("d", 1L, 4.0))) // seq 2
    MorTable.upsertInto(dir, rows(("e", 1L, 5.0))) // seq 3
    MorTable.upsertInto(dir, rows(("f", 1L, 6.0))) // seq 4
    val checkpoint = 3L // consumer has pulled through seq 3
    MorTable.compact(spark, dir) // folds 1..4; floor = head = 4
    MorTable.upsertInto(dir, rows(("g", 1L, 7.0))) // seq 5, NOT 1
    MorTable.upsertInto(dir, rows(("h", 1L, 8.0))) // seq 6
    assert(MorTable.changeHead(dir) == 6L)
    assert(MorTable.compactedThrough(dir) == 4L)
    // the stale cursor sits inside the folded window: loud re-sync,
    // never the new epoch's renumbered rows
    val err = intercept[IllegalArgumentException] {
      MorTable.incrementalRead(spark, dir, sinceSeq = checkpoint)
    }
    assert(err.getMessage.contains("re-sync"))
    // a cursor AT the floor is current through the fold: it gets
    // exactly the post-compaction commits, globally numbered
    val caught = MorTable.incrementalRead(spark, dir, sinceSeq = 4L)
      .select("k", "_seq").as[(String, Long)].collect().toSeq.sortBy(_._2)
    assert(caught == Seq(("g", 5L), ("h", 6L)))
    // live delta count (merge fan-in) still reads as 2, not 6
    assert(MorTable.state(dir).contains((1L, 2L)))
  }

  test("insert overwrite invalidates every pre-overwrite cursor loudly") {
    val dir = freshTable()
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0))) // seq 1
    val head = MorTable.changeHead(dir)
    MorTable.overwriteTable(dir, rows(("z", 1L, 99.0)))
    // the restate consumed a seq and ratcheted the floor past the old
    // head: even a consumer current as of the overwrite must re-sync
    val err = intercept[IllegalArgumentException] {
      MorTable.incrementalRead(spark, dir, sinceSeq = head)
    }
    assert(err.getMessage.contains("re-sync"))
    assert(MorTable.incrementalRead(spark, dir,
      sinceSeq = MorTable.changeHead(dir)).count() == 0)
  }

  test("props persist the key configuration across readers") {
    val dir = freshTable()
    val p = MorTable.props(dir)
    assert(p.keys == Seq("k") && p.precombine == "pc" && p.tieBreak.isEmpty)
  }

  // --- metadata-only bootstrap (Hudi METADATA_ONLY mode) ---

  /** Stage an external parquet "pre-existing dataset" and bootstrap a
    * table over it in place. Returns (source dir, table dir).
    */
  private def bootstrapped(): (String, String) = {
    val work = Files.createTempDirectory("boot")
    val src = work.resolve("src").toString
    // duplicate key "a" in the source: snapshot reads must resolve it
    rows(("a", 1L, 1.0), ("a", 2L, 10.0), ("b", 1L, 2.0), ("c", 1L, 3.0))
      .write.parquet(src)
    val dir = work.resolve("t").toString
    MorTable.bootstrap(spark, src, dir, keys = Seq("k"), precombine = "pc")
    (src, dir)
  }

  test("bootstrap is metadata-only: no data files written, source untouched") {
    val (src, dir) = bootstrapped()
    def srcFiles = Files.walk(Paths.get(src)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => (p.toString, Files.getLastModifiedTime(p), Files.size(p)))
      .toSet
    val before = srcFiles
    // the table dir holds ONLY metadata — no parquet anywhere
    val tableFiles = Files.walk(Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_)).map(_.getFileName.toString).toSet
    assert(tableFiles ==
      Set("_latest", "_props", "_bootstrap", "_history", "_commits"))
    // snapshot resolves the source's duplicate key in place
    assert(snapshot(dir) == Seq(("a", 2L, 10.0), ("b", 1L, 2.0), ("c", 1L, 3.0)))
    // upserts + deletes layer over the in-place source, never mutating it
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0), ("d", 1L, 4.0)))
    MorTable.deleteFrom(dir, Seq(("c", 9L)).toDF("k", "pc"))
    assert(snapshot(dir) ==
      Seq(("a", 2L, 10.0), ("b", 2L, 20.0), ("d", 1L, 4.0)))
    assert(srcFiles == before, "bootstrap source files must never change")
  }

  test("bootstrap read-optimized serves the raw source; compaction owns it") {
    val (src, dir) = bootstrapped()
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0)))
    // read-optimized before compaction = the raw source, dup keys and all
    assert(MorTable.readOptimized(spark, dir).count() == 4)
    val expected = snapshot(dir)
    MorTable.compact(spark, dir)
    assert(MorTable.state(dir).contains((1L, 0L)))
    // full-record migration: the source can now be retired entirely
    Files.walk(Paths.get(src)).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
    assert(snapshot(dir) == expected)
    assert(MorTable.readOptimized(spark, dir).count() == expected.size)
  }

  test("bootstrap validates key columns against the source footer") {
    val work = Files.createTempDirectory("bootv")
    val src = work.resolve("src").toString
    rows(("a", 1L, 1.0)).write.parquet(src)
    val err = intercept[IllegalArgumentException] {
      MorTable.bootstrap(spark, src, work.resolve("t").toString,
        keys = Seq("nope"), precombine = "pc")
    }
    assert(err.getMessage.contains("nope"))
  }

  test("concurrent delta appends serialize: distinct seqs, no lost log") {
    val dir = freshTable()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (1 to 4).map { i =>
      Future(MorTable.upsertInto(dir, rows((s"w$i", 2L, i.toDouble))))
    }
    val seqs = Await.result(Future.sequence(writers), 5.minutes)
    // every append got its own log sequence and the pointer saw all four
    assert(seqs.sorted == Seq(1L, 2L, 3L, 4L))
    assert(MorTable.state(dir).contains((0L, 4L)))
    val keys = snapshot(dir).map(_._1)
    assert(keys == Seq("a", "b", "c", "w1", "w2", "w3", "w4"))
  }

  test("versioned reads resolve any change seq across compactions") {
    val dir = freshTable()                                      // seq 0
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0), ("d", 1L, 4.0))) // 1
    MorTable.deleteFrom(dir, Seq(("c", 9L)).toDF("k", "pc"))    // seq 2
    MorTable.compact(spark, dir)                                // folds 1-2
    MorTable.upsertInto(dir, rows(("e", 1L, 5.0)))              // seq 3
    def asOf(c: Long): Seq[(String, Long, Double)] =
      MorTable.readVersion(spark, dir, c).as[(String, Long, Double)]
        .collect().toSeq.sortBy(_._1)
    assert(asOf(0L) == Seq(("a", 1L, 1.0), ("b", 1L, 2.0), ("c", 1L, 3.0)))
    assert(asOf(1L) == Seq(("a", 1L, 1.0), ("b", 2L, 20.0), ("c", 1L, 3.0),
      ("d", 1L, 4.0)))
    // seq 2 resolves through the OLD base + logs even though the live
    // pointer moved to the compacted base
    assert(asOf(2L) == Seq(("a", 1L, 1.0), ("b", 2L, 20.0), ("d", 1L, 4.0)))
    assert(asOf(3L) == snapshot(dir))
    intercept[IllegalArgumentException] { asOf(4L) }
    intercept[IllegalArgumentException] { asOf(-1L) }
    // a ts line whose pointer swing crashed (seq past the head) must
    // never be resolved by wall clock — clamp to the committed head
    Files.writeString(Paths.get(dir, "_commits"),
      s"9 ${System.currentTimeMillis()}\n",
      java.nio.file.StandardOpenOption.APPEND)
    assert(MorTable.resolveAsOf(dir, System.currentTimeMillis() + 1000) == 3L)
    // KEEP_LATEST_COMMITS retention: keep=3 guarantees seqs 1..3 stay
    // readable across the sweep (base0 + its logs survive)
    MorTable.clean(dir, keepVersions = 3)
    assert(asOf(1L) == Seq(("a", 1L, 1.0), ("b", 2L, 20.0), ("c", 1L, 3.0),
      ("d", 1L, 4.0)))
    // an unretained clean retires the pre-compaction dirs: history
    // reads fail loudly
    MorTable.clean(dir)
    val e = intercept[IllegalArgumentException] { asOf(1L) }
    assert(e.getMessage.contains("reclaimed by clean"))
    assert(asOf(3L) == snapshot(dir)) // the live window stays readable
  }

  test("savepoint pins (base, window) through compact+clean; restore restates") {
    val dir = freshTable()
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0)))
    val pinned = snapshot(dir)
    MorTable.savepoint(dir, "pin")
    assert(MorTable.savepoints(dir) == Seq("pin"))
    MorTable.upsertInto(dir, rows(("d", 1L, 4.0)))
    MorTable.deleteFrom(dir, Seq(("a", 9L)).toDF("k", "pc"))
    // compact supersedes the pinned base+window; clean must keep the
    // pinned base=0 and its log dirs alive
    MorTable.compact(spark, dir)
    MorTable.clean(dir)
    assert(Files.exists(Paths.get(dir, "base=0")) &&
      Files.exists(Paths.get(dir, "log=0.1")))
    val asOf = MorTable.readSavepoint(spark, dir, "pin")
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(asOf == pinned)
    // restore RESTATES (head monotonic — never a truncation): a new
    // base carries the pinned snapshot, one change seq consumed
    val headBefore = MorTable.changeHead(dir)
    MorTable.restoreSavepoint(spark, dir, "pin")
    assert(MorTable.changeHead(dir) == headBefore + 1)
    assert(snapshot(dir) == pinned)
    // unpin: clean may now reclaim the old window
    MorTable.dropSavepoint(dir, "pin")
    assert(MorTable.savepoints(dir).isEmpty)
    MorTable.clean(dir)
    assert(!Files.exists(Paths.get(dir, "base=0")))
    assert(snapshot(dir) == pinned)
  }

  test("cluster = compaction that sorts the folded base; content-preserving, no seq consumed") {
    val dir = freshTable()
    MorTable.upsertInto(dir, rows(("b", 2L, 20.0), ("d", 1L, 0.5)))
    val before = snapshot(dir)
    val head = MorTable.changeHead(dir)
    val base = MorTable.cluster(spark, dir, Seq("v"))
    assert(base == 1L && MorTable.changeHead(dir) == head)
    assert(snapshot(dir) == before)
    // the folded base is range-sorted by v: each file's rows arrive in
    // ascending v (one file here, but the ordering contract is pinned)
    val vs = spark.read.parquet(s"$dir/base=1").select("v")
      .as[Double].collect().toSeq
    assert(vs == vs.sorted)
    // a post-cluster commit continues the same seq domain
    MorTable.upsertInto(dir, rows(("e", 1L, 9.0)))
    assert(MorTable.changeHead(dir) == head + 1)
  }
}
