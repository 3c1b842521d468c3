package graft.etl

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** SQL time travel over timeline-registered tables: VERSION AS OF and
  * TIMESTAMP AS OF resolve metadata-only against the instant log,
  * boundaries land on the right snapshot, pre-history timestamps and
  * non-timeline targets fail loudly, and instants written before
  * timestamps existed stay readable (and explicitly non-resolvable by
  * wall clock).
  */
class SqlReadSpec extends SparkSpec {
  import spark.implicits._

  private def mkTimeline(): String = {
    val p = Files.createTempDirectory("sqlread").toString + "/t"
    def up(rows: Seq[(Long, Long, Double)], clock: Long): Unit = {
      Timeline.upsertInto(spark, p, rows.toDF("k", "pc", "v"),
        keys = Seq("k"), precombine = "pc", atMs = Some(clock))
      ()
    }
    up(Seq((1L, 1L, 10.0), (2L, 1L, 20.0)), 1000L)     // v0
    up(Seq((2L, 2L, 22.0), (3L, 1L, 30.0)), 2000L)     // v1
    up(Seq((1L, 2L, 11.0)), 3000L)                     // v2
    p
  }

  test("VERSION AS OF and TIMESTAMP AS OF resolve the exact snapshot") {
    val p = mkTimeline()
    Catalog.registerTimelineTable(spark, "sqlread_t", p,
      keys = Seq("k"), precombine = "pc")
    def vals(sql: String): Map[Long, Double] =
      SqlRead.select(spark, sql).as[(Long, Long, Double)]
        .collect().map(r => r._1 -> r._3).toMap
    assert(vals("SELECT * FROM sqlread_t VERSION AS OF 0") ==
      Map(1L -> 10.0, 2L -> 20.0))
    // exactly AT an instant → that commit; between instants → the
    // earlier one; plain reference → latest
    assert(vals("SELECT * FROM sqlread_t TIMESTAMP AS OF 2000") ==
      Map(1L -> 10.0, 2L -> 22.0, 3L -> 30.0))
    assert(vals("SELECT * FROM sqlread_t TIMESTAMP AS OF 2999") ==
      Map(1L -> 10.0, 2L -> 22.0, 3L -> 30.0))
    assert(vals("SELECT * FROM sqlread_t") ==
      Map(1L -> 11.0, 2L -> 22.0, 3L -> 30.0))
    // composes with ordinary SQL against non-timeline relations
    Seq((1L, "a"), (3L, "b")).toDF("k", "tag")
      .createOrReplaceTempView("sqlread_dim")
    val joined = SqlRead.select(spark,
      """SELECT d.tag, count(*) AS n
        |FROM sqlread_t VERSION AS OF 1 t JOIN sqlread_dim d ON t.k = d.k
        |GROUP BY d.tag""".stripMargin)
      .as[(String, Long)].collect().toMap
    assert(joined == Map("a" -> 1L, "b" -> 1L))
  }

  test("pre-history timestamps, non-timeline targets, and bad specs fail loudly") {
    val p = mkTimeline()
    Catalog.registerTimelineTable(spark, "sqlread_e", p,
      keys = Seq("k"), precombine = "pc")
    val early = intercept[IllegalArgumentException] {
      SqlRead.select(spark, "SELECT * FROM sqlread_e TIMESTAMP AS OF 999")
        .collect()
    }
    assert(early.getMessage.contains("no commit at or before"))
    Seq((1L, 1.0)).toDF("k", "v").createOrReplaceTempView("sqlread_plain")
    val notTl = intercept[IllegalArgumentException] {
      SqlRead.select(spark, "SELECT * FROM sqlread_plain VERSION AS OF 1")
        .collect()
    }
    assert(notTl.getMessage.contains("not a versioned-layout"))
    val computed = intercept[IllegalArgumentException] {
      SqlRead.select(spark,
        "SELECT * FROM sqlread_e TIMESTAMP AS OF (1000 + 1000)").collect()
    }
    assert(computed.getMessage.contains("literal"))
  }

  test("instants predating timestamps stay readable; wall-clock resolve is refused") {
    val p = mkTimeline()
    // rewrite v0's instant in the legacy 3-field format
    val f = Paths.get(p, "_timeline", "0.commit")
    val Array(v, a, n, _) = Files.readString(f).trim.split(' ')
    Files.writeString(f, s"$v $a $n\n")
    val is = Timeline.instants(p)
    assert(is.map(_.version) == Seq(0L, 1L, 2L))
    assert(is.head.ts_ms == -1L && is(1).ts_ms == 2000L)
    // a timestamp before every TIMED instant names the untimed ones
    val e = intercept[IllegalArgumentException] {
      Timeline.resolveAsOf(p, 1500L)
    }
    assert(e.getMessage.contains("predate timestamps"))
    // but at/after a timed instant, resolution ignores the legacy one
    assert(Timeline.resolveAsOf(p, 5000L) == 2L)
  }

  test("plain SELECT over a non-timeline layout reads through the manifest") {
    val p = Files.createTempDirectory("sqlreadb").toString + "/t"
    BucketTable.create(
      Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("k", "pc", "v"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "sqlread_b", "bucket", p)
    // a raw catalog read sees the empty stub; SqlRead must not
    assert(spark.table("sqlread_b").count() == 0)
    assert(SqlRead.select(spark,
      "SELECT sum(v) AS s FROM sqlread_b").as[Double].head() == 30.0)
    // ...and time travel on it now WORKS by commit number (create is
    // commit 1); out-of-range and timestamp specs are loud
    assert(SqlRead.select(spark,
      "SELECT sum(v) AS s FROM sqlread_b VERSION AS OF 1")
      .as[Double].head() == 30.0)
    val e = intercept[IllegalArgumentException] {
      SqlRead.select(spark, "SELECT * FROM sqlread_b VERSION AS OF 0")
        .collect()
    }
    assert(e.getMessage.contains("commits run 1..1"))
    // timestamps resolve now (commit lines record wall clock); one
    // from before the table's birth is loud
    val e2 = intercept[IllegalArgumentException] {
      SqlRead.select(spark, "SELECT * FROM sqlread_b TIMESTAMP AS OF 999")
        .collect()
    }
    assert(e2.getMessage.contains("no commit at or before"))
  }

  test("full-key equality SELECT is index-served: one data file, never a scan") {
    val p = Files.createTempDirectory("sqlreadpr").toString + "/t"
    val rows = (1L to 200L).map(k => (k, 1L, k * 1.0))
    BloomTable.create(rows.toDF("k", "pc", "v"), p,
      keys = Seq("k"), precombine = "pc", numFiles = 8)
    RecordIndex.build(spark, p, numShards = 4)
    Catalog.registerLayoutTable(spark, "sqlread_pr", "bloom", p)
    val snapshotFiles = Catalog.readTable(spark, "sqlread_pr")
      .inputFiles.length
    assert(snapshotFiles == 8)
    val served = SqlRead.select(spark,
      "SELECT k, v FROM sqlread_pr WHERE k = 42")
    assert(served.as[(Long, Double)].collect().toSeq == Seq((42L, 42.0)))
    // the record index resolved the key to exactly one data file — the
    // snapshot scan (8 files) never happened
    assert(served.inputFiles.length == 1)
    // residual conjuncts still apply on top of the served file
    assert(SqlRead.select(spark,
      "SELECT k FROM sqlread_pr WHERE k = 42 AND v > 100").count() == 0)
    // reversed operand order and qualified references route too
    assert(SqlRead.select(spark,
      "SELECT t.v FROM sqlread_pr t WHERE 42 = t.k")
      .inputFiles.length == 1)
    // a non-key predicate falls through to the manifest-wide snapshot
    val full = SqlRead.select(spark,
      "SELECT k FROM sqlread_pr WHERE v = 42.0")
    assert(full.inputFiles.length == snapshotFiles)
    assert(full.as[Long].collect().toSeq == Seq(42L))
  }

  test("partition-column SELECT through SQL prunes to the matching partitions") {
    val p = Files.createTempDirectory("sqlreadpp").toString + "/t"
    val rows = (1L to 120L).map(k =>
      (s"d${(k % 4) + 1}", k, 1L, k * 1.0))
    PartitionedTable.create(rows.toDF("day", "k", "pc", "v"), p,
      keys = Seq("k"), precombine = "pc", partitionCols = Seq("day"))
    Catalog.registerLayoutTable(spark, "sqlread_pp", "partitioned", p)
    val allFiles = Catalog.readTable(spark, "sqlread_pp").inputFiles.length
    val served = SqlRead.select(spark,
      "SELECT k, v FROM sqlread_pp WHERE day = 'd2' AND v > 50")
    // only d2's partition dir is listed; the data-column conjunct is a
    // residual row filter, not a pruning blocker
    assert(served.inputFiles.nonEmpty &&
      served.inputFiles.forall(_.contains("=d2")))
    assert(served.inputFiles.length < allFiles)
    assert(served.as[(Long, Double)].collect().forall {
      case (k, v) => k % 4 == 1 && v > 50 })
    // qualified references prune too
    assert(SqlRead.select(spark,
      "SELECT t.k FROM sqlread_pp t WHERE t.day = 'd1'")
      .inputFiles.forall(_.contains("=d1")))
    // a data-only predicate falls through to the full snapshot
    assert(SqlRead.select(spark,
      "SELECT k FROM sqlread_pp WHERE v = 7.0").inputFiles.length == allFiles)
    // a predicate matching no partition is an empty scan, not an error
    assert(SqlRead.select(spark,
      "SELECT k FROM sqlread_pp WHERE day = 'zz'").count() == 0)
  }

  test("range SELECT on a stats-indexed table skips files and survives staleness") {
    val base = Files.createTempDirectory("sqlreadsk")
    val p = base.resolve("t").toString
    val stats = base.resolve("stats").toString
    val rows = (1L to 200L).map(k => (k, 1L, k * 1.0))
    BloomTable.create(rows.toDF("k", "pc", "v"), p,
      keys = Seq("k"), precombine = "pc", numFiles = 8)
    val live = BloomTable.read(spark, p).inputFiles.toSeq
    StatsIndex.buildFromFiles(spark, live, Seq("v"), stats)
    Catalog.registerLayoutTable(spark, "sqlread_sk", "bloom", p,
      statsIndex = Some(stats))
    val served = SqlRead.select(spark,
      "SELECT k FROM sqlread_sk WHERE v <= 25.0")
    // the zone maps prune: far fewer files planned than the manifest
    assert(served.inputFiles.nonEmpty && served.inputFiles.length < live.size)
    assert(served.as[Long].collect().toSet == (1L to 25L).toSet)
    // files the index has NOT seen are synced in, never skipped: the
    // upserted in-range row must appear through the same SQL route
    BloomTable.upsertInto(spark, p, Seq((500L, 1L, 10.5)).toDF("k", "pc", "v"))
    assert(SqlRead.select(spark,
      "SELECT k FROM sqlread_sk WHERE v <= 25.0")
      .as[Long].collect().toSet == ((1L to 25L).toSet + 500L))
    // a predicate on an un-indexed column falls through to the snapshot
    assert(SqlRead.select(spark,
      "SELECT k FROM sqlread_sk WHERE pc <= 1").count() == 201)
  }

  test("bucket-layout point SELECT reads only the key's bucket") {
    val p = Files.createTempDirectory("sqlreadpb").toString + "/t"
    val rows = (1L to 200L).map(k => (k, 1L, k * 1.0))
    BucketTable.create(rows.toDF("k", "pc", "v"), p,
      keys = Seq("k"), precombine = "pc", numBuckets = 8)
    Catalog.registerLayoutTable(spark, "sqlread_pb", "bucket", p)
    val served = SqlRead.select(spark,
      "SELECT k, v FROM sqlread_pb WHERE k = 7")
    assert(served.as[(Long, Double)].collect().toSeq == Seq((7L, 7.0)))
    val bucket = BucketTable.bucketOf(spark, p, Seq(7L))
    assert(served.inputFiles.nonEmpty &&
      served.inputFiles.forall(_.contains(s"__bucket=$bucket/")))
    // joins over the served relation still compose as plain SQL
    Seq((7L, "hit")).toDF("k", "tag").createOrReplaceTempView("sqlread_pb_dim")
    assert(SqlRead.select(spark,
      """SELECT d.tag FROM sqlread_pb t JOIN sqlread_pb_dim d ON t.k = d.k
        |WHERE t.k = 7""".stripMargin).as[String].collect().toSeq ==
      Seq("hit"))
  }

  test("SQL DML on a timeline table lands as new commits, history intact") {
    val p = mkTimeline()
    Catalog.registerTimelineTable(spark, "sqlread_dml", p,
      keys = Seq("k"), precombine = "pc")
    Seq((2L, 5L, 200.0), (9L, 1L, 90.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("sqlread_dml_src")
    SqlMerge.exec(spark,
      """MERGE INTO sqlread_dml t USING sqlread_dml_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    SqlMerge.exec(spark, "UPDATE sqlread_dml SET v = v * 2 WHERE k = 1")
    SqlMerge.exec(spark, "DELETE FROM sqlread_dml WHERE k = 3")
    val got = Catalog.readTable(spark, "sqlread_dml")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> 22.0, 2L -> 200.0, 9L -> 90.0))
    // each statement was one commit; the pre-DML snapshot still reads
    assert(Timeline.versions(p) == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    assert(SqlRead.select(spark,
      "SELECT * FROM sqlread_dml VERSION AS OF 2").count() == 3)
    val acts = Timeline.instants(p).map(_.action)
    assert(acts == Seq("commit", "commit", "commit", "commit", "update",
      "delete"))
  }

  test("timestamp-string literals parse as UTC") {
    val p = Files.createTempDirectory("sqlread2").toString + "/t"
    // clock = 2024-01-15T00:00:00Z
    Timeline.upsertInto(spark, p, Seq((1L, 1L, 1.0)).toDF("k", "pc", "v"),
      keys = Seq("k"), precombine = "pc", atMs = Some(1705276800000L))
    Catalog.registerTimelineTable(spark, "sqlread_s", p,
      keys = Seq("k"), precombine = "pc")
    assert(SqlRead.select(spark,
      "SELECT * FROM sqlread_s TIMESTAMP AS OF '2024-01-16'").count() == 1)
    val e = intercept[IllegalArgumentException] {
      SqlRead.select(spark,
        "SELECT * FROM sqlread_s TIMESTAMP AS OF '2024-01-14 23:59:59'")
        .collect()
    }
    assert(e.getMessage.contains("no commit at or before"))
  }

  test("TIMESTAMP AS OF resolves wall clock on every commit-logged layout") {
    def rows(t: (Long, Long, Double)*) = t.toSeq.toDF("k", "pc", "v")
    def vOf(sql: String): Seq[Double] =
      SqlRead.select(spark, sql).as[Double].collect().toSeq.sorted

    val bp = Files.createTempDirectory("tsb").toString + "/t"
    BucketTable.create(rows((1L, 1L, 1.0)), bp, keys = Seq("k"),
      precombine = "pc", numBuckets = 2)
    Thread.sleep(5); val tB = System.currentTimeMillis(); Thread.sleep(5)
    BucketTable.upsertInto(spark, bp, rows((1L, 2L, 9.0)))
    Catalog.registerLayoutTable(spark, "ts_bk", "bucket", bp)
    assert(vOf(s"SELECT v FROM ts_bk TIMESTAMP AS OF $tB") == Seq(1.0))
    assert(vOf(s"SELECT v FROM ts_bk TIMESTAMP AS OF " +
      s"${System.currentTimeMillis()}") == Seq(9.0))
    // pre-birth timestamps are loud (epoch 1s predates everything)
    intercept[IllegalArgumentException] {
      SqlRead.select(spark, "SELECT v FROM ts_bk TIMESTAMP AS OF 1000")
        .collect()
    }

    val lp = Files.createTempDirectory("tsl").toString + "/t"
    BloomTable.create(rows((1L, 1L, 1.0)), lp, keys = Seq("k"),
      precombine = "pc", numFiles = 2)
    Thread.sleep(5); val tL = System.currentTimeMillis(); Thread.sleep(5)
    BloomTable.upsertInto(spark, lp, rows((1L, 2L, 9.0)))
    Catalog.registerLayoutTable(spark, "ts_bl", "bloom", lp)
    assert(vOf(s"SELECT v FROM ts_bl TIMESTAMP AS OF $tL") == Seq(1.0))
    assert(vOf(s"SELECT v FROM ts_bl TIMESTAMP AS OF " +
      s"${System.currentTimeMillis()}") == Seq(9.0))

    val pp = Files.createTempDirectory("tsp").toString + "/t"
    PartitionedTable.create(
      Seq(("d1", 1L, 1L, 1.0)).toDF("day", "k", "pc", "v"), pp,
      keys = Seq("k"), precombine = "pc", partitionCols = Seq("day"))
    Thread.sleep(5); val tP = System.currentTimeMillis(); Thread.sleep(5)
    PartitionedTable.upsertInto(spark, pp,
      Seq(("d1", 1L, 2L, 9.0)).toDF("day", "k", "pc", "v"))
    Catalog.registerLayoutTable(spark, "ts_pt", "partitioned", pp)
    assert(vOf(s"SELECT v FROM ts_pt TIMESTAMP AS OF $tP") == Seq(1.0))
    assert(vOf(s"SELECT v FROM ts_pt TIMESTAMP AS OF " +
      s"${System.currentTimeMillis()}") == Seq(9.0))

    val mp = Files.createTempDirectory("tsm").toString + "/t"
    MorTable.create(rows((1L, 1L, 1.0)), mp, keys = Seq("k"),
      precombine = "pc")
    Thread.sleep(5); val tM = System.currentTimeMillis(); Thread.sleep(5)
    MorTable.upsertInto(mp, rows((1L, 2L, 9.0)))
    Catalog.registerLayoutTable(spark, "ts_mr", "mor", mp)
    assert(vOf(s"SELECT v FROM ts_mr TIMESTAMP AS OF $tM") == Seq(1.0))
    assert(vOf(s"SELECT v FROM ts_mr TIMESTAMP AS OF " +
      s"${System.currentTimeMillis()}") == Seq(9.0))
  }
}
