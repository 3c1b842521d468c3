package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, minute: Int, user: Long, typ: String, v: Double) =
    EventRow(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), user, typ, v)

  test("windowed aggregation over a memory stream") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = StreamingPipeline.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win")
      .outputMode(OutputMode.Complete).start()
    input.addData(ev(1, 5, 1, "click", 1.0), ev(2, 15, 1, "click", 2.0),
      ev(3, 20, 2, "view", 3.0))
    q.processAllAvailable()
    val rows = spark.table("win")
      .select("event_type", "n", "total").as[(String, Long, Double)]
      .collect().toSet
    assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
    q.stop()
  }

  test("streaming dedup drops replayed event_ids") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = StreamingPipeline.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    input.addData(ev(1, 1, 1, "a", 1.0), ev(2, 2, 1, "b", 2.0))
    q.processAllAvailable()
    input.addData(ev(1, 1, 1, "a", 1.0), ev(3, 3, 2, "c", 3.0)) // replay id 1
    q.processAllAvailable()
    val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
    q.stop()
  }

  test("session_window groups events by 30-minute gaps per user") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = StreamingPipeline.sessionWindows(input.toDF())
      .writeStream.format("memory").queryName("sess_win")
      .outputMode(OutputMode.Complete).start()
    // user 1: 10:01, 10:10 (same session), 10:55 (new session: 45' gap)
    input.addData(ev(1, 1, 1, "a", 1.0), ev(2, 10, 1, "a", 2.0), ev(3, 55, 1, "a", 4.0))
    q.processAllAvailable()
    val rows = spark.table("sess_win")
      .select("user_id", "n_events", "total").as[(Long, Long, Double)]
      .collect().sortBy(_._3)
    assert(rows.toSeq == Seq((1L, 2L, 3.0), (1L, 1L, 4.0)))
    q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replays inside the interval") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = StreamingPipeline.dedupWithinWatermark(input.toDF())
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append).start()
    input.addData(ev(1, 1, 1, "a", 1.0), ev(2, 2, 1, "b", 2.0))
    q.processAllAvailable()
    input.addData(ev(1, 1, 1, "a", 1.0), ev(4, 4, 2, "d", 4.0)) // replay id 1
    q.processAllAvailable()
    val ids = spark.table("dedup_wm").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 4L))
    q.stop()
  }

  test("stateful user sessions accumulate across micro-batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = StreamingPipeline.userSessions(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update).start()
    input.addData(ev(1, 1, 7, "a", 1.5), ev(2, 2, 7, "b", 2.5))
    q.processAllAvailable()
    input.addData(ev(3, 3, 7, "c", 1.0))
    q.processAllAvailable()
    val last = spark.table("sessions").as[UserSession].collect()
      .filter(_.user_id == 7).maxBy(_.n_events)
    assert(last == UserSession(7L, 3L, 5.0, 3L))
    q.stop()
  }

  test("transformWithState running totals match the flatMapGroupsWithState twin") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[EventRow]
      val q = StreamingPipeline.userSessionsTws(input.toDS())
        .writeStream.format("memory").queryName("sessions_tws")
        .outputMode(OutputMode.Update).start()
      input.addData(ev(1, 1, 7, "a", 1.5), ev(2, 2, 7, "b", 2.5))
      q.processAllAvailable()
      input.addData(ev(3, 3, 7, "c", 1.0))
      q.processAllAvailable()
      val last = spark.table("sessions_tws").as[UserSession].collect()
        .filter(_.user_id == 7).maxBy(_.n_events)
      assert(last == UserSession(7L, 3L, 5.0, 3L))
      q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-static join enriches events against a dimension") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventRow]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = StreamingPipeline.enrichAgainstStatic(input.toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    input.addData(ev(1, 1, 1, "click", 1.0), ev(2, 2, 3, "view", 2.0))
    q.processAllAvailable()
    val got = spark.table("enriched").select("event_id", "tier")
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("gold"))
    assert(got(2L).isEmpty, "unknown user keeps null tier (left join)")
    q.stop()
  }

  test("stream-stream join matches clicks to signups within the hour") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[EventRow]
    val signups = MemoryStream[EventRow]
    val q = StreamingPipeline.streamStreamJoin(clicks.toDF(), signups.toDF())
      .writeStream.format("memory").queryName("attributed")
      .outputMode(OutputMode.Append).start()
    signups.addData(ev(100, 0, 7, "signup", 0.0))
    clicks.addData(
      ev(1, 30, 7, "click", 1.0),  // 30 min after signup → match
      ev(2, 10, 8, "click", 1.0))  // different user → no match
    q.processAllAvailable()
    val got = spark.table("attributed").select("click_id", "user_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 7L)))
    q.stop()
  }

  // Stage a DataFrame as one parquet file under dir (FileStreamSource
  // wants a directory of files; the frame must already carry ts as
  // epoch-nanos long to match eventsNanosSchema).
  private def stageOneFile(df: org.apache.spark.sql.DataFrame,
      scratch: String, name: String, destDir: String): Unit = {
    df.coalesce(1).write.parquet(s"$scratch/$name")
    val listing = Files.list(java.nio.file.Paths.get(s"$scratch/$name"))
    val part =
      try listing.filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      finally listing.close()
    Files.createDirectories(java.nio.file.Paths.get(destDir))
    Files.copy(part, java.nio.file.Paths.get(s"$destDir/$name.parquet"))
  }

  test("streaming ingest upserts into the HudiLike target (batch parity)") {
    val base = Files.createTempDirectory("stream").toString
    stageOneFile(graft.Tables.eventsRaw(spark, s"$sf0001/events.parquet"),
      base, "events", s"$base/src")
    StreamingPipeline.runIngest(spark, s"$base/src",
      s"$base/target", s"$base/ckpt")
    val target = spark.read.parquet(s"$base/target")
    assert(target.count() == 1000)
    assert(target.select("record_id").distinct().count() == 1000)
    // parity with the batch extract's keys
    val batchKeys = graft.etl.Pipeline
      .extract(spark, s"$sf0001/events.parquet", None)
      .select("record_id").as[String].collect().toSet
    val streamKeys = target.select("record_id").as[String].collect().toSet
    assert(streamKeys == batchKeys)
  }

  test("bucketed streaming ingest: multi-batch delivery, partial rewrites, batch parity") {
    val base = Files.createTempDirectory("streamb").toString
    // stage the events table as TWO files so maxFilesPerTrigger=1
    // forces two micro-batches: create on batch 0, partial-rewrite
    // upsert on batch 1
    val raw = graft.Tables.eventsRaw(spark, s"$sf0001/events.parquet")
    stageOneFile(raw.filter($"event_id" % 2 === 0), base, "half0", s"$base/src")
    stageOneFile(raw.filter($"event_id" % 2 =!= 0), base, "half1", s"$base/src")
    StreamingPipeline.runIngestBucketed(spark, s"$base/src",
      s"$base/target", s"$base/ckpt")
    val target = graft.etl.BucketTable.read(spark, s"$base/target")
    assert(target.count() == 1000)
    val batchKeys = graft.etl.Pipeline
      .extract(spark, s"$sf0001/events.parquet", None)
      .select("record_id").as[String].collect().toSet
    val streamKeys = target.select("record_id").as[String].collect().toSet
    assert(streamKeys == batchKeys, "bucketed sink must reach batch-extract parity")
    // both micro-batches committed: some buckets must sit at a later
    // generation than the create
    val gens = graft.etl.BucketTable.manifest(s"$base/target").values.toSet
    assert(gens.exists(_ > 0L),
      s"second micro-batch must have produced a new generation, got $gens")
  }

  test("ingest resumes from the checkpoint across restarts, exactly once") {
    val base = Files.createTempDirectory("streamr").toString
    val raw = graft.Tables.eventsRaw(spark, s"$sf0001/events.parquet")
    // run 1: only the even half exists — the "process dies" after it
    stageOneFile(raw.filter($"event_id" % 2 === 0), base, "half0", s"$base/src")
    StreamingPipeline.runIngestBucketed(spark, s"$base/src",
      s"$base/target", s"$base/ckpt")
    val afterRun1 = graft.etl.BucketTable.read(spark, s"$base/target").count()
    assert(afterRun1 == 500)
    // run 2 (the restart): odd half lands; the SAME checkpoint must
    // replay nothing from run 1 and fold only the new file
    stageOneFile(raw.filter($"event_id" % 2 =!= 0), base, "half1", s"$base/src")
    StreamingPipeline.runIngestBucketed(spark, s"$base/src",
      s"$base/target", s"$base/ckpt")
    val target = graft.etl.BucketTable.read(spark, s"$base/target")
    assert(target.count() == 1000)
    assert(target.select("record_id").distinct().count() == 1000,
      "restart must not re-apply run 1's batch")
    // run 3: nothing new — a pure no-op, the table state untouched
    val manifestBefore = graft.etl.BucketTable.manifest(s"$base/target")
    StreamingPipeline.runIngestBucketed(spark, s"$base/src",
      s"$base/target", s"$base/ckpt")
    assert(graft.etl.BucketTable.manifest(s"$base/target") == manifestBefore,
      "an empty restart must not commit a generation")
  }

  test("MOR change stream: same checkpoint emits each commit exactly once") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("morstream")
    val path = base.resolve("t").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts_us"))
    val split = graft.ops.PipelineQueries.SplitUs
    graft.etl.MorTable.create(ev.filter(col("ts_us") <= split), path,
      keys = Seq("user_id"), precombine = "ts_us", tieBreak = Seq("event_id"))
    val n1 = graft.etl.MorTable.incrementalRead(spark, {
      graft.etl.MorTable.upsertInto(path, ev.filter(col("ts_us") > split)); path
    }, sinceSeq = 0L).count()
    // pass 1 drains commit 1
    StreamingPipeline.runTableChangeStream(spark, path, out, ckpt)
    assert(spark.read.parquet(out).count() == n1)
    // commit 2 (tombstones), pass 2 with the SAME checkpoint: only the
    // new log flows — nothing from commit 1 is re-emitted
    graft.etl.MorTable.deleteFrom(path,
      ev.filter(col("user_id") % 5 === 0).select(col("user_id")).distinct()
        .withColumn("ts_us", org.apache.spark.sql.functions.lit(Long.MaxValue / 2)))
    StreamingPipeline.runTableChangeStream(spark, path, out, ckpt)
    val all = spark.read.parquet(out)
    val n2 = all.filter(col("_seq") === 2L).count()
    assert(n2 > 0, "pass 2 delivered the tombstone commit")
    assert(all.count() == n1 + n2, "no replay of already-consumed commits")
    assert(all.filter(col("_seq") === 1L).count() == n1)
    assert(all.filter(col("_deleted")).count() == n2,
      "schema-sparse tombstone log reads under the explicit schema")
    // pass 3: nothing new — the sink is untouched
    StreamingPipeline.runTableChangeStream(spark, path, out, ckpt)
    assert(spark.read.parquet(out).count() == n1 + n2)
  }

  test("MOR change stream survives source compaction and cleaning") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("morcmp")
    val path = base.resolve("t").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts_us"))
    val split = graft.ops.PipelineQueries.SplitUs
    graft.etl.MorTable.create(ev.filter(col("ts_us") <= split), path,
      keys = Seq("user_id"), precombine = "ts_us", tieBreak = Seq("event_id"))
    graft.etl.MorTable.upsertInto(path,
      ev.filter(col("ts_us") > split && col("user_id") % 2 === 0))
    StreamingPipeline.runTableChangeStream(spark, path, out, ckpt)
    val n1 = spark.read.parquet(out).count()
    assert(n1 > 0)
    // compaction folds the consumed log into a new base and cleaning
    // removes the old generation's files — the stream's checkpoint
    // must neither break on the vanished files nor re-emit anything
    graft.etl.MorTable.compact(spark, path)
    graft.etl.MorTable.clean(path)
    StreamingPipeline.runTableChangeStream(spark, path, out, ckpt)
    assert(spark.read.parquet(out).count() == n1,
      "no re-emission after compaction/clean")
    // a post-compaction commit (new base's log sequence) still flows
    graft.etl.MorTable.upsertInto(path,
      ev.filter(col("ts_us") > split && col("user_id") % 2 =!= 0))
    StreamingPipeline.runTableChangeStream(spark, path, out, ckpt)
    val n2 = spark.read.parquet(out).count()
    assert(n2 > n1, "commits after compaction are delivered")
  }

  test("change stream straddling inline compaction: exact delivery, or loud failure after clean") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("morstraddle")
    val path = base.resolve("t").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts_us"))
    val split = graft.ops.PipelineQueries.SplitUs
    graft.etl.MorTable.create(ev.filter(col("ts_us") <= split), path,
      keys = Seq("user_id"), precombine = "ts_us", tieBreak = Seq("event_id"))
    graft.etl.MorTable.upsertInto(path, // seq 1 — consumed by pass 1
      ev.filter(col("ts_us") > split && col("user_id") % 3 === 0))
    StreamingPipeline.runTableChangeStream(spark, path, out, ckpt)
    val n1 = spark.read.parquet(out).count()
    // seq 2 lands UNCONSUMED, inline compaction folds 1..2 (floor=2),
    // seq 3 lands in the new epoch — the straddling pass must deliver
    // exactly seqs 2 and 3, globally numbered (never a renumbered or
    // partial feed)
    graft.etl.MorTable.upsertInto(path,
      ev.filter(col("ts_us") > split && col("user_id") % 3 === 1))
    graft.etl.MorTable.compact(spark, path)
    graft.etl.MorTable.upsertInto(path,
      ev.filter(col("ts_us") > split && col("user_id") % 3 === 2))
    assert(graft.etl.MorTable.compactedThrough(path) == 2L &&
      graft.etl.MorTable.changeHead(path) == 3L)
    StreamingPipeline.runTableChangeStream(spark, path, out, ckpt)
    val all = spark.read.parquet(out)
    val delivered = all.select("_seq").distinct()
      .as[Long].collect().toSeq.sorted
    assert(delivered == Seq(1L, 2L, 3L),
      s"straddling pass must deliver the folded-but-on-disk commit AND " +
        s"the new epoch's, got seqs $delivered")
    assert(all.filter(col("_seq") === 1L).count() == n1,
      "no re-emission of the consumed commit")
    // seq 4 lands unconsumed, compaction folds it AND clean removes the
    // folded log before this consumer read it: the next pass must fail
    // LOUDLY, never silently skip the vanished commit
    graft.etl.MorTable.upsertInto(path,
      ev.filter(col("ts_us") > split && col("user_id") % 7 === 0))
    graft.etl.MorTable.compact(spark, path)
    graft.etl.MorTable.clean(path)
    val err = intercept[IllegalArgumentException] {
      StreamingPipeline.runTableChangeStream(spark, path, out, ckpt)
    }
    assert(err.getMessage.contains("re-sync"), err.getMessage)
    assert(spark.read.parquet(out).count() == all.count(),
      "the refused pass must not write a partial feed")
  }

  test("table-to-table replication converges to the source snapshot; empty pass is a no-op") {
    import org.apache.spark.sql.functions.{col, lit}
    val base = Files.createTempDirectory("t2t")
    val src = base.resolve("src").toString
    val tgt = base.resolve("tgt").toString
    val ckpt = base.resolve("ckpt").toString
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts_us"))
    val split = graft.ops.PipelineQueries.SplitUs
    graft.etl.MorTable.create(ev.filter(col("ts_us") <= split), src,
      keys = Seq("user_id"), precombine = "ts_us", tieBreak = Seq("event_id"))
    graft.etl.BucketTable.create(
      graft.etl.MorTable.readOptimized(spark, src), tgt,
      keys = Seq("user_id"), precombine = "ts_us", tieBreak = Seq("event_id"))
    graft.etl.MorTable.upsertInto(src, ev.filter(col("ts_us") > split))
    graft.etl.MorTable.deleteFrom(src,
      ev.filter(col("user_id") % 5 === 0).select(col("user_id")).distinct()
        .withColumn("ts_us", lit(Long.MaxValue / 2)))
    StreamingPipeline.runTableToTable(spark, src, tgt, ckpt,
      keys = Seq("user_id"), precombine = "ts_us", tieBreak = Seq("event_id"))
    val snapshot = graft.etl.MorTable.readSnapshot(spark, src)
      .collect().map(_.toString).sorted
    val replicated = graft.etl.BucketTable.read(spark, tgt)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts_us")).collect().map(_.toString).sorted
    assert(replicated.sameElements(snapshot),
      "downstream equals the source snapshot, deletes included")
    // nothing new: the pass must not commit a generation downstream
    val before = graft.etl.BucketTable.manifest(tgt)
    StreamingPipeline.runTableToTable(spark, src, tgt, ckpt,
      keys = Seq("user_id"), precombine = "ts_us", tieBreak = Seq("event_id"))
    assert(graft.etl.BucketTable.manifest(tgt) == before,
      "an empty change-stream pass leaves the target untouched")
  }

  test("crash between table commit and checkpoint commit: replay is idempotent") {
    val base = Files.createTempDirectory("streamc").toString
    val raw = graft.Tables.eventsRaw(spark, s"$sf0001/events.parquet")
    stageOneFile(raw.filter($"event_id" % 2 === 0), base, "half0", s"$base/src")
    // run 1 dies INSIDE foreachBatch, after BucketTable's manifest
    // swing but before Structured Streaming writes the batch's commit
    // to the checkpoint — the table now holds a batch the checkpoint
    // has never heard of (the worst crash window for a two-ledger sink)
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingPipeline.runIngestBucketed(spark, s"$base/src",
        s"$base/target", s"$base/ckpt",
        afterTableCommit = _ => throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage.contains("injected crash") ||
      Option(boom.getCause).exists(_.getMessage.contains("injected crash")))
    // the table committed run 1's batch even though the checkpoint did not
    assert(graft.etl.BucketTable.read(spark, s"$base/target").count() == 500)
    // recovery: the restarted query REPLAYS the uncommitted batch (plus
    // the new file) — the keyed precombine upsert must absorb the
    // replay with zero duplicates and zero lost rows
    stageOneFile(raw.filter($"event_id" % 2 =!= 0), base, "half1", s"$base/src")
    StreamingPipeline.runIngestBucketed(spark, s"$base/src",
      s"$base/target", s"$base/ckpt")
    val target = graft.etl.BucketTable.read(spark, s"$base/target")
    assert(target.count() == 1000, "replay lost or duplicated rows")
    assert(target.select("record_id").distinct().count() == 1000,
      "replayed batch must be absorbed idempotently by the keyed upsert")
  }

  test("MOR streaming sink: log-per-batch, crash replay converges to parity") {
    val base = Files.createTempDirectory("streammor").toString
    val raw = graft.Tables.eventsRaw(spark, s"$sf0001/events.parquet")
    stageOneFile(raw.filter($"event_id" % 2 === 0), base, "half0", s"$base/src")
    // run 1 dies in the worst window: the delta log is appended, the
    // checkpoint never hears of the batch
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingPipeline.runIngestMor(spark, s"$base/src",
        s"$base/target", s"$base/ckpt",
        afterTableCommit = _ => throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage.contains("injected crash") ||
      Option(boom.getCause).exists(_.getMessage.contains("injected crash")))
    assert(graft.etl.MorTable.readSnapshot(spark, s"$base/target")
      .count() == 500)
    // recovery replays the batch as a DUPLICATE log (MOR storage is
    // at-least-once); the snapshot merge must still resolve every key
    // to one row — result exactly-once
    stageOneFile(raw.filter($"event_id" % 2 =!= 0), base, "half1", s"$base/src")
    StreamingPipeline.runIngestMor(spark, s"$base/src",
      s"$base/target", s"$base/ckpt")
    val snap = graft.etl.MorTable.readSnapshot(spark, s"$base/target")
    assert(snap.count() == 1000, "replay lost or duplicated rows")
    assert(snap.select("record_id").distinct().count() == 1000)
    // every micro-batch appended O(batch): base holds only the create
    // batch, everything since is delta logs
    val (b, deltas) = graft.etl.MorTable.state(s"$base/target").get
    assert(b == 0L && deltas >= 2L,
      s"expected log-per-batch appends, got base=$b deltas=$deltas")
    // compaction folds the at-least-once logs into an owned base
    graft.etl.MorTable.compact(spark, s"$base/target")
    assert(graft.etl.MorTable.readOptimized(spark, s"$base/target")
      .count() == 1000)
  }

  test("streaming windowed rollup accumulates across micro-batches to the batch answer") {
    val base = Files.createTempDirectory("streamw").toString
    // two files → two micro-batches: hour windows receiving rows in
    // BOTH batches must still end at the one-pass totals
    val raw = graft.Tables.eventsRaw(spark, s"$sf0001/events.parquet")
    stageOneFile(raw.filter($"event_id" % 2 === 0), base, "half0", s"$base/src")
    stageOneFile(raw.filter($"event_id" % 2 =!= 0), base, "half1", s"$base/src")
    StreamingPipeline.runWindowedAgg(spark, s"$base/src",
      s"$base/agg", s"$base/ckpt", maxFilesPerTrigger = Some(1))
    import org.apache.spark.sql.functions.{count, expr, lit, round, sum}
    val got = spark.read.parquet(s"$base/agg")
    val want = graft.Tables.events(spark, sf0001)
      .filter($"ts_us".isNotNull)
      .groupBy(expr("(ts_us div 3600000000) * 3600000000").as("window_start_us"),
        $"event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(expr("cast(round(value * 100, 0) as bigint)")) / 100.0, 2)
          .as("total"))
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streaming windowed rollup must equal the batch GROUP BY")
  }

  test("bloom-routed streaming ingest reaches batch parity") {
    val base = Files.createTempDirectory("streamf").toString
    val raw = graft.Tables.eventsRaw(spark, s"$sf0001/events.parquet")
    stageOneFile(raw.filter($"event_id" % 2 === 0), base, "half0", s"$base/src")
    stageOneFile(raw.filter($"event_id" % 2 =!= 0), base, "half1", s"$base/src")
    StreamingPipeline.runIngestBloomRouted(spark, s"$base/src",
      s"$base/target", s"$base/ckpt")
    import org.apache.spark.sql.functions.col
    val got = graft.etl.BloomTable.read(spark, s"$base/target")
      .select(col("entity_id"), col("event_id"))
    val want = graft.etl.HudiLike.precombineLatest(
      graft.Tables.events(spark, sf0001).filter($"ts_us".isNotNull)
        .select($"user_id".as("entity_id"), $"event_id", $"ts_us"),
      Seq("entity_id"), "ts_us", Seq("event_id"))
      .select(col("entity_id"), col("event_id"))
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "bloom-routed streaming sink must reach the latest-per-entity state")
  }

  test("update-mode keyed windowed rollup reaches the same totals as complete mode") {
    val base = Files.createTempDirectory("streamwu").toString
    val raw = graft.Tables.eventsRaw(spark, s"$sf0001/events.parquet")
    stageOneFile(raw.filter($"event_id" % 2 === 0), base, "half0", s"$base/src")
    stageOneFile(raw.filter($"event_id" % 2 =!= 0), base, "half1", s"$base/src")
    StreamingPipeline.runWindowedAggKeyed(spark, s"$base/src",
      s"$base/wtbl", s"$base/ckpt", maxFilesPerTrigger = Some(1))
    import org.apache.spark.sql.functions.{col, count, expr, lit, round, sum}
    val got = graft.etl.BucketTable.read(spark, s"$base/wtbl")
      .select(col("window_start_us"), col("event_type"), col("n"), col("total"))
    val want = graft.Tables.events(spark, sf0001)
      .filter($"ts_us".isNotNull)
      .groupBy(expr("(ts_us div 3600000000) * 3600000000").as("window_start_us"),
        $"event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(expr("cast(round(value * 100, 0) as bigint)")) / 100.0, 2)
          .as("total"))
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "update-mode keyed rollup must equal the batch GROUP BY")
  }

  test("extractStream falls back to the canonical schema on an empty source dir") {
    val dir = Files.createTempDirectory("emptysrc").toString
    val df = StreamingPipeline.extractStream(spark, dir)
    assert(df.isStreaming)
    assert(df.columns.toSeq == Seq("record_id", "event_id", "entity_id",
      "event_timestamp", "event_type", "value"))
  }

  test("streaming dedup ingest equals the sequential batch replay and accepts no near-dups") {
    val base = Files.createTempDirectory("streamdd").toString
    val docs = graft.Tables.documents(spark, sf0001)
    val half0 = docs.filter($"doc_id" % 2 === 0)
    val half1 = docs.filter($"doc_id" % 2 =!= 0)
    // two staged files → two micro-batches in a deterministic order
    stageOneFile(half0, base, "half0", s"$base/src")
    stageOneFile(half1, base, "half1", s"$base/src")
    StreamingPipeline.runDedupIngest(spark, s"$base/src",
      s"$base/idx", s"$base/accept", s"$base/ckpt")
    val accepted = graft.etl.BucketTable.read(spark, s"$base/accept")
      .select("doc_id").as[Long].collect().toSet
    // sequential replay of the same two batches through the batch kernel
    for (half <- Seq(half0, half1))
      graft.ops.Dedup.dedupIngestBatch(spark, half, s"$base/idx2", s"$base/accept2")
    val replayed = graft.etl.BucketTable.read(spark, s"$base/accept2")
      .select("doc_id").as[Long].collect().toSet
    assert(accepted == replayed,
      s"stream accepted ${accepted.size}, sequential replay ${replayed.size}")
    // dedup actually happened (the fixture contains near-dups), and no
    // two accepted docs are LSH near-dups of each other
    assert(accepted.size < docs.count())
    val pairs = graft.ops.Dedup.minhashCandidates(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val survivors = pairs.filter { case (a, b) => accepted(a) && accepted(b) }
    assert(survivors.isEmpty,
      s"accepted set still contains near-dup pairs: ${survivors.take(3).toSeq}")
  }

  test("bucketed streaming ingest of the RAW events directory (no pre-staging)") {
    // Point the stream at the driver-generated parquet directory AS-IS:
    // whatever physical ts encoding this testdata generation uses,
    // extractStream must sniff it and reach key parity with the batch
    // extract (the round-8 gap: a hard-coded nanos-long schema either
    // failed the read or mis-keyed micros by 1000×).
    val base = Files.createTempDirectory("streamraw").toString
    StreamingPipeline.runIngestBucketed(spark, s"$sf0001/events.parquet",
      s"$base/target", s"$base/ckpt")
    val target = graft.etl.BucketTable.read(spark, s"$base/target")
    val batchKeys = graft.etl.Pipeline
      .extract(spark, s"$sf0001/events.parquet", None)
      .select("record_id").as[String].collect().toSet
    val streamKeys = target.select("record_id").as[String].collect().toSet
    assert(streamKeys == batchKeys,
      "raw-directory stream must reach batch-extract key parity")
  }

  test("generic table ingest restarts onto a widened source (streaming schema evolution)") {
    import graft.etl.{Catalog, SqlDdl}
    val base = Files.createTempDirectory("evostream").toString
    Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("k", "pc", "v")
      .write.parquet(s"$base/src")
    StreamingPipeline.runIngestTable(spark, s"$base/src", s"$base/t",
      s"$base/cp", keys = Seq("k"), precombine = "pc")
    Catalog.registerLayoutTable(spark, "evo_stream_t", "bucket", s"$base/t")
    assert(Catalog.readTable(spark, "evo_stream_t").columns.toSeq ==
      Seq("k", "pc", "v"))
    // the source gains a column mid-pipeline: declare it on the table,
    // append wider files, restart the stream on the SAME checkpoint —
    // only the new files replay, and they carry the new column
    SqlDdl.exec(spark, "ALTER TABLE evo_stream_t ADD COLUMNS (w DOUBLE)")
    Seq((2L, 2L, 22.0, 2.0), (3L, 1L, 30.0, 3.0)).toDF("k", "pc", "v", "w")
      .write.mode("append").parquet(s"$base/src")
    StreamingPipeline.runIngestTable(spark, s"$base/src", s"$base/t",
      s"$base/cp", keys = Seq("k"), precombine = "pc")
    val got = Catalog.readTable(spark, "evo_stream_t")
      .select($"k", $"v", $"w").as[(Long, Double, Option[Double])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> (10.0, None),          // pre-evolution row: typed NULL
      2L -> (22.0, Some(2.0)),     // upserted by the widened batch
      3L -> (30.0, Some(3.0))))
  }
}
