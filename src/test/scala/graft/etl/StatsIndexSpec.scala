package graft.etl

import graft.SparkSpec
import graft.etl.StatsIndex.ColRange
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the properties that make the column-stats index an index and
  * not just a cache: scans through it equal plain filtered scans, it
  * actually prunes files, updates are incremental (only new files get
  * scanned/indexed), and null/absent stats never cause over-pruning.
  */
class StatsIndexSpec extends SparkSpec {

  private def scratch() = Files.createTempDirectory("statsidx").toString

  private def eventsSlim = graft.Tables.events(spark, sf0001)
    .select(col("event_id"), col("user_id"), col("value"), col("ts_us"))

  test("file-list index over a clustered partitioned table prunes and syncs") {
    val base = scratch(); val tbl = s"$base/t"; val stats = s"$base/stats"
    val df = graft.Tables.events(spark, sf0001)
      .select(org.apache.spark.sql.functions.to_date(col("ts")).as("day"),
        col("user_id"), col("event_id"), col("value"), col("ts_us"))
    PartitionedTable.create(df, tbl, keys = Seq("user_id"),
      precombine = "ts_us", tieBreak = Seq("event_id"),
      partitionCols = Seq("day"))
    PartitionedTable.cluster(spark, tbl, sortCols = Seq("ts_us"),
      targetFileRows = 64L)
    val live = PartitionedTable.liveFiles(spark, tbl)
    StatsIndex.buildFromFiles(spark, live, Seq("ts_us"), stats)

    // a one-day range must plan a small fraction of the files
    val lo = 1704844800000000L; val hi = 1704931200000000L // Jan 10..11
    val ranges = Seq(ColRange("ts_us", Some(lo), Some(hi)))
    val (survivors, total) = StatsIndex.prune(spark, stats, ranges)
    assert(total == live.size)
    assert(survivors.nonEmpty && survivors.size * 4 <= total,
      s"expected <=1/4 of $total files to survive, got ${survivors.size}")
    // and the skipped scan equals the plain filtered read
    val viaIndex = StatsIndex.scanFiles(spark, live, stats, ranges)
      .select("user_id", "ts_us").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = PartitionedTable.read(spark, tbl)
      .filter(col("ts_us").between(lo, hi))
      .select("user_id", "ts_us").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex == plain)

    // an upsert supersedes some partitions' files: syncToFiles drops
    // the retired rows, indexes the new files, and parity holds
    PartitionedTable.upsertInto(spark, tbl,
      df.filter(col("ts_us").between(lo, hi)).limit(50)
        .withColumn("value", col("value") * -1))
    val live2 = PartitionedTable.liveFiles(spark, tbl)
    val fresh = StatsIndex.syncToFiles(spark, live2, stats)
    assert(fresh.nonEmpty, "sync must index the new generation's files")
    val (_, total2) = StatsIndex.prune(spark, stats, ranges)
    assert(total2 == live2.size, "index must track exactly the live set")
    val viaIndex2 = StatsIndex.scanFiles(spark, live2, stats, ranges)
      .select("user_id", "ts_us").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain2 = PartitionedTable.read(spark, tbl)
      .filter(col("ts_us").between(lo, hi))
      .select("user_id", "ts_us").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex2 == plain2)
  }

  test("stats scan == plain filtered scan on a range layout, and prunes files") {
    val base = scratch(); val data = s"$base/data"; val stats = s"$base/stats"
    eventsSlim.repartitionByRange(8, col("ts_us")).write.parquet(data)
    StatsIndex.build(spark, data, Seq("ts_us", "user_id"), stats)

    val ranges = Seq(ColRange("ts_us",
      Some(graft.ops.Skipping.TsLoUs), Some(graft.ops.Skipping.TsHiUs)))
    val viaIndex = StatsIndex.scan(spark, data, stats, ranges)
    val plain = spark.read.parquet(data)
      .filter(col("ts_us").between(graft.ops.Skipping.TsLoUs, graft.ops.Skipping.TsHiUs))
    assert(viaIndex.count() == plain.count() && plain.count() > 0)
    assert(viaIndex.exceptAll(plain).isEmpty && plain.exceptAll(viaIndex).isEmpty)

    val (survivors, total) = StatsIndex.prune(spark, stats, ranges)
    assert(total == 8, s"range layout should produce 8 indexed files, got $total")
    // ~2.9 of 30 days on a time-ordered layout: at most half the files survive
    assert(survivors.nonEmpty && survivors.size <= total / 2,
      s"expected real pruning, got ${survivors.size}/$total")
    // and the scan PLANS exactly the survivor list — skipping happens
    // at the file-listing level, not as a post-read filter
    val planned = viaIndex.inputFiles.map(_.replaceFirst("^file:/+", "/")).toSet
    assert(planned == survivors.toSet,
      s"scan must plan the survivor files only: $planned vs $survivors")
  }

  test("functional entry prunes on an expression the data never materializes") {
    val base = scratch(); val data = s"$base/data"; val stats = s"$base/stats"
    eventsSlim.repartitionByRange(8, col("ts_us")).write.parquet(data)
    // day is NOT a column of the data — only the index knows it
    StatsIndex.build(spark, data,
      Seq("day:=ts_us div 86400000000", "user_id"), stats)
    assert(StatsIndex.columns(stats) == Seq("day", "user_id"))
    assert(!spark.read.parquet(data).schema.fieldNames.contains("day"))

    val ranges = Seq(ColRange("day",
      Some(graft.ops.Skipping.DayLo), Some(graft.ops.Skipping.DayHi)))
    val viaIndex = StatsIndex.scan(spark, data, stats, ranges)
    val plain = spark.read.parquet(data)
      .filter(expr("ts_us div 86400000000")
        .between(graft.ops.Skipping.DayLo, graft.ops.Skipping.DayHi))
    assert(viaIndex.count() == plain.count() && plain.count() > 0)
    assert(viaIndex.exceptAll(plain).isEmpty && plain.exceptAll(viaIndex).isEmpty)

    // 6 of ~30 days on a time-ordered layout: real file pruning
    val (survivors, total) = StatsIndex.prune(spark, stats, ranges)
    assert(survivors.nonEmpty && survivors.size <= total / 2,
      s"expected real pruning, got ${survivors.size}/$total")
    // incremental update keeps evaluating the expression on new files
    eventsSlim.limit(0).write.mode("append").parquet(data)
    assert(StatsIndex.update(spark, data, stats).isEmpty ||
      StatsIndex.scan(spark, data, stats, ranges).count() == plain.count())
  }

  test("z-order layout prunes on BOTH dimensions; linear layout cannot on the second") {
    val ev = eventsSlim.withColumn("day_id", expr("ts_us div 86400000000"))
    val zBase = scratch(); val lBase = scratch()
    graft.ops.Scale.writeZOrdered(ev, s"$zBase/data", "user_id", "day_id", 8)
    ev.repartitionByRange(8, col("user_id")) // linear: tight on user only
      .write.parquet(s"$lBase/data")
    StatsIndex.build(spark, s"$zBase/data", Seq("user_id", "day_id"), s"$zBase/stats")
    StatsIndex.build(spark, s"$lBase/data", Seq("user_id", "day_id"), s"$lBase/stats")

    // day-only box: the dimension the linear layout did not sort by
    val dayBox = Seq(ColRange("day_id",
      Some(graft.ops.Skipping.DayLo), Some(graft.ops.Skipping.DayHi)))
    val (zSurv, zTotal) = StatsIndex.prune(spark, s"$zBase/stats", dayBox)
    val (lSurv, lTotal) = StatsIndex.prune(spark, s"$lBase/stats", dayBox)
    assert(lSurv.size == lTotal,
      "a user-sorted layout has the full day span in every file — no day pruning")
    assert(zSurv.size < zTotal,
      s"z-order must keep day stats tight enough to prune (${zSurv.size}/$zTotal)")

    // and results through the index still match the plain filter
    val viaIndex = StatsIndex.scan(spark, s"$zBase/data", s"$zBase/stats", dayBox)
    val plain = spark.read.parquet(s"$zBase/data")
      .filter(col("day_id").between(graft.ops.Skipping.DayLo, graft.ops.Skipping.DayHi))
    assert(viaIndex.exceptAll(plain).isEmpty && plain.exceptAll(viaIndex).isEmpty)
  }

  test("update indexes ONLY appended files and scanFresh sees rows across the boundary") {
    val base = scratch(); val data = s"$base/data"; val stats = s"$base/stats"
    val split = graft.ops.PipelineQueries.SplitUs
    eventsSlim.filter(col("ts_us") <= split)
      .repartitionByRange(4, col("ts_us")).write.parquet(data)
    StatsIndex.build(spark, data, Seq("ts_us"), stats)
    val before = StatsIndex.prune(spark, stats, Nil)._2

    eventsSlim.filter(col("ts_us") > split)
      .repartitionByRange(4, col("ts_us")).write.mode("append").parquet(data)
    val fresh = StatsIndex.update(spark, data, stats)
    assert(fresh.size == 4, s"exactly the 4 appended files, got ${fresh.size}")
    val after = StatsIndex.prune(spark, stats, Nil)._2
    assert(after == before + 4)
    // already up to date → no-op
    assert(StatsIndex.update(spark, data, stats).isEmpty)

    val straddle = Seq(ColRange("ts_us",
      Some(1705600000000000L), Some(1705900000000000L)))
    val viaIndex = StatsIndex.scanFresh(spark, data, stats, straddle)
    val plain = spark.read.parquet(data)
      .filter(col("ts_us").between(1705600000000000L, 1705900000000000L))
    assert(viaIndex.count() == plain.count() && plain.count() > 0)
    // rows from both halves — the scan truly straddles the append
    assert(viaIndex.filter(col("ts_us") <= split).count() > 0)
    assert(viaIndex.filter(col("ts_us") > split).count() > 0)
  }

  test("all-null files are provably unmatchable by ranges and get pruned") {
    import spark.implicits._
    val base = scratch(); val data = s"$base/data"; val stats = s"$base/stats"
    Seq((1L, Some(10L)), (2L, Some(20L))).toDF("id", "v")
      .coalesce(1).write.parquet(data)
    Seq((3L, None: Option[Long]), (4L, None: Option[Long])).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(data)
    StatsIndex.build(spark, data, Seq("v"), stats)
    val (surv, total) = StatsIndex.prune(spark, stats,
      Seq(ColRange("v", Some(15L), Some(25L))))
    assert(total == 2)
    // null min/max ⇔ no non-null value ⇔ no row can match a range:
    // only the (10,20) file survives
    assert(surv.size == 1)
    // and the result is exact either way
    val rows = StatsIndex.scan(spark, data, stats,
      Seq(ColRange("v", Some(15L), Some(25L)))).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(2L))
  }

  test("countWhere answers contained files from metadata, scans only boundaries") {
    import spark.implicits._
    val base = scratch(); val data = s"$base/data"; val stats = s"$base/stats"
    // five files of 20 keys each: 1-20 | 21-40 | 41-60 | 61-80 | 81-100
    (0 until 5).foreach { f =>
      (f * 20 + 1 to f * 20 + 20).map(_.toLong).toDF("k")
        .coalesce(1).write.mode("append").parquet(data)
    }
    StatsIndex.build(spark, data, Seq("k"), stats)
    val bd = StatsIndex.countWhere(spark, data, stats,
      Seq(ColRange("k", Some(15L), Some(65L))))
    // 15..65 inclusive = 51 keys; files 21-40 and 41-60 are contained
    // (40 metadata rows), 1-20 and 61-80 are boundaries, 81-100 disjoint
    assert(bd.total == 51, s"got $bd")
    assert(bd.metaRows == 40, s"got $bd")
    assert(bd.containedFiles.size == 2 && bd.scannedFiles.size == 2,
      s"got $bd")
    assert(bd.indexedFiles == 5)
  }

  test("countWhere never metadata-counts a file with nulls in the range column") {
    import spark.implicits._
    val base = scratch(); val data = s"$base/data"; val stats = s"$base/stats"
    Seq[Option[Long]](Some(10L), Some(20L)).toDF("k")
      .coalesce(1).write.parquet(data)
    // min/max (12,18) sit fully inside the range, but the null row
    // must not be counted — containment requires zero nulls
    Seq[Option[Long]](Some(12L), None, Some(18L)).toDF("k")
      .coalesce(1).write.mode("append").parquet(data)
    StatsIndex.build(spark, data, Seq("k"), stats)
    val bd = StatsIndex.countWhere(spark, data, stats,
      Seq(ColRange("k", Some(10L), Some(20L))))
    assert(bd.total == 4, s"got $bd")
    // file (10,20) is contained and metadata-counted; the nulled file
    // (12,null,18) is forced onto the scan path despite inside min/max
    assert(bd.metaRows == 2 && bd.containedFiles.size == 1 &&
      bd.scannedFiles.size == 1, s"got $bd")
    // unbounded ranges are trivially contained, nulls included
    val all = StatsIndex.countWhere(spark, data, stats, Seq(ColRange("k")))
    assert(all.total == 5 && all.metaRows == 5 && all.scannedFiles.isEmpty,
      s"got $all")
  }

  test("minMaxOf folds per-file bounds, ignoring nulls; all-null gives None") {
    import spark.implicits._
    val base = scratch(); val data = s"$base/data"; val stats = s"$base/stats"
    Seq[Option[Long]](Some(5L), None, Some(42L)).toDF("k")
      .coalesce(1).write.parquet(data)
    Seq[Option[Long]](None, None).toDF("k")
      .coalesce(1).write.mode("append").parquet(data)
    StatsIndex.build(spark, data, Seq("k"), stats)
    assert(StatsIndex.minMaxOf(spark, stats, "k") == (Some(5L), Some(42L)))
    val base2 = scratch(); val d2 = s"$base2/data"; val s2 = s"$base2/stats"
    Seq[Option[Long]](None, None).toDF("k").coalesce(1).write.parquet(d2)
    StatsIndex.build(spark, d2, Seq("k"), s2)
    assert(StatsIndex.minMaxOf(spark, s2, "k") == (None, None))
  }

  test("disjoint range prunes everything and returns an empty, well-typed frame") {
    val base = scratch(); val data = s"$base/data"; val stats = s"$base/stats"
    eventsSlim.repartitionByRange(4, col("ts_us")).write.parquet(data)
    StatsIndex.build(spark, data, Seq("ts_us"), stats)
    val out = StatsIndex.scan(spark, data, stats,
      Seq(ColRange("ts_us", Some(9999999999999999L), None)))
    assert(out.count() == 0)
    assert(out.schema.fieldNames.contains("event_id"))
    val (surv, _) = StatsIndex.prune(spark, stats,
      Seq(ColRange("ts_us", Some(9999999999999999L), None)))
    assert(surv.isEmpty)
  }
}
