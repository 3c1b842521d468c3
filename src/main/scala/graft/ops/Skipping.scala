package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.StatsIndex
import graft.etl.StatsIndex.ColRange

/** Data-skipping scans over stats-indexed layouts, as oracle-checked
  * queries (reference: Hudi's column-stats metadata index +
  * `hoodie.metadata.index.column.stats.enable`, which the reference
  * pipeline inherits on every Hudi read, pipeline_architecture.py:
  * 207-227 — re-expressed in [[graft.etl.StatsIndex]]).
  *
  * Each query materializes a deterministic file layout in scratch,
  * builds/updates the index, and returns a range scan planned through
  * it. The oracle replays the same range filter over the raw table —
  * data skipping must be pure optimization, invisible in results. The
  * pruning effect itself (files skipped, update increments) is pinned
  * by `StatsIndexSpec`, which asserts file counts, and the layouts are
  * sized so the skip ratio holds at every SF (file count is a layout
  * knob, the time/key span of the testdata is SF-invariant).
  */
object Skipping {

  /** ~2.9 days of the 30-day event span (micros) — prunes ~90% of a
    * time-ordered layout at any SF.
    */
  val TsLoUs = 1705000000000000L
  val TsHiUs = 1705250000000000L

  /** Day-index + user ranges for the 2-D z-order scan. Day 19730-19735
    * is 6 of the ~30 days; user 0-9 covers a shrinking fraction as SF
    * grows (user cardinality scales with SF), so BOTH dimensions prune.
    */
  val DayLo = 19730L
  val DayHi = 19735L
  val UserLo = 0L
  val UserHi = 9L

  /** Files per layout: enough that skipping is visible (and asserted)
    * at sf0.001, few enough that sf0.1's 100k rows still write in one
    * quick job. At real scale this is the table's natural file count.
    */
  val LayoutFiles = 8

  private lazy val scratch: java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft-skip")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(dir)
    }))
    dir
  }

  private def eventsSlim(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_us"))

  /** Time-ordered layout (the shape an ingest sorted by arrival leaves
    * on disk): range-partition by `ts_us` so each file owns a tight
    * time slice, then index and range-scan through the index.
    */
  def statsSkipping(spark: SparkSession, sfDir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory(scratch, "ts").toString
    val data = s"$base/data"; val stats = s"$base/stats"
    eventsSlim(spark, sfDir)
      .repartitionByRange(LayoutFiles, col("ts_us"))
      .write.parquet(data)
    StatsIndex.build(spark, data, Seq("ts_us", "user_id"), stats)
    StatsIndex.scan(spark, data, stats,
      Seq(ColRange("ts_us", Some(TsLoUs), Some(TsHiUs))))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_us"))
  }

  /** `p_sql_skipping`: zone-map data skipping reached through the SQL
    * front door — a bloom-layout catalog table binds its stats index
    * via `graft.table.statsIndex`, and `SELECT ... WHERE ts_us
    * BETWEEN ...` plans only the files whose min/max survive
    * ([[graft.etl.SqlRead]] syncs the index to the live manifest
    * first, so a file the index has not seen can never be skipped).
    * The table is keyed on `event_id` — time-correlated, so the
    * range-clustered data files are also time-clustered and the
    * `ts_us` zone maps actually prune. `SqlReadSpec` pins the file
    * subset; the oracle pins the rows (identical to
    * `p_stats_skipping`'s — same slice, different route).
    */
  def sqlSkipping(spark: SparkSession, sfDir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory(scratch, "sq").toString
    val table = s"$base/t"; val stats = s"$base/stats"
    graft.etl.BloomTable.create(eventsSlim(spark, sfDir), table,
      keys = Seq("event_id"), precombine = "ts_us",
      numFiles = LayoutFiles)
    val live = graft.etl.BloomTable.read(spark, table).inputFiles.toSeq
    StatsIndex.buildFromFiles(spark, live, Seq("ts_us", "user_id"), stats)
    graft.etl.Catalog.registerLayoutTable(spark, "graft_sqlskip", "bloom",
      table, statsIndex = Some(stats))
    graft.etl.SqlRead.select(spark,
      s"""SELECT event_id, user_id, event_type, value, ts_us
         |FROM graft_sqlskip
         |WHERE ts_us BETWEEN $TsLoUs AND $TsHiUs""".stripMargin)
  }

  /** Z-order layout: cluster on the Morton curve of (user_id, day) so
    * per-file min/max stay tight on BOTH columns, then scan a 2-D box
    * through the index — the multi-dimensional data-skipping pattern
    * (Hudi clustering with z-order + col_stats; Delta OPTIMIZE ZORDER).
    */
  def statsSkippingZorder(spark: SparkSession, sfDir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory(scratch, "z").toString
    val data = s"$base/data"; val stats = s"$base/stats"
    Scale.writeZOrdered(
      eventsSlim(spark, sfDir)
        .withColumn("day_id", expr("ts_us div 86400000000")),
      data, "user_id", "day_id", LayoutFiles)
    StatsIndex.build(spark, data, Seq("user_id", "day_id"), stats)
    StatsIndex.scan(spark, data, stats, Seq(
      ColRange("user_id", Some(UserLo), Some(UserHi)),
      ColRange("day_id", Some(DayLo), Some(DayHi))))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_us"))
  }

  /** Incremental index maintenance: bootstrap the index on the first
    * half of the timeline, append the second half as new files, then
    * [[StatsIndex.scanFresh]] — the update indexes ONLY the appended
    * files (asserted by `StatsIndexSpec`) and the scan straddles the
    * append boundary, so a stale index would lose rows loudly here.
    */
  def statsSkippingUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory(scratch, "u").toString
    val data = s"$base/data"; val stats = s"$base/stats"
    val ev = eventsSlim(spark, sfDir)
    ev.filter(col("ts_us") <= PipelineQueries.SplitUs)
      .repartitionByRange(LayoutFiles, col("ts_us"))
      .write.parquet(data)
    StatsIndex.build(spark, data, Seq("ts_us"), stats)
    ev.filter(col("ts_us") > PipelineQueries.SplitUs)
      .repartitionByRange(LayoutFiles, col("ts_us"))
      .write.mode("append").parquet(data)
    // straddle SplitUs (1705708800000000): old-half tail + new-half head
    StatsIndex.scanFresh(spark, data, stats,
      Seq(ColRange("ts_us", Some(1705600000000000L), Some(1705900000000000L))))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_us"))
  }

  /** ~11.6 days of the 30-day span: wide enough that interior files of
    * the 8-file time-ordered layout are FULLY contained at every SF
    * (each file owns ~3.75 days), narrow enough that boundary files
    * exist on both ends.
    */
  val CntLoUs = 1705000000000000L
  val CntHiUs = 1706000000000000L

  /** Metadata-only count: a time-range `count(*)` answered from the
    * stats index — fully-contained files contribute `row_count`
    * straight from metadata, only the two boundary files are opened
    * (the Hudi metadata-table / Iceberg manifest-count story; at
    * 100 TB this is a two-file read instead of a table scan).
    * `StatsIndexSpec` pins the classification and the null fallback;
    * the in-query require keeps the metadata path honest at every SF —
    * if layout drift ever made this a plain scan, the query fails
    * rather than silently degrading. Oracle replays the count over the
    * raw table.
    */
  def statsCountMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory(scratch, "c").toString
    val data = s"$base/data"; val stats = s"$base/stats"
    eventsSlim(spark, sfDir)
      .repartitionByRange(LayoutFiles, col("ts_us"))
      .write.parquet(data)
    StatsIndex.build(spark, data, Seq("ts_us"), stats)
    val bd = StatsIndex.countWhere(spark, data, stats,
      Seq(ColRange("ts_us", Some(CntLoUs), Some(CntHiUs))))
    require(bd.metaRows > 0 && bd.scannedFiles.size < bd.indexedFiles,
      s"count not metadata-answered: $bd")
    import spark.implicits._
    Seq(bd.total).toDF("n_rows")
  }

  /** Metadata-only min/max: the watermark query (`SELECT max(ts)` to
    * bound the next incremental pull) plus the span's min, answered
    * from the stats index's per-file bounds — zero data files opened,
    * the O(files) metadata read a 100 TB incremental consumer pays
    * instead of a table scan. The oracle replays the aggregates over
    * the raw table; `StatsIndexSpec` pins null semantics.
    */
  def statsMinMaxMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory(scratch, "m").toString
    val data = s"$base/data"; val stats = s"$base/stats"
    eventsSlim(spark, sfDir)
      .repartitionByRange(LayoutFiles, col("ts_us"))
      .write.parquet(data)
    StatsIndex.build(spark, data, Seq("ts_us", "value"), stats)
    val (tsLo, tsHi) = StatsIndex.minMaxOf(spark, stats, "ts_us")
    val (_, vHi) = StatsIndex.minMaxOf(spark, stats, "value")
    import spark.implicits._
    // extrema are exact stored values (not accumulated floats) — both
    // engines return the identical double, no rounding needed
    Seq((tsLo.get.asInstanceOf[Long], tsHi.get.asInstanceOf[Long],
      vHi.get.asInstanceOf[Double]))
      .toDF("ts_min", "ts_max", "value_max")
  }

  /** Functional index (Hudi 1.0's expression index): stats computed
    * over `ts_us div 86400000000` — a DAY the data never materializes
    * as a column — prune the time-ordered layout for a day-range
    * predicate. The residual re-evaluates the expression per surviving
    * row, so correctness never rests on the index; the skip itself is
    * what makes an expression predicate affordable at scale (without
    * it, a derived-value filter reads every footer of every file).
    */
  def funcIndexSkipping(spark: SparkSession, sfDir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory(scratch, "f").toString
    val data = s"$base/data"; val stats = s"$base/stats"
    eventsSlim(spark, sfDir)
      .repartitionByRange(LayoutFiles, col("ts_us"))
      .write.parquet(data)
    StatsIndex.build(spark, data, Seq("day:=ts_us div 86400000000"), stats)
    StatsIndex.scan(spark, data, stats,
      Seq(ColRange("day", Some(DayLo), Some(DayHi))))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_us"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_func_index" -> (funcIndexSkipping(_, _)),
    "p_stats_count_meta" -> (statsCountMeta(_, _)),
    "p_stats_minmax_meta" -> (statsMinMaxMeta(_, _)),
    "p_stats_skipping" -> (statsSkipping(_, _)),
    "p_sql_skipping" -> (sqlSkipping(_, _)),
    "p_stats_skipping_zorder" -> (statsSkippingZorder(_, _)),
    "p_stats_skipping_update" -> (statsSkippingUpdate(_, _)))

  val oracles: Map[String, String] = Map(
    "p_func_index" ->
      s"""SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
         |FROM events
         |WHERE (epoch_us(ts) // 86400000000) BETWEEN $DayLo AND $DayHi""".stripMargin,
    "p_stats_count_meta" ->
      s"""SELECT count(*) AS n_rows
         |FROM events
         |WHERE epoch_us(ts) BETWEEN $CntLoUs AND $CntHiUs""".stripMargin,
    "p_stats_minmax_meta" ->
      """SELECT min(epoch_us(ts)) AS ts_min, max(epoch_us(ts)) AS ts_max,
        | max(value) AS value_max
        |FROM events""".stripMargin,
    "p_stats_skipping" ->
      s"""SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
         |FROM events
         |WHERE epoch_us(ts) BETWEEN $TsLoUs AND $TsHiUs""".stripMargin,
    "p_sql_skipping" ->
      s"""SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
         |FROM events
         |WHERE epoch_us(ts) BETWEEN $TsLoUs AND $TsHiUs""".stripMargin,
    "p_stats_skipping_zorder" ->
      s"""SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
         |FROM events
         |WHERE user_id BETWEEN $UserLo AND $UserHi
         |  AND (epoch_us(ts) // 86400000000) BETWEEN $DayLo AND $DayHi""".stripMargin,
    "p_stats_skipping_update" ->
      s"""SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
         |FROM events
         |WHERE epoch_us(ts) BETWEEN 1705600000000000 AND 1705900000000000""".stripMargin)
}
