package graft.streaming

import graft.etl.{HudiLike, Pipeline}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger}
import org.apache.spark.sql.types._

/** A typed event as consumed by the streaming path. */
case class EventRow(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Per-user running session state (custom streaming state example). */
case class UserSession(
    user_id: Long, n_events: Long, total_value: Double, last_event_id: Long)

/** Structured Streaming counterpart of the batch pipeline.
  *
  * The reference implements "incremental processing" as watermark-gated
  * batch re-runs (reference: pipeline_architecture.py:278-282,
  * README.md:94-108) — the natural Spark-native evolution of that design
  * is a streaming query: the source watermark replaces the persisted
  * log-table watermark, `dropDuplicates` state replaces
  * dedup-against-target, and `foreachBatch` + the HudiLike keyed upsert
  * is exactly Hudi's streaming-write pattern. All operators here are
  * built-in Structured Streaming; state stores shard by key, so the
  * shapes scale to a real cluster unchanged.
  */
object StreamingPipeline {

  /** Tumbling-window aggregation with a 10-minute watermark: the
    * streaming twin of `Relational.eventsHourly`.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Streaming exactly-once-by-key: drop duplicate event_ids, with the
    * watermark bounding the dedup state (T4 semantics on a stream).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id")

  /** Native session windows (`session_window`, 30-minute gap): the
    * streaming twin of the batch `Analytics.sessionize` — state merges
    * adjacent windows per key, watermark closes and emits sessions.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total"))

  /** Watermark-bounded dedup via `dropDuplicatesWithinWatermark`:
    * unlike `dropDuplicates`, the per-key state is guaranteed evicted
    * once the key is older than the watermark — the right primitive
    * when duplicates only arrive within a bounded interval (at-least-
    * once upstream), keeping state finite at stream scale.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark("event_id")

  /** Custom keyed state via flatMapGroupsWithState: per-user running
    * totals, emitted on every update.
    */
  def userSessions(events: Dataset[EventRow]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventRow], state: GroupState[UserSession]) =>
          val evs = it.toSeq
          val prev = state.getOption.getOrElse(UserSession(uid, 0L, 0.0, -1L))
          val next = UserSession(
            user_id = uid,
            n_events = prev.n_events + evs.size,
            total_value = math.rint((prev.total_value + evs.map(_.value).sum) * 100) / 100,
            last_event_id = (prev.last_event_id +: evs.map(_.event_id)).max)
          state.update(next)
          Iterator(next)
      }
  }

  /** Per-user running totals on the arbitrary-state v2 API
    * (`transformWithState`, Spark 4): typed `ValueState` obtained from
    * the processor handle, declarative TTL available per state item,
    * timers for event/processing-time callbacks. Functionally the twin
    * of [[userSessions]]; requires the RocksDB state store provider
    * (`StreamingSpec` sets it for the query).
    */
  class RunningTotalsProcessor extends StatefulProcessor[Long, EventRow, UserSession] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserSession]("totals",
        org.apache.spark.sql.Encoders.product[UserSession], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: TimerValues): Iterator[UserSession] = {
      val evs = rows.toSeq
      val prev = if (state.exists()) state.get() else UserSession(key, 0L, 0.0, -1L)
      val next = UserSession(
        user_id = key,
        n_events = prev.n_events + evs.size,
        total_value = math.rint((prev.total_value + evs.map(_.value).sum) * 100) / 100,
        last_event_id = (prev.last_event_id +: evs.map(_.event_id)).max)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** [[userSessions]] re-expressed on `transformWithState`. */
  def userSessionsTws(events: Dataset[EventRow]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Stream-static join: enrich a stream against a static dimension
    * (broadcast per micro-batch — no streaming state).
    */
  def enrichAgainstStatic(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Stream-stream inner join with event-time bounds: match each click
    * to a signup by the same user within the preceding hour. Both sides
    * carry watermarks so the join state is evicted once the interval
    * can no longer match.
    */
  def streamStreamJoin(clicks: DataFrame, signups: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val s = signups.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts").as("signup_ts"))
    c.join(s,
      c("user_id") === s("user_id") &&
        col("click_ts") >= col("signup_ts") &&
        col("click_ts") <= col("signup_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), c("user_id").as("user_id"), col("click_ts"), col("signup_ts"))
  }

  /** Default state/shuffle partition count for the streaming sinks.
    * Streaming state cost scales with PARTITIONS × MICRO-BATCHES, not
    * with data: every stateful operator maintains (and checkpoints)
    * one state store per shuffle partition per batch, so a batch-
    * analytics width (32 here, thousands on a cluster) multiplies
    * fixed per-store overhead against key cardinalities that are tiny
    * per micro-batch. Sizing this to the streaming key cardinality —
    * open windows × types, entities per trickle batch — is the
    * standard Structured Streaming deployment knob; measured 1.5x on
    * the stateful sinks at sf0.1 (6.3s → 4.0s windowed upsert).
    */
  val StateParts: Int = 8

  /** A derived session whose shuffle width is [[StateParts]] — the
    * streaming query plans against it while the caller's session keeps
    * its batch-analytics width (`newSession` shares the context and
    * catalog; only the conf forks).
    */
  private def streamSession(spark: SparkSession, stateParts: Int): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
    ss
  }

  /** Fallback source schema for streaming reads of the events parquet
    * when the source directory has no files yet to sniff (ts as epoch
    * nanos — the canonical normalized form). When files exist,
    * [[extractStream]] reads the ACTUAL schema from a footer instead:
    * testdata generations have encoded `ts` as nanos-long, TIMESTAMP
    * or TIMESTAMP_NTZ (see `Tables.normalizeTsNanos`), and a
    * hard-coded long layout would either fail the read or — worse —
    * interpret micros as nanos and mint keys disagreeing with the
    * batch extract by 1000×.
    */
  val eventsNanosSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** End-to-end streaming ingest: file-stream the events source, stamp
    * + key records like the batch extract, and upsert each micro-batch
    * into the HudiLike target via foreachBatch (the streaming CoW-upsert
    * sink). Runs one AvailableNow pass and blocks until drained.
    */
  def runIngest(spark: SparkSession, sourceDir: String, targetPath: String,
      checkpoint: String, stateParts: Int = StateParts): Unit = {
    val q = extractStream(streamSession(spark, stateParts), sourceDir).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        HudiLike.upsertInto(batch.sparkSession, targetPath, batch,
          keys = Seq("record_id"), precombine = "event_timestamp",
          tieBreak = Seq("event_id"))
      }
      .start()
    q.awaitTermination()
  }

  /** The keyed/stamped extract stream shared by both ingest sinks.
    *
    * A file-stream source needs its schema up front, so the source's
    * physical `ts` encoding is sniffed from one batch-read footer
    * (metadata only — no data scan) and the stream is normalized to
    * the canonical epoch-nanos long exactly like the batch path
    * (`Tables.normalizeTsNanos`), then keyed through the SAME
    * projection as `Pipeline.extract` — batch and stream cannot drift.
    */
  private[streaming] def extractStream(spark: SparkSession, sourceDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Pipeline.keyedProjection(
      graft.Tables.normalizeTsNanos(
        fileStream(spark, sourceDir, eventsNanosSchema, maxFilesPerTrigger)),
      withBatchExtras = false)
  }

  /** Schema-sniffing parquet file stream shared by the ingest sinks:
    * the stream schema comes from a batch-read footer of the actual
    * source (metadata only), with `fallback` covering a not-yet-
    * populated directory. A single-FILE source (the raw testdata
    * layout) needs special handling: FileStreamSource forces basePath
    * to the source path on any non-glob path, and per-batch reads
    * reject a non-directory basePath — rewriting the path to a
    * single-match brace glob keeps our explicit parent basePath in
    * force.
    */
  private def fileStream(spark: SparkSession, sourceDir: String,
      fallback: StructType, maxFilesPerTrigger: Option[Int],
      presniffed: Option[StructType] = None): DataFrame = {
    // a caller that already sniffed the source (runIngestTable's
    // merged-union sniff) passes the schema in — re-listing every
    // footer here would double the stream's startup cost
    val schema = presniffed.getOrElse(
      try spark.read.parquet(sourceDir).schema
      catch {
        // only an empty or not-yet-created source dir has nothing to
        // sniff — start from the fallback schema. Any OTHER failure
        // (corrupt footer, permissions) must surface here, not get
        // silently papered over with a possibly-wrong schema.
        case e: org.apache.spark.sql.AnalysisException
            if Seq("UNABLE_TO_INFER_SCHEMA", "PATH_NOT_FOUND")
              .exists(c => Option(e.getCondition).exists(_.contains(c))) =>
          fallback
      })
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val hp = new org.apache.hadoop.fs.Path(sourceDir)
    val streamPath =
      if (scala.util.Try(hp.getFileSystem(spark.sessionState.newHadoopConf())
            .getFileStatus(hp).isFile).getOrElse(false)
          && hp.getParent != null) {
        reader.option("basePath", hp.getParent.toString)
        // escape glob metacharacters in the file name — an unescaped
        // {a,b} or [x] would silently match a DIFFERENT file set
        val escaped = hp.getName.replaceAll("([\\\\{}\\[\\]*?])", "\\\\$1")
        s"${hp.getParent}/{$escaped}"
      } else sourceDir
    reader.parquet(streamPath)
  }

  /** Fallback schema for streaming reads of a documents source. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming document ingest with ONLINE near-dup dedup — the shape a
    * training-data ingestion service runs: each micro-batch is deduped
    * against the standing MinHash-LSH index
    * (`graft.ops.Dedup.lshAgainstIndex` — exact copies collide on every
    * band, so exact dups are the est=1.0 special case) and within
    * itself; only accepted docs land in the corpus table AND fold into
    * the index (`appendToLshIndex`), so later batches dedup against
    * everything accepted so far. First-accepted-wins semantics: a doc
    * arriving after its near-dup was accepted is dropped, which makes
    * the outcome batch-ORDER-dependent by design (the streaming twin of
    * `dd_incremental_new`'s verdict, applied as a filter).
    * Per-batch cost is O(batch × bucket) lookup + O(batch) index/corpus
    * upserts — corpus never rescanned. `StreamingSpec` pins parity with
    * the sequential batch replay.
    */
  def runDedupIngest(spark: SparkSession, sourceDir: String, indexDir: String,
      acceptPath: String, checkpoint: String,
      maxFilesPerTrigger: Int = 1, stateParts: Int = StateParts): Unit = {
    val q = fileStream(streamSession(spark, stateParts), sourceDir,
      documentsSchema, Some(maxFilesPerTrigger))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.ops.Dedup.dedupIngestBatch(batch.sparkSession, batch,
            indexDir, acceptPath)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming ingest into a bucket-index table: same extract stream,
    * but each micro-batch lands via [[graft.etl.BucketTable.upsertInto]]
    * — O(batch + touched buckets) per commit instead of [[runIngest]]'s
    * O(table) snapshot rewrite. This is the sink shape that survives a
    * long-running stream at 100 TB: a trickle batch touching k of n
    * buckets rewrites k/n of the table, while the plain CoW sink's
    * per-batch cost grows with everything ingested so far. First batch
    * creates the table; `maxFilesPerTrigger` upstream controls batch
    * granularity. `StreamingSpec` proves multi-batch delivery reaches
    * key parity with the batch extract, and the driver gate checks the
    * final table against the latest-per-entity oracle
    * (`PipelineQueries.streamIngest`).
    *
    * `keys`/`precombine`/`tieBreak` choose the upsert identity: the
    * default `record_id` keeps every extracted event (pure ingest);
    * keying on `entity_id` makes each micro-batch's precombine
    * resolution collapse to the latest state per entity — the streaming
    * twin of `p_upsert_precombine`. Because the (precombine, tieBreak)
    * order is total, the final table is independent of how events were
    * batched — out-of-order delivery converges to the same state.
    */
  /** End-to-end streaming windowed aggregation: file-stream the events
    * source (encoding-aware, same sniff as the ingest sinks), tumble
    * into 1-hour event-time windows, and publish the aggregate each
    * micro-batch via Complete-mode foreachBatch overwrite — the
    * classic streaming-rollup serving pattern (latest full aggregate
    * always readable at `outPath`). Values are summed as integer cents
    * so the published numbers are exactly reproducible by a batch
    * engine (same discipline as `p_ivm_rollup`).
    *
    * State scale: rows-in-state = open windows × event types — bounded
    * by the time span, not the corpus; the per-batch overwrite writes
    * O(state) rows. Complete mode retains all windows (no
    * watermark-eviction) — the right trade while the window×type
    * cardinality is the small serving table; an unbounded-horizon
    * deployment would switch the sink to Update mode + keyed upsert
    * (`runIngestBucketed`'s sink) and let the 10-minute watermark
    * evict closed windows.
    */
  def runWindowedAgg(spark: SparkSession, sourceDir: String, outPath: String,
      checkpoint: String, maxFilesPerTrigger: Option[Int] = None,
      stateParts: Int = StateParts): Unit = {
    val s = streamSession(spark, stateParts)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.Tables.normalizeTsNanos(
      fileStream(s, sourceDir, eventsNanosSchema, maxFilesPerTrigger))
      .filter(col("ts").isNotNull)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select(
          unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"),
          round(col("cents") / 100.0, 2).as("total"))
          .write.mode("overwrite").parquet(outPath)
      }
      .start()
    q.awaitTermination()
  }

  /** End-to-end streaming SESSION-window aggregation: file-stream the
    * events source, merge per-user gap sessions in the state store
    * (`session_window`, 30-minute gap — windows merge as events
    * arrive, the one windowing shape a batch GROUP BY can't express
    * statically), and publish the full session table each micro-batch
    * via Complete-mode foreachBatch overwrite, same serving pattern as
    * [[runWindowedAgg]]. Session end is Spark's `last event + gap`.
    * State scale: rows-in-state = open sessions, bounded by active
    * users × gap, not corpus; an unbounded deployment would switch to
    * Append mode and let the watermark emit closed sessions.
    */
  def runSessionAgg(spark: SparkSession, sourceDir: String, outPath: String,
      checkpoint: String, maxFilesPerTrigger: Option[Int] = None,
      stateParts: Int = StateParts): Unit = {
    val s = streamSession(spark, stateParts)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.Tables.normalizeTsNanos(
      fileStream(s, sourceDir, eventsNanosSchema, maxFilesPerTrigger))
      .filter(col("ts").isNotNull)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select(
          col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"),
          round(col("cents") / 100.0, 2).as("session_value"))
          .write.mode("overwrite").parquet(outPath)
      }
      .start()
    q.awaitTermination()
  }

  /** End-to-end stream-stream interval join: clicks and signups (two
    * streams over the same event source, split by type) joined per
    * user within the preceding hour — both sides watermarked so the
    * join state evicts rows that can no longer match, matches appended
    * to the sink as soon as both sides arrive. The canonical
    * two-stream enrichment no batch diff can replace on a live
    * pipeline; on a finite AvailableNow run the appended set equals
    * the batch interval join the oracle replays.
    */
  def runStreamJoin(spark: SparkSession, sourceDir: String, outPath: String,
      checkpoint: String, maxFilesPerTrigger: Option[Int] = None,
      stateParts: Int = StateParts): Unit = {
    val s = streamSession(spark, stateParts)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def typed(t: String) = graft.Tables.normalizeTsNanos(
      fileStream(s, sourceDir, eventsNanosSchema, maxFilesPerTrigger))
      .filter(col("ts").isNotNull && col("event_type") === t)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val joined = streamStreamJoin(typed("click"), typed("signup"))
      .select(col("click_id"), col("user_id"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("signup_ts")).as("signup_us"))
    val q = joined.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outPath)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming ingest through the BLOOM-indexed CoW table — the third
    * sink of the matrix (HudiLike whole-table, BucketTable
    * hash-routed, BloomTable range/bloom-routed): each micro-batch is
    * tagged to candidate files and merges against only those, and the
    * inline [[graft.etl.BloomTable.maybeCompact]] bounds small-file
    * drift from append-heavy batches — compaction riding the stream
    * the way Hudi schedules inline compaction between commits.
    */
  def runIngestBloomRouted(spark: SparkSession, sourceDir: String,
      targetPath: String, checkpoint: String,
      maxFilesPerTrigger: Int = 1,
      keys: Seq[String] = Seq("entity_id"),
      precombine: String = "event_timestamp",
      tieBreak: Seq[String] = Seq("event_id"),
      stateParts: Int = StateParts): Unit = {
    val q = extractStream(streamSession(spark, stateParts), sourceDir,
      Some(maxFilesPerTrigger)).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (!graft.etl.BloomTable.exists(targetPath))
            graft.etl.BloomTable.create(batch, targetPath,
              keys = keys, precombine = precombine, tieBreak = tieBreak)
          else {
            graft.etl.BloomTable.upsertInto(batch.sparkSession, targetPath, batch)
            graft.etl.BloomTable.maybeCompact(batch.sparkSession, targetPath)
              .foreach(_ => graft.etl.BloomTable.clean(targetPath))
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** The unbounded-horizon twin of [[runWindowedAgg]]: Update-mode
    * emission (only windows CHANGED by the micro-batch) upserted into
    * a [[graft.etl.BucketTable]] keyed on (window, type). Per batch
    * the sink cost is O(changed windows + touched buckets) — never
    * O(all windows) like a Complete-mode rewrite — and the 10-minute
    * watermark evicts closed windows from the state store, so both
    * state and per-commit work stay bounded on an infinite stream.
    * The per-key emission sequence is monotone in `n` (a window only
    * ever folds rows in), so `n` is the precombine column: latest
    * update wins, replays after a checkpoint recovery included.
    */
  def runWindowedAggKeyed(spark: SparkSession, sourceDir: String,
      tablePath: String, checkpoint: String,
      maxFilesPerTrigger: Option[Int] = None,
      stateParts: Int = StateParts): Unit = {
    val s = streamSession(spark, stateParts)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.Tables.normalizeTsNanos(
      fileStream(s, sourceDir, eventsNanosSchema, maxFilesPerTrigger))
      .filter(col("ts").isNotNull)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"))
    val q = agg.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.select(
          unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"),
          round(col("cents") / 100.0, 2).as("total"))
        if (!rows.isEmpty) {
          if (!graft.etl.BucketTable.exists(tablePath))
            // 16 buckets, the default: a 4-bucket "right-sized" layout
            // was measured 1.5x SLOWER end-to-end at sf0.1 (the
            // per-commit merge+write serializes over too few tasks),
            // and per-commit file count is bounded by bucket count
            // either way — parallelism wins at this cardinality
            graft.etl.BucketTable.create(rows, tablePath,
              keys = Seq("window_start_us", "event_type"), precombine = "n",
              numBuckets = 16)
          else
            graft.etl.BucketTable.upsertInto(rows.sparkSession, tablePath, rows)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming ingest into the VALUE-partitioned table — the fourth
    * sink of the matrix (HudiLike whole-table, BucketTable hash-routed,
    * BloomTable range/bloom-routed, [[graft.etl.PartitionedTable]]
    * date-routed): each micro-batch is stamped with its event DATE and
    * upserted, rewriting only the day partitions the batch touches. For
    * a live stream that is "today" (plus whatever late data the batch
    * carries) — the per-commit cost a date-partitioned 100 TB table is
    * deployed for. Keyed on `entity_id` within the day by default, the
    * table converges to latest-state-per-entity-per-day regardless of
    * how events were batched (total (precombine, tieBreak) order).
    */
  def runIngestPartitioned(spark: SparkSession, sourceDir: String,
      targetPath: String, checkpoint: String,
      maxFilesPerTrigger: Int = 1,
      keys: Seq[String] = Seq("entity_id"),
      precombine: String = "event_timestamp",
      tieBreak: Seq[String] = Seq("event_id"),
      numGroups: Int = 8,
      stateParts: Int = StateParts): Unit = {
    val q = extractStream(streamSession(spark, stateParts), sourceDir,
      Some(maxFilesPerTrigger)).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val dated = batch.withColumn("event_date",
            to_date(col("event_timestamp")))
          if (!graft.etl.PartitionedTable.exists(targetPath))
            // file groups bound the per-commit rewrite to the touched
            // (day, group) slices — the difference between O(batch)
            // and O(today) per micro-batch on a long-running stream
            graft.etl.PartitionedTable.create(dated, targetPath,
              keys = keys, precombine = precombine, tieBreak = tieBreak,
              partitionCols = Seq("event_date"), numGroups = numGroups)
          else
            graft.etl.PartitionedTable.upsertInto(batch.sparkSession,
              targetPath, dated)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** The MERGE-ON-READ streaming sink — the per-commit cost floor of
    * the sink matrix: each micro-batch lands as one O(batch) delta
    * append ([[graft.etl.PartitionedTable.upsertDelta]] — no base
    * read, nothing rewritten), and inline compaction
    * ([[graft.etl.PartitionedTable.maybeCompactDeltas]]) folds the log
    * into the base every `maxDeltaCommits` commits, bounding the
    * snapshot read's merge fan-in — exactly Hudi's streaming-MOR
    * write + inline-compaction schedule. Where [[runIngestPartitioned]]
    * (CoW) pays O(touched day slices) per micro-batch, this pays
    * O(batch) on most commits; the stream converges to the same state
    * because the (precombine, commit seq, tieBreak) order is total.
    */
  def runIngestPartitionedMor(spark: SparkSession, sourceDir: String,
      targetPath: String, checkpoint: String,
      maxFilesPerTrigger: Int = 1,
      keys: Seq[String] = Seq("entity_id"),
      precombine: String = "event_timestamp",
      tieBreak: Seq[String] = Seq("event_id"),
      maxDeltaCommits: Int = 8,
      stateParts: Int = StateParts): Unit = {
    val q = extractStream(streamSession(spark, stateParts), sourceDir,
      Some(maxFilesPerTrigger)).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val dated = batch.withColumn("event_date",
            to_date(col("event_timestamp")))
          if (!graft.etl.PartitionedTable.exists(targetPath))
            graft.etl.PartitionedTable.create(dated, targetPath,
              keys = keys, precombine = precombine, tieBreak = tieBreak,
              partitionCols = Seq("event_date"))
          else {
            graft.etl.PartitionedTable.upsertDelta(batch.sparkSession,
              targetPath, dated)
            graft.etl.PartitionedTable.maybeCompactDeltas(batch.sparkSession,
              targetPath, maxDeltaCommits)
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming DEAD-LETTER ingest — [[runIngestBucketed]] with the
    * table's pre-commit rules applied to EVERY micro-batch
    * ([[graft.ops.DataQuality.splitByRules]]): clean rows upsert into
    * the target, each violating row lands in the quarantine
    * BucketTable tagged with the rules it tripped — the error-table
    * discipline under exactly-once streaming, vs the batch gate's
    * whole-batch abort. A replayed micro-batch (crash between a table
    * commit and the checkpoint commit) is idempotent on BOTH sinks
    * because each is a keyed upsert.
    */
  def runIngestQuarantined(spark: SparkSession, sourceDir: String,
      targetPath: String, quarantinePath: String, checkpoint: String,
      rules: Seq[graft.etl.PreCommit.Rule],
      maxFilesPerTrigger: Int = 1,
      keys: Seq[String] = Seq("record_id"),
      precombine: String = "event_timestamp",
      tieBreak: Seq[String] = Seq("event_id"),
      quarantineKeys: Seq[String] = Seq("event_id"),
      stateParts: Int = StateParts): Unit = {
    val q = extractStream(streamSession(spark, stateParts), sourceDir,
      Some(maxFilesPerTrigger)).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // materialize the micro-batch once: its four consumers (each
        // sink's emptiness gate + upsert) otherwise re-read the source
        // files per evaluation (guide §5 — reused frame, 4 scans → 1).
        // BOTH sinks' emptiness gates ride the checkpoint as observed
        // counts (guide §2.4) — zero per-sink isEmpty jobs; the split
        // predicate here must match splitByRules' exactly (null = bad)
        val anyBad = rules
          .map(r => coalesce(r.violation.cast("boolean"), lit(true)))
          .reduce(_ || _)
        val (b, ns) = graft.etl.Fuse.checkpointObserved(batch,
          count(when(!anyBad, 1)), count(when(anyBad, 1)))
        val (nClean, nBad) = (ns(0).asInstanceOf[Number].longValue(),
          ns(1).asInstanceOf[Number].longValue())
        val (clean, bad) = graft.ops.DataQuality.splitByRules(b, rules)
        def sink(path: String, df: DataFrame, n: Long, ks: Seq[String],
            tb: Seq[String]): Unit =
          if (n > 0L) {
            if (!graft.etl.BucketTable.exists(path))
              graft.etl.BucketTable.create(df, path, keys = ks,
                precombine = precombine, tieBreak = tb)
            else {
              graft.etl.BucketTable.upsertInto(df.sparkSession, path, df)
              ()
            }
          }
        sink(targetPath, clean, nClean, keys, tieBreak)
        sink(quarantinePath, bad, nBad, quarantineKeys, Nil)
      }
      .start()
    q.awaitTermination()
  }

  /** Generic streaming TABLE ingest — the schema-flexible sibling of
    * [[runIngestBucketed]]: file-stream `sourceDir` AS-IS (no
    * events-specific projection; the stream schema is the merged union
    * of the source's current footers) and upsert each micro-batch into
    * the bucket table at `targetPath`, creating it on the first
    * non-empty batch. Because the schema is re-sniffed at every START,
    * a source that gained a column between runs presents it on
    * restart — the streaming half of metadata-only schema evolution:
    * `ALTER TABLE ... ADD COLUMNS`, restart the stream on the SAME
    * checkpoint, and the widened batches upsert while old rows read as
    * typed NULLs (the layout's schema-on-read union). Replay safety is
    * [[runIngestBucketed]]'s: the keyed precombine upsert makes a
    * redelivered batch idempotent.
    */
  def runIngestTable(spark: SparkSession, sourceDir: String,
      targetPath: String, checkpoint: String,
      keys: Seq[String], precombine: String, tieBreak: Seq[String] = Nil,
      maxFilesPerTrigger: Int = 1, stateParts: Int = StateParts): Unit = {
    val ss = streamSession(spark, stateParts)
    // ONE sniff per start, as the merged union of ALL source footers —
    // a single-footer sniff could pick a stale narrow file after the
    // source gained a column. The source must exist (a generic ingest
    // has no canonical fallback schema), so this throws loudly on an
    // empty directory.
    val schema = ss.read.option("mergeSchema", "true")
      .parquet(sourceDir).schema
    val q = fileStream(ss, sourceDir, schema, Some(maxFilesPerTrigger),
      presniffed = Some(schema)).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (!graft.etl.BucketTable.exists(targetPath))
            graft.etl.BucketTable.create(batch, targetPath,
              keys = keys, precombine = precombine, tieBreak = tieBreak)
          else {
            graft.etl.BucketTable.upsertInto(batch.sparkSession, targetPath,
              batch)
            ()
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  def runIngestBucketed(spark: SparkSession, sourceDir: String,
      targetPath: String, checkpoint: String,
      maxFilesPerTrigger: Int = 1,
      keys: Seq[String] = Seq("record_id"),
      precombine: String = "event_timestamp",
      tieBreak: Seq[String] = Seq("event_id"),
      stateParts: Int = StateParts,
      afterTableCommit: Long => Unit = _ => ()): Unit = {
    val q = extractStream(streamSession(spark, stateParts), sourceDir,
      Some(maxFilesPerTrigger)).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // skip empty micro-batches: creating the table from one would
        // commit an empty manifest and give later batches nothing to
        // route against (and an empty upsert is a no-op anyway)
        if (!batch.isEmpty) {
          if (!graft.etl.BucketTable.exists(targetPath))
            graft.etl.BucketTable.create(batch, targetPath,
              keys = keys, precombine = precombine, tieBreak = tieBreak)
          else
            graft.etl.BucketTable.upsertInto(batch.sparkSession, targetPath, batch)
          // crash-injection seam (tests only): runs after the table's
          // manifest swing but BEFORE Structured Streaming commits the
          // batch to the checkpoint — a throw here models the worst
          // crash window, where the table holds a batch the checkpoint
          // does not. Recovery REPLAYS that batch; the keyed precombine
          // upsert makes the replay idempotent, which is exactly the
          // sink's exactly-once argument (StreamingSpec proves it).
          afterTableCommit(batchId)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming ingest into a MOR table — the Hudi pairing for
    * high-frequency ingest: each micro-batch APPENDS as a delta log,
    * O(batch) write regardless of table size; the merge cost moves to
    * snapshot readers and compaction, not the ingest path. A replayed
    * micro-batch (crash between the log append and the checkpoint
    * commit — the [[runIngestBucketed]] crash window) appends a
    * DUPLICATE log whose rows carry identical key/precombine/payload;
    * the snapshot merge resolves every key to the same row, so the
    * RESULT is exactly-once even though the storage is at-least-once
    * (Hudi's MOR streaming sink makes the same trade — compaction
    * folds the duplicate away). `StreamingSpec` proves the replayed
    * snapshot byte-equals the clean run's.
    */
  def runIngestMor(spark: SparkSession, sourceDir: String,
      targetPath: String, checkpoint: String,
      maxFilesPerTrigger: Int = 1,
      keys: Seq[String] = Seq("record_id"),
      precombine: String = "event_timestamp",
      tieBreak: Seq[String] = Seq("event_id"),
      stateParts: Int = StateParts,
      afterTableCommit: Long => Unit = _ => ()): Unit = {
    val q = extractStream(streamSession(spark, stateParts), sourceDir,
      Some(maxFilesPerTrigger)).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          if (graft.etl.MorTable.state(targetPath).isEmpty)
            graft.etl.MorTable.create(batch, targetPath,
              keys = keys, precombine = precombine, tieBreak = tieBreak)
          else
            graft.etl.MorTable.upsertInto(targetPath, batch)
          afterTableCommit(batchId)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming incremental read of a MOR table — Hudi's "streaming
    * query" on the read side: the delta log is an append-only sequence
    * of immutable parquet dirs (`log=base.seq/`), so Spark's file-stream
    * source globbed over them IS the change stream. Discovery,
    * offset tracking and exactly-once delivery come from Structured
    * Streaming's own file-source checkpoint — no custom Source; the
    * checkpoint plays the role of Hudi's incremental-read cursor: a
    * later run with the SAME checkpoint emits only commits that landed
    * since the previous run, each exactly once. Tombstone logs are
    * schema-sparse (key + precombine only); the explicit schema makes
    * the parquet reader surface their absent payload columns as NULL —
    * the same union-by-name semantics as the batch `incrementalRead`.
    * At scale this consumes O(changes) per pass regardless of table
    * size: the base and already-consumed logs are never listed as new.
    */
  def runTableChangeStream(spark: SparkSession, tablePath: String,
      outPath: String, checkpoint: String): Unit = {
    requireWindowStillOnDisk(spark, tablePath, outPath)
    val q = changeStream(spark, tablePath)
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The silent-skip guard for a change stream that straddles
    * compaction: change seqs are globally monotonic, so a compaction
    * BETWEEN two checkpointed passes is harmless as long as the folded
    * log dirs still exist — the file source reads the unconsumed ones
    * on the next pass, correctly numbered. But once `clean` removes a
    * folded log this consumer never read, the commit is gone and the
    * glob would simply not match it — the pass would succeed while
    * silently missing data. Detect exactly that (consumer's delivered
    * head < compaction floor AND a seq in between has no log dir left)
    * and fail the pass loudly toward a snapshot re-sync. A fresh
    * consumer (no output yet) seeds from a snapshot by contract, so the
    * guard does not apply.
    */
  private def requireWindowStillOnDisk(spark: SparkSession,
      tablePath: String, outPath: String): Unit = {
    val consumed: Option[Long] =
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(outPath))) None
      else scala.util.Try(spark.read.parquet(outPath).agg(max(col("_seq")))
        .head.getAs[Any](0)).toOption.collect {
          // no files yet / no rows → no cursor established (fresh
          // consumer: seeds from a snapshot by contract)
          case l: Long => l
        }
    requireWindowStillOnDisk(tablePath, consumed)
  }

  private def requireWindowStillOnDisk(tablePath: String,
      consumed: Option[Long]): Unit = {
    val floor = graft.etl.MorTable.compactedThrough(tablePath)
    if (floor == 0L) return // never compacted: every commit is live
    consumed.foreach { c =>
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(tablePath))
      val onDisk =
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("log="))
          .map(_.drop(4).dropWhile(_ != '.').drop(1).toLong) // "log=B.S" -> S
          .toSet
        finally s.close()
      val missing = ((c + 1) to floor).filterNot(onDisk)
      require(missing.isEmpty,
        s"MOR change stream at $tablePath: commits ${missing.mkString(",")} " +
          "were folded by compaction and cleaned before this consumer " +
          "read them — re-sync the downstream from a snapshot and " +
          "restart with a fresh checkpoint")
    }
  }

  /** The consumer's delivered head derived from the file-source
    * CHECKPOINT (not from output rows): the highest log seq among
    * files the source has committed to a micro-batch. This is the
    * cursor for consumers whose sink drops `_seq` (e.g.
    * [[runTableToTable]]'s keyed target) — the divergence after a
    * silent skip would otherwise be undetectable downstream. Reads the
    * source's `sources/0` offset files (v1 file-source format: one
    * JSON entry per discovered file, including `.compact` folds).
    */
  private def consumedHeadFromCheckpoint(checkpoint: String): Option[Long] = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(checkpoint, "sources", "0")
    if (!java.nio.file.Files.exists(dir)) return None
    val seqRe = "log=\\d+\\.(\\d+)/".r
    val s = java.nio.file.Files.list(dir)
    val seqs =
      try s.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          !p.getFileName.toString.endsWith(".tmp"))
        // lenient decode: offset files are JSON text, but Spark may mix
        // in non-text artifacts (CRCs, compaction headers) — malformed
        // bytes must not fail the guard, they just can't contribute a seq
        .map(p => new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8))
        .flatMap(t => seqRe.findAllMatchIn(t).map(_.group(1).toLong))
        .toSeq
      finally s.close()
    seqs.maxOption
  }

  /** The MOR delta log as a streaming DataFrame (see
    * [[runTableChangeStream]] for the contract).
    */
  private def changeStream(spark: SparkSession, tablePath: String): DataFrame = {
    val schema = StructType(
      graft.etl.MorTable.readOptimized(spark, tablePath).schema.fields ++
        Seq(StructField("_seq", LongType), StructField("_deleted", BooleanType)))
    spark.readStream.schema(schema).parquet(s"$tablePath/log=*")
  }

  /** Table-to-table incremental ETL — the DeltaStreamer-chaining
    * pattern: a MOR source table's change stream feeds a keyed
    * BucketTable downstream. Per micro-batch: precombine the changes
    * (latest per key by (precombine, _seq, tie-break) — `_seq` so a
    * later commit beats an equal-precombine earlier one), route live
    * rows through the keyed upsert and tombstones through the keyed
    * delete — both partial-bucket rewrites, so each batch costs
    * O(changes), and the replay after a crash is idempotent for the
    * same reason the ingest sink's is (keyed precombine + delete of
    * already-deleted keys is a no-op). The caller seeds the target
    * with the source's base (full load), then repeated runs with one
    * checkpoint keep it converged to the source snapshot — initial
    * full extract + incremental tail, exactly the reference pipeline's
    * two modes composed end-to-end across TABLES.
    */
  def runTableToTable(spark: SparkSession, sourceMorPath: String,
      targetPath: String, checkpoint: String, keys: Seq[String],
      precombine: String, tieBreak: Seq[String]): Unit = {
    // same silent-skip exposure as runTableChangeStream (shared log=*
    // glob) — but the target drops _seq, so the consumed head comes
    // from the checkpoint's committed file list instead of output rows
    requireWindowStillOnDisk(sourceMorPath,
      consumedHeadFromCheckpoint(checkpoint))
    val q = changeStream(spark, sourceMorPath).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // materialize the precombined frame once: its four consumers
        // (two emptiness gates, the upsert, the delete) otherwise
        // re-run the window over a re-scan of the change files each
        // (guide §5 — reused frame, 4 window passes → 1). BOTH gates
        // (and the outer batch-emptiness one) ride the checkpoint as
        // observed counts — zero isEmpty jobs per micro-batch
        // (guide §2.4)
        val (latest, ns) = graft.etl.Fuse.checkpointObserved(
          HudiLike.precombineLatest(batch, keys, precombine,
            "_seq" +: tieBreak),
          count(when(!col("_deleted"), 1)), count(when(col("_deleted"), 1)))
        val (nUps, nDels) = (ns(0).asInstanceOf[Number].longValue(),
          ns(1).asInstanceOf[Number].longValue())
        val ups = latest.filter(!col("_deleted")).drop("_seq", "_deleted")
        val dels = latest.filter(col("_deleted"))
          .select(keys.map(col): _*)
        if (nUps > 0L) {
          if (!graft.etl.BucketTable.exists(targetPath))
            graft.etl.BucketTable.create(ups, targetPath,
              keys = keys, precombine = precombine, tieBreak = tieBreak)
          else
            graft.etl.BucketTable.upsertInto(batch.sparkSession, targetPath, ups)
        }
        if (graft.etl.BucketTable.exists(targetPath) && nDels > 0L)
          graft.etl.BucketTable.deleteFrom(batch.sparkSession, targetPath, dels)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
