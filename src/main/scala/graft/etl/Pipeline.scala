package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline configuration. `clock` is injectable so tests and oracle
  * queries stay deterministic — the reference hardwires
  * `int(time.time()*1000)` (reference: pipeline_architecture.py:154, 271)
  * and nondeterministic `uuid()` keys (py:209), which breaks its own
  * idempotency claim (README.md:81-83); we mint deterministic record keys
  * instead (sha2 over the business columns).
  */
case class PipelineConfig(
    name: String,
    sourcePath: String,
    targetPath: String,
    logPath: String,
    clock: () => Long = () => System.currentTimeMillis())

case class RunResult(
    status: String, recordsProcessed: Long, mode: String, watermark: Option[Long])

/** Per-environment deployment preset (reference `ENVIRONMENT_CONFIGS`,
  * pipeline_architecture.py:423-448): database/pipeline name prefixes
  * plus the Spark parallelism knobs that differ between a laptop dev
  * loop and the production cluster. `sparkConfigs` go on the session
  * BUILDER — `spark.default.parallelism` is fixed at context start and
  * cannot be set on a live session.
  */
case class EnvProfile(
    environment: String,
    databaseName: String,
    pipelineName: String,
    sparkConfigs: Map[String, String]) {

  /** Apply this profile's Spark configs to a session builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    sparkConfigs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Derive a run config named under this environment's prefix. */
  def pipelineConfig(sourcePath: String, targetPath: String, logPath: String,
      clock: () => Long = () => System.currentTimeMillis()): PipelineConfig =
    PipelineConfig(pipelineName, sourcePath, targetPath, logPath, clock)
}

object PipelineConfig {

  /** dev/staging/prod presets (py:424-447). Partition counts mirror the
    * reference's template; production's 200 is the deploy-time knob —
    * at the 1000-executor / 100 TB scale this library targets it is
    * sized to ~2-3× total cores with ~128-256 MB per shuffle partition,
    * not left at the template value.
    */
  val Environments: Map[String, EnvProfile] = Map(
    "development" -> EnvProfile("development", "dev_graft_db",
      "dev_data_processing_pipeline",
      Map("spark.sql.shuffle.partitions" -> "10",
        "spark.default.parallelism" -> "10")),
    "staging" -> EnvProfile("staging", "staging_graft_db",
      "staging_data_processing_pipeline",
      Map("spark.sql.shuffle.partitions" -> "50",
        "spark.default.parallelism" -> "50")),
    "production" -> EnvProfile("production", "prod_graft_db",
      "prod_data_processing_pipeline",
      Map("spark.sql.shuffle.partitions" -> "200",
        "spark.default.parallelism" -> "200")))

  def forEnvironment(env: String): EnvProfile =
    Environments.getOrElse(env, throw new IllegalArgumentException(
      s"unknown environment '$env' (expected one of ${Environments.keys.mkString(", ")})"))

  /** Resolve the profile from the deploy environment variable (the
    * reference selects its config map entry the same way); the lookup is
    * injectable so tests don't mutate the process environment.
    */
  def fromEnv(lookup: String => Option[String] = sys.env.get): EnvProfile =
    forEnvironment(lookup("GRAFT_ENV").getOrElse("development"))
}

/** The incremental ETL kernel: watermark read → incremental extract →
  * metadata stamp → keyed upsert → audit log. Re-expresses the
  * reference's `run_pipeline` (pipeline_architecture.py:262-335) on pure
  * Spark; see §3 of SURVEY.md for the lifecycle trace.
  */
object Pipeline {

  /** Incremental extraction (py:201-231): project the source event
    * columns, require a non-null event timestamp (py:218), and — when a
    * watermark exists — keep only rows ingested after it (py:221-224; the
    * filter is on ingestion time, so late *event* times still land).
    * The record key is deterministic: sha2 over the identifying columns
    * (F1 fix, SURVEY.md §2.8). The reference's trailing global ORDER BY
    * (py:226) is dropped: sort order is not a semantic property of a
    * table write, and the range-partitioned exchange it forces is pure
    * cost at scale (SURVEY.md §6).
    */
  def extract(spark: SparkSession, sourcePath: String, watermarkMs: Option[Long]): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(sourcePath)
    // Event time is keyed at MICROsecond precision (`ts div 1000`): the
    // source encodes nanos-as-long or micros-timestamp (see
    // Tables.normalizeTsNanos), and DuckDB truncates nanos to micros on
    // read, so micros is the finest unit both engines agree on exactly.
    // Integer div throughout — epoch nanos ~1.7e18 exceeds double's 2^53
    // mantissa, so floating division would corrupt the low digits.
    // The watermark predicate is applied to the RAW physical column
    // before normalization, with a literal of the column's own type:
    // `ts div 1e6 > wm ⟺ ts >= (wm+1)·1e6` (nanos long) resp.
    // `ts >= timestamp_micros((wm+1)·1e3)` (micros timestamp). The
    // derived-column form (`event_time_ms > wm`) is an arithmetic
    // expression parquet can't evaluate; the typed form reaches
    // PushedFilters and prunes row groups by ingestion time — the
    // property that makes incremental extracts cheap at scale.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val gated = (watermarkMs, raw.schema("ts").dataType) match {
      case (Some(wm), TimestampType) =>
        raw.filter(col("ts") >= timestamp_micros(lit((wm + 1) * 1000L)))
      case (Some(wm), TimestampNTZType) =>
        // literal-side cast only (UTC session): the column stays bare so
        // the comparison still reaches PushedFilters
        raw.filter(col("ts") >=
          timestamp_micros(lit((wm + 1) * 1000L)).cast(TimestampNTZType))
      case (Some(wm), _) => raw.filter(col("ts") >= lit((wm + 1) * 1000000L))
      case (None, _)     => raw
    }
    keyedProjection(graft.Tables.normalizeTsNanos(gated), withBatchExtras = true)
  }

  /** THE record-key/stamp projection, over a NORMALIZED events frame
    * (`ts` = epoch-nanos long — `Tables.normalizeTsNanos`). Both ingest
    * front doors — [[extract]] and
    * `graft.streaming.StreamingPipeline.extractStream` — call this one
    * definition, so the deterministic key (sha2 over the identifying
    * columns at micro precision) cannot drift between batch and stream;
    * `TsEncodingSpec` diff-tests the two paths on every physical `ts`
    * encoding. `withBatchExtras` adds the batch-only derived columns
    * (`event_time_ms`, `props`) the streaming sink does not carry.
    */
  private[graft] def keyedProjection(normalized: DataFrame,
      withBatchExtras: Boolean): DataFrame = {
    val cols = Seq(
      sha2(concat_ws("|", col("event_id"), col("user_id"),
        expr("ts div 1000")), 256).as("record_id"),
      col("event_id"), col("user_id").as("entity_id"),
      timestamp_micros(expr("ts div 1000")).as("event_timestamp")) ++
      (if (withBatchExtras) Seq(expr("ts div 1000000").as("event_time_ms")) else Nil) ++
      Seq(col("event_type"), col("value")) ++
      (if (withBatchExtras) Seq(col("props")) else Nil)
    normalized.filter(col("ts").isNotNull).select(cols: _*)
  }

  /** Metadata stamping (py:233-236): processing date + load timestamp,
    * driven by the injectable clock.
    */
  def transform(df: DataFrame, nowMs: Long): DataFrame = df
    .withColumn("processing_date", to_date(timestamp_millis(lit(nowMs))))
    .withColumn("load_timestamp", timestamp_millis(lit(nowMs)))

  /** One full run. Returns the outcome that also lands in the audit log.
    * Differences from the reference, both deliberate:
    *   - the extract is cached before the count gate so the plan executes
    *     once, not twice (the reference re-runs the extract for the write,
    *     py:283 vs py:297 — §3 step 5 note);
    *   - failure logging (py:318-330) wraps the load, then rethrows.
    */
  def run(spark: SparkSession, conf: PipelineConfig): RunResult = {
    val startMs = conf.clock()
    val wm = Watermark.lastSuccessfulRun(spark, conf.logPath, conf.name)
    val mode = if (wm.isDefined) "incremental" else "full"
    try {
      val extracted = extract(spark, conf.sourcePath, wm).cache()
      val n = extracted.count()
      if (n == 0) { // empty-batch short-circuit (py:285-293)
        log(spark, conf, wm, startMs, "SUCCESS", 0)
        extracted.unpersist()
        return RunResult("SUCCESS", 0, mode, wm)
      }
      val stamped = transform(extracted, startMs)
      HudiLike.upsertInto(spark, conf.targetPath, stamped,
        keys = Seq("record_id"), precombine = "load_timestamp",
        tieBreak = Seq("event_id"))
      extracted.unpersist()
      log(spark, conf, wm, startMs, "SUCCESS", n)
      RunResult("SUCCESS", n, mode, wm)
    } catch {
      case e: Exception =>
        log(spark, conf, wm, startMs, "FAILED", 0, Some(e.getMessage))
        throw e
    }
  }

  /** E1 — the scheduled/automated entry point (`daily_pipeline_run`,
    * py:371-379): no caller-provided session, so the kernel acquires one
    * and stops it afterwards (the reference's `cleanup_spark=True` path,
    * py:332-335). `run` itself is E2, the caller-managed-session form.
    */
  def dailyRun(conf: PipelineConfig, master: String = "local[*]"): RunResult = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(s"graft-pipeline-${conf.name}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try run(spark, conf)
    finally spark.stop()
  }

  /** Targeted reprocessing (backfill): run the kernel with an explicit
    * watermark override — everything ingested after `fromMs` is
    * re-extracted and upserted. Safe to fire at any time because record
    * keys are deterministic (sha2 of business columns): already-loaded
    * rows are replaced in place, never duplicated — the idempotency the
    * reference claims (README.md:81-83) but cannot deliver with uuid()
    * keys. The run is logged under `<name>-backfill`, so the normal
    * pipeline's watermark chain is untouched.
    */
  def backfill(spark: SparkSession, conf: PipelineConfig, fromMs: Long): RunResult = {
    val startMs = conf.clock()
    val bfConf = conf.copy(name = conf.name + "-backfill")
    val wm = Some(fromMs)
    try {
      val extracted = extract(spark, conf.sourcePath, wm).cache()
      val n = extracted.count()
      if (n > 0) {
        HudiLike.upsertInto(spark, conf.targetPath, transform(extracted, startMs),
          keys = Seq("record_id"), precombine = "load_timestamp",
          tieBreak = Seq("event_id"))
      }
      extracted.unpersist()
      log(spark, bfConf, wm, startMs, "SUCCESS", n)
      RunResult("SUCCESS", n, "backfill", wm)
    } catch {
      case e: Exception =>
        log(spark, bfConf, wm, startMs, "FAILED", 0, Some(e.getMessage))
        throw e
    }
  }

  private def log(spark: SparkSession, conf: PipelineConfig, wm: Option[Long],
      startMs: Long, status: String, n: Long, err: Option[String] = None): Unit = {
    val endMs = conf.clock()
    Watermark.writeEntry(spark, conf.logPath, LogEntry(
      pipeline_name = conf.name,
      last_run_timestamp = wm,
      current_run_timestamp = startMs,
      status = status,
      records_processed = n.toInt,
      processing_time_seconds = (endMs - startMs) / 1000.0,
      error_message = err,
      created_at = endMs))
  }
}
