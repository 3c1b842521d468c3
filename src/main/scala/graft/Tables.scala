package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference registers Hudi tables in a Hive metastore and reads them
  * via `spark.sql` (reference: pipeline_architecture.py:78-97, 207-227).
  * This environment has no metastore and no Hudi jar, so a "table" is a
  * parquet directory loaded as a DataFrame; `views` registers every table
  * as a temp view so the SQL surface (`spark.sql("... FROM lineitem")`)
  * works identically to the reference's catalog-backed SQL.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoize per (session, path): a fresh `spark.read.parquet` re-lists
  // the directory and re-reads footers for schema inference on every
  // call, which across a ~100-query run is pure fixed overhead. The
  // testdata tables are immutable, and a cached DataFrame is just a
  // reusable logical plan. The outer map holds the session WEAKLY and
  // the per-session map behind a SoftReference — a DataFrame strongly
  // references its session, so a strongly-held value map would pin the
  // weak key forever (the classic WeakHashMap value→key pitfall); the
  // soft indirection keeps the cache warm in normal operation yet lets
  // a stopped, dereferenced session and its cached plans be collected.
  private val cache =
    new java.util.WeakHashMap[SparkSession,
      java.lang.ref.SoftReference[java.util.concurrent.ConcurrentHashMap[String, DataFrame]]]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      Option(cache.get(spark)).flatMap(r => Option(r.get())).getOrElse {
        val m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        cache.put(spark, new java.lang.ref.SoftReference(m))
        m
      }
    }
    perSession.computeIfAbsent(s"$sfDir/$name.parquet", p => spark.read.parquet(p))
  }

  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  /** Normalize an events frame's `ts` column to epoch-NANOS LongType.
    *
    * Testdata generations have encoded event time two ways: parquet
    * TIMESTAMP(NANOS) — which Spark's vectorized reader only accepts as
    * an epoch-nanos LongType under `nanosAsLong` — and plain
    * TIMESTAMP(MICROS), which arrives as a real TimestampType. All
    * downstream code (watermark arithmetic, record keys, the DuckDB
    * oracle's `epoch_us(ts)`) is written against the integer form, and
    * microseconds is the finest unit both engines agree on exactly, so
    * both encodings collapse to the same epoch-long representation
    * (micros × 1000 has zero sub-micro digits, matching DuckDB's
    * truncation of nanos to micros on read).
    */
  def normalizeTsNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType      => df
      case TimestampType => df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        // session TZ is pinned to UTC everywhere (builders set it), so a
        // naive timestamp's wall-clock IS its UTC epoch — the same
        // reading DuckDB gives the column
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalStateException(
        s"unexpected events.ts type $other (expected nanos-long or timestamp)")
    }
  }

  /** Raw events read with `ts` normalized to epoch-nanos LongType. */
  def eventsRaw(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTsNanos(spark.read.parquet(path))
  }

  /** Events with `ts_ns` (epoch nanos), `ts_us` (epoch micros) and a
    * microsecond-truncated TimestampType `ts` for time functions.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTsNanos(load(spark, sfDir, "events"))
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts_ns div 1000"))
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("ts_us")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register every table as a temp view (the engine's "catalog"). */
  def views(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
