package graft.etl

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins `Tables.normalizeTsNanos` and both ingest front doors against
  * every physical encoding `events.ts` has shipped with (nanos-as-long,
  * TIMESTAMP, TIMESTAMP_NTZ), on synthetic parquet written in-test —
  * including the NTZ branch no driver fixture currently exercises. The
  * batch/stream key-agreement cases are the drift guard for
  * `Pipeline.keyedProjection` being the single shared definition.
  */
class TsEncodingSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-15T00:00:00Z, in epoch micros; events 1s apart
  private val BaseUs = 1705276800000000L
  private val N = 60

  private lazy val logical: DataFrame =
    (1 to N).map { i =>
      (i.toLong, BaseUs + i * 1000000L, (i % 7).toLong,
        if (i % 2 == 0) "click" else "view", i * 1.5, s"""{"i":$i}""")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")

  private def project(df: DataFrame): DataFrame =
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")

  /** name → (path, expected physical type after read-back). */
  private lazy val encoded: Seq[(String, String)] = {
    val base = Files.createTempDirectory("tsenc").toString
    val variants = Seq(
      "nanos_long" -> project(logical.withColumn("ts", $"ts_us" * 1000L)),
      "timestamp" -> project(logical.withColumn("ts", timestamp_micros($"ts_us"))),
      "timestamp_ntz" -> project(logical.withColumn("ts",
        timestamp_micros($"ts_us").cast(TimestampNTZType))))
    variants.map { case (name, df) =>
      val p = s"$base/$name"
      df.coalesce(1).write.parquet(p)
      name -> p
    }
  }

  test("the synthetic fixtures really carry three distinct physical ts types") {
    val types = encoded.map { case (name, p) =>
      name -> spark.read.parquet(p).schema("ts").dataType
    }.toMap
    assert(types("nanos_long") == LongType)
    assert(types("timestamp") == TimestampType)
    assert(types("timestamp_ntz") == TimestampNTZType,
      "NTZ must survive the parquet round-trip (inferTimestampNTZ), or the " +
        "branch under test is not actually exercised")
  }

  test("normalizeTsNanos collapses all three encodings to identical epoch nanos") {
    val expected = (1 to N).map(i => i.toLong -> (BaseUs + i * 1000000L) * 1000L).toMap
    for ((name, p) <- encoded) {
      val got = Tables.normalizeTsNanos(spark.read.parquet(p))
        .select("event_id", "ts").as[(Long, Long)].collect().toMap
      assert(got == expected, s"encoding $name")
    }
  }

  test("full batch extract mints identical record keys under every encoding") {
    val keySets = encoded.map { case (name, p) =>
      name -> Pipeline.extract(spark, p, None)
        .select("record_id").as[String].collect().toSet
    }
    assert(keySets.forall(_._2.size == N))
    assert(keySets.map(_._2).distinct.size == 1,
      s"encodings disagree: ${keySets.map { case (n, s) => s"$n=${s.size}" }}")
  }

  test("incremental extract keeps the same rows under every encoding") {
    // watermark 30s past base: exactly events 31..60 have ts_ms > wm
    val wmMs = BaseUs / 1000L + 30000L
    for ((name, p) <- encoded) {
      val ids = Pipeline.extract(spark, p, Some(wmMs))
        .select("event_id").as[Long].collect().toSet
      assert(ids == (31 to N).map(_.toLong).toSet, s"encoding $name")
    }
  }

  test("batch and stream extracts agree on record keys under every encoding") {
    for ((name, p) <- encoded) {
      val scratch = Files.createTempDirectory(s"tsenc-$name").toString
      graft.streaming.StreamingPipeline.runIngestBucketed(spark, p,
        s"$scratch/target", s"$scratch/ckpt")
      val streamKeys = BucketTable.read(spark, s"$scratch/target")
        .select("record_id").as[String].collect().toSet
      val batchKeys = Pipeline.extract(spark, p, None)
        .select("record_id").as[String].collect().toSet
      assert(streamKeys == batchKeys, s"encoding $name")
    }
  }
}
