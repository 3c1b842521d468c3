package graft.etl

import graft.SparkSpec
import java.nio.file.Files

class CatalogSpec extends SparkSpec {

  test("DDL creates pipeline tables idempotently with upsert metadata") {
    val base = Files.createTempDirectory("catalog").toString
    Catalog.ensurePipelineTables(spark, base)
    Catalog.ensurePipelineTables(spark, base) // IF NOT EXISTS — no error

    val tables = spark.sql("SHOW TABLES IN pipeline_layer")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(tables == Set("target_table", "pipeline_log"))

    val (keys, pc) = Catalog.upsertConfig(spark, "pipeline_layer.pipeline_log")
    assert(keys == Seq("pipeline_name", "created_at"), "composite key split")
    assert(pc == "created_at")

    val (tKeys, tPc) = Catalog.upsertConfig(spark, "pipeline_layer.target_table")
    assert(tKeys == Seq("record_id") && tPc == "load_timestamp")

    // SQL write + read through the catalog
    spark.sql(
      """INSERT INTO pipeline_layer.pipeline_log VALUES
        |('p1', NULL, 1000, 'SUCCESS', 10, 1.5, NULL, 1001),
        |('p1', 1000, 2000, 'FAILED', 0, 0.1, 'boom', 2001)""".stripMargin)
    val n = spark.table("pipeline_layer.pipeline_log").count()
    assert(n == 2)
    val wm = spark.sql(
      """SELECT max(current_run_timestamp) FROM pipeline_layer.pipeline_log
        |WHERE pipeline_name = 'p1' AND status = 'SUCCESS'""".stripMargin)
      .head().getLong(0)
    assert(wm == 1000L)
    spark.sql("DROP DATABASE pipeline_layer CASCADE")
  }
}
