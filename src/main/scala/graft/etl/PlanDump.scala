package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round-17 optimization evidence): dumps
  * `.explain("formatted")` of the engine-internal plans this round
  * changed — the index-reconcile delta, the keyed-commit cdc diff, and
  * the partitioned delta route's before-state probe — each in its
  * BEFORE shape (reconstructed verbatim from the pre-round code, see
  * git history) and AFTER shape (the live helpers), over one small
  * real table fixture. Written to `plans/r17/<name>_{before,after}.txt`.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.etl.PlanDump"
  */
object PlanDump {
  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private def write(name: String, which: String, df: DataFrame): Unit = {
    val p = java.nio.file.Paths.get(s"plans/r17/${name}_$which.txt")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, fmt(df))
    println(s"wrote $p")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = java.nio.file.Files.createTempDirectory("plandump")
    val src = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), lit(1L).as("pc"),
        col("o_orderstatus").as("st"), col("o_totalprice").as("v"))

    // one real bucket table + batch, the shared fixture
    val tPath = scratch.resolve("t").toString
    BucketTable.create(src.filter(col("k") % 10 < 8), tPath,
      keys = Seq("k"), precombine = "pc")
    val batch = src.filter(col("k") % 10 === 3)
      .withColumn("pc", lit(2L)).withColumn("st", lit("X"))
      .localCheckpoint()
    val pre = BucketTable.lookupMany(spark, tPath, batch)
      .select(col("st"), col("k")).localCheckpoint()
    val post = batch.select(col("st"), col("k")).localCheckpoint()

    // ---- 1. index-reconcile delta: two excepts -> one aggregation ---
    val Live = "__live"
    val beforeDelta = pre.except(post).withColumn(Live, lit(false))
      .unionByName(post.except(pre).withColumn(Live, lit(true)))
    write("reconcile_delta", "before", beforeDelta)
    write("reconcile_delta", "after", SecondaryIndex.sideDiff(pre, post))

    // ---- 2. keyed-commit cdc diff: O(region) -> O(batch keys) -------
    val existing = BucketTable.read(spark, tPath)
    val afterRegion = HudiLike.upsert(existing, batch.drop("st"),
      Seq("k"), "pc").localCheckpoint()
    write("cdc_upsert_diff", "before",
      CdcLog.diff(existing, afterRegion, Seq("k")))
    val bk = batch.select(col("k")).distinct()
    write("cdc_upsert_diff", "after",
      CdcLog.diff(existing.join(broadcast(bk), Seq("k"), "leftsemi"),
        afterRegion.join(broadcast(bk), Seq("k"), "leftsemi"), Seq("k")))

    // ---- 3. partitioned delta before-probe: full snapshot -> routed -
    val pPath = scratch.resolve("p").toString
    val withDay = src.withColumn("day", (col("k") % 3).cast("string"))
    PartitionedTable.create(withDay, pPath, keys = Seq("k"),
      precombine = "pc", partitionCols = Seq("day"))
    val pbatch = withDay.filter(col("k") % 30 === 3)
      .withColumn("pc", lit(2L)).localCheckpoint()
    val ident = Seq("day", "k")
    val keyset = pbatch.select(ident.map(col): _*).distinct().localCheckpoint()
    val snap = PartitionedTable.read(spark, pPath)
    val cond = ident.map(k => snap(k) <=> keyset(k)).reduce(_ && _)
    write("part_delta_before_probe", "before",
      snap.join(keyset, cond, "left_semi"))
    write("part_delta_before_probe", "after",
      PartitionedTable.lookupMany(spark, pPath, pbatch))

    graft.etl.FsUtil.deleteRecursively(scratch)
    spark.stop()
  }
}
