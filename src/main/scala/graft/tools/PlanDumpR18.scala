package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (round-18 optimization evidence): dumps
  * `.explain("formatted")` of the engine-internal plans this round
  * changed, each in its BEFORE shape (reconstructed verbatim from the
  * pre-round code, see git history) and AFTER shape (the live
  * helpers), over the real sf corpus. Written to
  * `plans/r18/<name>_{before,after}.txt`.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.tools.PlanDumpR18"
  */
object PlanDumpR18 {
  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private def write(name: String, which: String, df: DataFrame): Unit = {
    val p = java.nio.file.Paths.get(s"plans/r18/${name}_$which.txt")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, fmt(df))
    println(s"wrote $p")
  }

  // ---- BEFORE shapes, verbatim from the r17 code ----------------------
  private val PqM = graft.ops.Similarity.PqM
  private val PqSubDim = graft.ops.Similarity.PqSubDim
  private val PqK = graft.ops.Similarity.PqK
  private val Dim = 64

  private def pqCodebookBefore(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < PqK)
      .select(col("vec_id").as("j"),
        explode(expr(s"sequence(0, ${PqM - 1})")).as("m"), col("embedding"))
      .select(col("m"), col("j"),
        expr(s"transform(slice(embedding, m * $PqSubDim + 1, $PqSubDim)," +
          " x -> CAST(x AS DOUBLE))").as("csub"))

  private def pqAssignBefore(e: DataFrame, cb: DataFrame): DataFrame = {
    val sub = e
      .select(col("vec_id"),
        explode(expr(s"sequence(0, ${PqM - 1})")).as("m"), col("embedding"))
      .select(col("vec_id"), col("m"),
        expr(s"transform(slice(embedding, m * $PqSubDim + 1, $PqSubDim)," +
          " x -> CAST(x AS DOUBLE))").as("vsub"))
    val dist = expr(
      s"""aggregate(sequence(1, $PqSubDim), CAST(0.0 AS DOUBLE),
         | (acc, d) -> acc + (element_at(vsub, d) - element_at(csub, d))
         |                 * (element_at(vsub, d) - element_at(csub, d)))""".stripMargin)
    val w = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("dist").asc, col("j").asc)
    sub.join(broadcast(cb), "m")
      .withColumn("dist", dist)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("j").as("code"), col("vsub"), col("csub"))
  }

  private def pqSearchCosBefore(rec: DataFrame, queries: DataFrame): DataFrame = {
    def fold(term: String) =
      s"aggregate(sequence(1, $Dim), CAST(0.0 AS DOUBLE), (acc, d) -> acc + $term)"
    val qcos =
      s"""round(${fold("element_at(rec, d) * CAST(element_at(qv, d) AS DOUBLE)")}
         | / (sqrt(${fold("element_at(rec, d) * element_at(rec, d)")})
         |  * sqrt(${fold("CAST(element_at(qv, d) AS DOUBLE) * CAST(element_at(qv, d) AS DOUBLE)")})), 4)""".stripMargin
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("qcos").desc, col("vec_id").asc)
    rec.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id", s"$qcos AS qcos")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.Tables.embeddings(spark, sf)

    // ---- 1. PQ encode: broadcast-join + window argmin -> literal-
    //         codebook map stage (affects sim_pq_codes/search/adc/
    //         trained, sim_ivfpq_fixed/search)
    write("pq_assign", "before", pqAssignBefore(e, pqCodebookBefore(e)))
    write("pq_assign", "after", graft.ops.Similarity.pqCodes(spark, sf))

    // ---- 2. PQ search cosine: interpreted 64-dim aggregate folds ->
    //         native dot_vec codegen expression (sim_pq_search and
    //         sim_pq_trained's shared search stage)
    val recBefore = pqAssignBefore(e, pqCodebookBefore(e))
      .select(col("vec_id"), col("m"), col("code"), col("csub"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("csub")))).as("parts"))
      .select(col("vec_id"), expr("flatten(transform(parts, p -> p.csub))").as("rec"))
    val queries = e.filter(col("vec_id") < graft.ops.Similarity.QuerySetSize)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    write("pq_search_cos", "before", pqSearchCosBefore(recBefore, queries))
    write("pq_search_cos", "after",
      graft.ops.Similarity.queries("sim_pq_search")(spark, sf))

    // ---- 3. covering-index heal delta: two sideDiffs (timeline) /
    //         mapping sideDiff + full re-assert (mor) -> ONE
    //         aggregation, primary consumed once. Real fixture: a
    //         timeline table + covering index, then one more commit so
    //         the heal has a discrepancy to find.
    locally {
      val scratch = java.nio.file.Files.createTempDirectory("plandump18")
      val src = graft.Tables.orders(spark, sf)
        .select(col("o_orderkey").as("k"), lit(1L).as("pc"),
          col("o_orderstatus").as("st"), col("o_totalprice").as("v"))
      val tPath = scratch.resolve("t").toString
      val iPath = scratch.resolve("i").toString
      graft.etl.Timeline.upsertInto(spark, tPath, src,
        keys = Seq("k"), precombine = "pc")
      graft.etl.SecondaryIndex.createTimelineCovering(spark, tPath, iPath,
        Seq("st"), keys = Seq("k"))
      // detach maintenance so the next commit leaves a gap for the heal
      graft.etl.Timeline.unbindSecondaryIndex(tPath)
      graft.etl.Timeline.upsertInto(spark, tPath,
        src.filter(col("k") % 10 === 3).withColumn("pc", lit(2L))
          .withColumn("st", lit("X")),
        keys = Seq("k"), precombine = "pc")

      val Live = "__live"
      val prim = graft.etl.Timeline.read(spark, tPath).localCheckpoint()
      val idxLive = graft.etl.BucketTable.read(spark, iPath)
        .filter(col(Live)).drop(Live, "__commit")
      val idxAligned = graft.etl.SchemaShim.unionByName(prim.limit(0), idxLive)
      val mapCols = graft.etl.BucketTable.props(iPath).keys.map(col)
      def sideDiffBefore(pre: DataFrame, post: DataFrame): DataFrame = {
        val side = "__side"
        val cols = pre.columns.toSeq
        pre.withColumn(side, lit(0))
          .unionByName(post.select(cols.map(col): _*).withColumn(side, lit(1)))
          .groupBy(cols.map(col): _*)
          .agg(min(side).as("__mn"), max(side).as("__mx"))
          .filter(col("__mn") === col("__mx"))
          .withColumn(Live, col("__mx") === 1)
          .drop("__mn", "__mx")
      }
      val healBefore = sideDiffBefore(idxLive.select(mapCols: _*),
          prim.select(mapCols: _*))
        .filter(!col(Live))
        .unionByName(sideDiffBefore(idxAligned, prim).filter(col(Live)),
          allowMissingColumns = true)
      write("covering_heal_delta", "before", healBefore)
      // AFTER: rebind and let the serve-time heal build its live delta —
      // dumped through the public lookup path is impractical (the heal
      // consumes it inside the maint lock), so reconstruct via the same
      // entry the heal now uses
      write("covering_heal_delta", "after",
        graft.etl.SecondaryIndex.healDeltaForDump(spark, "timeline",
          tPath, iPath))
      graft.etl.FsUtil.deleteRecursively(scratch)
    }

    // ---- 4. evidence for a DELIBERATE non-change: BloomTable's
    //         post-write indexRows pass over just-written files is
    //         already column-pruned to the key column (ReadSchema) —
    //         the "second full scan" the r17 verdict flagged is a
    //         key-column + file-metadata scan
    locally {
      val scratch = java.nio.file.Files.createTempDirectory("plandump18b")
      val src = graft.Tables.orders(spark, sf)
        .select(col("o_orderkey").as("k"), lit(1L).as("pc"),
          col("o_orderstatus").as("st"), col("o_totalprice").as("v"))
      val tPath = scratch.resolve("b").toString
      graft.etl.BloomTable.create(src, tPath, keys = Seq("k"),
        precombine = "pc")
      val files = new java.io.File(s"$tPath/c=1").listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString).toSeq
      write("bloom_index_rows_scan", "current",
        graft.etl.BloomTable.indexRowsForDump(
          spark.read.parquet(files: _*), tPath))
      graft.etl.FsUtil.deleteRecursively(scratch)
    }

    spark.stop()
  }
}
