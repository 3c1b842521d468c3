package graft.tools

import graft.ops._
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the physical-plan properties that matter at scale —
  * pushed filters, pruned read schemas, broadcast vs shuffle joins,
  * whole-stage codegen coverage.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      // execute THIS df's plan (count() builds a separate QueryExecution)
      // so the adaptive plan finalizes and codegen span ids are visible
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq
      val schemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).take(4).toSeq
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin",
        "ShuffledHashJoin").map(j => j -> j.r.findAllIn(plan).length)
        .filter(_._2 > 0)
      val codegen = "\\*\\(\\d+\\)".r.findAllIn(plan).toSeq
        .map(_.drop(2).dropRight(1).toInt).distinct.length
      println(s"=== $name")
      pushed.foreach(p => println(s"  $p"))
      schemas.foreach(s => println(s"  $s"))
      println(s"  joins: ${joins.mkString(", ")}  codegenSpans: $codegen")
    }
    audit("q1_pricing_summary", Relational.pricingSummary(spark, sf))
    audit("q3_top_orders", Relational.topOrdersBySegment(spark, sf))
    audit("q5_region_revenue", Relational.regionRevenue(spark, sf))
    audit("q_semi_join", Relational.customersWithOrders(spark, sf))
    audit("p_incremental_extract", PipelineQueries.incrementalExtract(spark, sf))
    audit("dd_ngram_jaccard", Dedup.ngramJaccardPairs(spark, sf))
    audit("sim_cosine_scores", Similarity.cosineScores(spark, sf))
    audit("mm_media_meta", Multimodal.mediaMeta(spark, sf))
    audit("q6_revenue", Relational.q6Revenue(spark, sf))
    audit("q4_priority_exists", Relational.q4PriorityExists(spark, sf))
    audit("q14_promo_revenue", Relational.q14PromoRevenue(spark, sf))
    audit("q15_top_supplier", Relational.q15TopSupplier(spark, sf))
    audit("q17_small_quantity", Relational.q17SmallQuantity(spark, sf))
    audit("q18_large_orders", Relational.q18LargeOrders(spark, sf))
    audit("q19_discounted", Relational.q19Discounted(spark, sf))
    audit("q_kmv_distinct", Relational.kmvDistinct(spark, sf))
    audit("sim_sq8_search", Similarity.sq8Search(spark, sf))
    audit("sim_ann_multiprobe", Similarity.annMultiProbe(spark, sf))
    audit("dd_embed_neardup_lsh", Similarity.embedNearDupLsh(spark, sf))
    audit("q7_nation_pairs", Relational.nationPairVolume(spark, sf))
    audit("q10_returned_items", Relational.returnedItemRevenue(spark, sf))
    audit("q8_market_share", Relational.q8MarketShare(spark, sf))
    audit("q12_late_shipments", Relational.q12LateShipments(spark, sf))
    audit("q13_cust_distribution", Relational.q13CustomerDistribution(spark, sf))
    audit("q21_waiting_suppliers", Relational.q21WaitingSuppliers(spark, sf))
    audit("q22_global_sales", Relational.q22GlobalSales(spark, sf))
    audit("tx_bigram_nll", TextOps.bigramNll(spark, sf))
    audit("samp_token_budget", Sampling.tokenBudgetMix(spark, sf))
    spark.stop()
  }
}
