package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, when}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Filter, GlobalLimit, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** The PlanAudit dump turned into CI assertions: physical-plan
  * properties that decide 100 TB behavior fail the build when they
  * regress, instead of waiting for a human to re-read the dump.
  *
  * Asserted invariants:
  *   1. the incremental-extract watermark predicate reaches the parquet
  *      scan as a pushed filter (`DivComparisonPushdown`'s whole point);
  *   2. no relational/pipeline query plans a BroadcastNestedLoopJoin —
  *      the only sanctioned cartesians are the similarity baselines
  *      (tiny broadcast query sides), which are not in the checked set;
  *   3. no query carries an explicit `broadcast()` hint that pins ANY
  *      SF-scaling table (customer, orders, lineitem, supplier, part)
  *      as a build side without a reducing node (Filter / Aggregate /
  *      Limit) between the hint and the scan — the round-2 customer
  *      scale-killer, generalized. The static planner and AQE may
  *      legitimately broadcast these at test SF (their decisions are
  *      size-based and flip on their own at 100 TB); a HINT overrides
  *      size logic at every scale. Filter slivers (LARGE parts),
  *      aggregates, and top-k derivations shrink provably and may keep
  *      their hints.
  */
class PlanAssertSpec extends SparkSpec {

  /** Execute and return the FINAL adaptive plan (AQE re-plans at
    * runtime; the pre-execution plan would assert the wrong tree).
    */
  private def finalPlan(df: DataFrame): SparkPlan = {
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan
  }

  /** Collect the whole tree, descending through the adaptive wrappers
    * (AdaptiveSparkPlanExec / QueryStageExec) that hide subtrees from
    * the default `collect`.
    */
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(collectAll)
  }

  private def scansUnder(p: SparkPlan): Seq[FileSourceScanExec] =
    collectAll(p).collect { case f: FileSourceScanExec => f }

  /** Join-bearing queries with no legitimate cartesian: every TPC-H-ish
    * analytic join plus the pipeline extract/report paths.
    */
  private val checked = Seq(
    "q3_top_orders_segment", "q5_region_revenue", "q7_nation_pairs",
    "q10_returned_items", "q15_top_supplier", "q17_small_quantity",
    "q18_large_orders", "q_semi_join", "q_anti_join", "q_left_join_agg",
    "q_right_join", "q_full_outer", "q4_priority_exists",
    "q8_market_share", "q12_late_shipments", "q13_cust_distribution",
    "q21_waiting_suppliers", "q2_min_cost_supp", "q9_product_profit",
    "q16_supplier_count", "q20_promo_suppliers", "q14_promo_revenue",
    "q19_discounted", "q_brand_volume",
    // round-6 composites: the curation pipeline's contamination anti
    // join, the CMS counter join, and the ADC lut join must all stay
    // broadcast-equi (no BNLJ) and hint-clean
    "tx_curation_pipeline", "tx_heavy_hitters_cms", "sim_pq_adc",
    // segment-blocked fuzzy join: candidates must come from the
    // (seg, gram) equi-join, never a cartesian fallback
    "dd_fuzzy_prefix_ed",
    // LSH candidate generation (all-pairs and incremental-index): the
    // band joins must stay (band, bh) equi-joins and the signature
    // re-attach an id equi-join — a cartesian fallback here is the
    // n² the LSH construction exists to avoid
    "dd_minhash_lsh", "dd_incremental_lsh",
    // q22_global_sales and q11_important_parts are excluded: their
    // 1-row scalar-threshold crossJoin(broadcast) is a legitimate BNLJ
    // (the filter is an inequality, so Catalyst cannot rewrite it to an
    // equi-join the way it does q15's max-revenue filter)
    "p_incremental_extract", "p_status_report",
    // round-9 layout queries: the salted join must stay a (key, salt)
    // equi-join (a cartesian fallback would defeat the salting), and
    // the timeline reads join nothing exotic
    "q_salted_skew_join", "q_partition_prune", "q_dpp_join", "q_bucketed_join",
    "p_time_travel", "p_timeline_incremental",
    // value-partitioned table + secondary index: the pruned read is a
    // plain union of partition scans and the index lookup's key
    // re-attach must stay a broadcast semi EQUI-join — a cartesian
    // fallback would rescan the primary per index hit
    "p_part_prune", "p_sec_lookup")

  private lazy val plans: Map[String, SparkPlan] =
    checked.map(n => n -> finalPlan(SparkEntry.queries(n)(spark, sf001))).toMap

  test("incremental extract pushes the watermark predicate into the scan") {
    val scans = scansUnder(plans("p_incremental_extract"))
    val pushed = scans.flatMap(_.metadata.get("PushedFilters"))
    // the RANGE predicate itself must reach the scan — an inferred
    // IsNotNull(ts) alone (non-empty PushedFilters) would not prune row
    // groups by ingestion time, which is the property incremental
    // extracts live on
    assert(pushed.exists(_.contains("GreaterThanOrEqual(ts")),
      s"watermark range predicate missing from PushedFilters; got $pushed")
  }

  test("no BroadcastNestedLoopJoin in any relational/pipeline query") {
    for ((name, plan) <- plans) {
      val bnl = collectAll(plan).collect { case b: BroadcastNestedLoopJoinExec => b }
      assert(bnl.isEmpty, s"$name plans a BroadcastNestedLoopJoin:\n$plan")
    }
  }

  test("partition-pruned read reaches the scan as a PartitionFilter") {
    // the whole point of the hive layout: the event_type predicate must
    // prune DIRECTORIES (PartitionFilters), not open footers and filter
    // (PushedFilters) — at 100 TB that's the difference between reading
    // one partition and listing all of them
    val scans = scansUnder(plans("q_partition_prune"))
    assert(scans.exists(s =>
      s.partitionFilters.exists(_.toString.contains("event_type"))),
      s"event_type missing from PartitionFilters:\n${plans("q_partition_prune")}")
  }

  test("schema-on-read rename keeps predicate pushdown to the scan") {
    // alignToDeclared wraps every layout read in rename/null-add
    // projections; Catalyst must still push a predicate on the LOGICAL
    // name through them onto the PHYSICAL parquet column — otherwise
    // every renamed-column filter becomes a post-scan filter at 100 TB
    import graft.etl.{BucketTable, Catalog, SqlDdl}
    val p = java.nio.file.Files.createTempDirectory("planren").toString + "/t"
    import spark.implicits._
    BucketTable.create(
      (1 to 64).map(i => (i.toLong, 1L, i.toDouble)).toDF("k", "pc", "v"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "plan_ren", "bucket", p)
    SqlDdl.exec(spark, "ALTER TABLE plan_ren RENAME COLUMN v TO amount")
    val df = Catalog.readTable(spark, "plan_ren").filter(col("amount") > 40.0)
    assert(df.count() == 24)
    val pushed = scansUnder(finalPlan(df))
      .flatMap(_.metadata.get("PushedFilters"))
    assert(pushed.exists(_.contains("GreaterThan(v,")),
      s"renamed-column predicate missing from PushedFilters; got $pushed")
  }

  test("widened-column predicate still reaches PushedFilters at the file's type") {
    // ALTER COLUMN TYPE leaves files at their written width and
    // alignToDeclared casts up — a filter on the wide declared type
    // becomes cast(n as bigint) > lit over the narrow scan, and the
    // optimizer's UnwrapCastInBinaryComparison must strip the cast so
    // the comparison pushes down to the INT parquet column; a post-scan
    // filter here means every widened-column predicate reads 100 TB
    import graft.etl.{BucketTable, Catalog, SqlDdl}
    val p = java.nio.file.Files.createTempDirectory("planwid").toString + "/t"
    import spark.implicits._
    BucketTable.create(
      (1 to 64).map(i => (i.toLong, 1L, i)).toDF("k", "pc", "n"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "plan_widen", "bucket", p)
    SqlDdl.exec(spark, "ALTER TABLE plan_widen ALTER COLUMN n TYPE BIGINT")
    val df = Catalog.readTable(spark, "plan_widen")
      .filter(col("n") > 40L)
    assert(df.count() == 24)
    val pushed = scansUnder(finalPlan(df))
      .flatMap(_.metadata.get("PushedFilters"))
    assert(pushed.exists(_.contains("GreaterThan(n,")),
      s"widened-column predicate missing from PushedFilters; got $pushed")
  }

  test("star join prunes fact partitions with a runtime DPP filter") {
    // the dim filter is on a DERIVED quarter column, so only dynamic
    // partition pruning can turn it into a partition predicate: the
    // fact scan must carry a dynamicpruning expression in its
    // PartitionFilters, and after execution the scan must have read
    // three month directories, not all of them — at 100 TB that is the
    // difference between one quarter and seven years of fact data
    val scans = scansUnder(plans("q_dpp_join"))
    val fact = scans.filter(_.partitionFilters.nonEmpty)
    assert(fact.exists(_.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning"))),
      s"no dynamicpruning PartitionFilter on the fact scan:\n${plans("q_dpp_join")}")
    val pruned = fact.find(_.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning"))).get
    val readDirs = pruned.metrics.get("numPartitions").map(_.value)
    readDirs.foreach(n => assert(n <= 3,
      s"DPP read $n partitions; expected <= 3 (one quarter)"))
  }

  test("shuffle star join is eligible for Spark's runtime bloom filter") {
    // at 100 TB the fact⋈dim equi-join plans as a shuffle join, and
    // Spark 4's InjectRuntimeFilter (on by default) builds a bloom
    // filter from the dim's selective side and applies it map-side on
    // the fact BEFORE the shuffle — the row-level counterpart of DPP
    // for non-partition join keys. The size thresholds that gate it
    // (10 GB application side) never trip at test SF, so this test
    // recreates the at-scale planning regime explicitly (no broadcast,
    // zero application-side threshold) and pins that our canonical
    // star-join shape actually receives the filter: `might_contain`
    // over the fact's join key in the final plan.
    val overrides = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = overrides.map { case (k, _) => k -> spark.conf.get(k) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.Tables.lineitem(spark, sf001)
        .select(col("l_partkey"), col("l_extendedprice"))
      val dim = graft.Tables.part(spark, sf001)
        .filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val agg = li.join(dim, col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n"))
      val plan = finalPlan(agg).toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected on the fact side:\n$plan")
      assert(agg.collect().head.getLong(0) > 0, "join produced no rows")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("AQE splits a skewed shuffle-join partition at the at-scale thresholds") {
    // the first line of defense q_salted_skew_join documents: AQE's
    // skew-join split. Its byte thresholds never trip at test SF, so
    // recreate the at-scale regime (no broadcast, tiny advisory/skew
    // thresholds) over a fact with one hot key and pin that the final
    // plan's sort-merge join actually carries skew=true — the runtime
    // re-plan that keeps one 30%-of-the-table key from serializing one
    // reducer at 100 TB.
    val overrides = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = overrides.map { case (k, _) => k -> spark.conf.get(k) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~80% of the fact lands on key 0 — one pathological hot key.
      // The repartition matters: AQE splits a skewed REDUCE partition
      // into consecutive mapper-range chunks, so a single-mapper input
      // (one parquet file at test SF) has nothing to split — exactly
      // why this never trips on the unsplit testdata but does at scale,
      // where a fact scan always has thousands of mappers.
      val hot = graft.Tables.lineitem(spark, sf001)
        .select(when(col("l_partkey") % 5 === 0, col("l_partkey") % 17)
          .otherwise(lit(0L)).as("k"), col("l_extendedprice"))
        .repartition(16)
      val dim = spark.range(0, 17).select(col("id").as("k"),
        (col("id") * 10).as("w"))
      val agg = hot.join(dim, "k")
        .agg(count(col("l_extendedprice") + col("w")).as("n"))
      val plan = finalPlan(agg).toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("bucketed-join query reads both sides through the bucket layout") {
    val plan = plans("q_bucketed_join").toString
    assert(plan.contains("Bucketed: true"),
      s"bucketed join must scan buckets:\n$plan")
  }

  test("mixture resampling joins thresholds by broadcast, never shuffle") {
    // the per-source threshold relation is ~|sources| rows; if it ever
    // planned as a sort-merge join the whole corpus would shuffle on
    // `source` (low-cardinality = catastrophic skew at 100 TB)
    val plan = finalPlan(SparkEntry.queries("samp_mixture")(spark, sf001))
    val smj = collectAll(plan).collect {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smj.isEmpty, s"samp_mixture plans a sort-merge join:\n$plan")
  }

  test("filtered ANN pushes the label predicate into the candidate scan") {
    // pre-filtering only pays if the predicate reaches the parquet
    // scan: at 100 TB the difference between pruning row groups and
    // filtering decoded vectors is the whole point of the operator
    // (FilterPredSql is an IN list precisely because In pushes)
    val plan = finalPlan(SparkEntry.queries("sim_ivf_filtered")(spark, sf001))
    val pushed = scansUnder(plan).flatMap(_.metadata.get("PushedFilters"))
    assert(pushed.exists(_.contains("In(label")),
      s"label IN filter missing from PushedFilters; got $pushed")
  }

  test("temperature mixing joins thresholds by broadcast, never shuffle") {
    // same contract as samp_mixture: |langs| threshold rows must
    // broadcast — a sort-merge join would shuffle the corpus on a
    // 5-value key
    val plan = finalPlan(SparkEntry.queries("samp_temperature")(spark, sf001))
    val smj = collectAll(plan).collect {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smj.isEmpty, s"samp_temperature plans a sort-merge join:\n$plan")
  }

  test("keyword lookup reads only the queried terms' buckets") {
    // the inverted index exists to make a keyword query a point read:
    // each term's lookup must scan a strict subset of the index files
    val path = graft.ops.Retrieval.postingsIndexPathForTest(spark, sf001)
    val all = graft.etl.BucketTable.read(spark, path)
      .inputFiles.toSet
    val lookedUp = graft.etl.BucketTable.lookup(spark, path,
      Seq(graft.ops.Retrieval.QueryTerms.head)).inputFiles.toSet
    assert(lookedUp.nonEmpty && lookedUp.size < all.size,
      s"lookup reads ${lookedUp.size} of ${all.size} files — no pruning")
  }

  test("rank-filtered windows keep the map-side WindowGroupLimit prune") {
    // top-k-per-group via `rank()/row_number() <= k` is only 100 TB-safe
    // because InferWindowGroupLimit plants a Partial WindowGroupLimit
    // BELOW the exchange: each map task forwards ≤ k rows per group, so
    // a low-cardinality partition key (q_window_rank's 5 priorities)
    // never funnels the full table into 5 reduce tasks. If a refactor
    // breaks the rank-predicate shape Catalyst recognizes, the prune
    // silently vanishes and the query reverts to the funnel — fail here.
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    // p_mor_snapshot: the MOR merge window must prune map-side too —
    // at 100 TB the base∪logs union is the full table and the merge
    // shuffle is the read cost; without the Partial prune every log
    // shadow row crosses the exchange
    for (name <- Seq("q_window_rank", "q2_min_cost_supp", "sim_knn_per_query",
        "p_mor_snapshot")) {
      val plan = finalPlan(SparkEntry.queries(name)(spark, sf001))
      val partialPrune = collectAll(plan).exists {
        case w: WindowGroupLimitExec => w.mode == org.apache.spark.sql.execution.window.Partial
        case _ => false
      }
      assert(partialPrune,
        s"$name lost its pre-shuffle WindowGroupLimit prune:\n$plan")
    }
  }

  /** Tables whose row count grows with SF — a pinned broadcast of any
    * of them is a deferred OOM. region/nation are fixed-cardinality
    * (5/25 rows at every SF) and exempt.
    */
  private val sfScalingTables =
    Seq("customer", "orders", "lineitem", "supplier", "part")

  test("no broadcast hint pins an unreduced SF-scaling table as a build side") {
    def sfScansUnder(p: LogicalPlan): Seq[String] = p.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val path = fs.location.rootPaths.mkString(",")
          sfScalingTables.filter(t => path.contains(s"$t.parquet"))
        case _ => Nil
      }
    }.flatten
    // does the path from `node` down to an SF-scaling scan pass through
    // a reducing node? Checked PER PATH, not per subtree: a filtered
    // region joined beside an unreduced customer must not let the
    // customer scan borrow region's Filter as its alibi
    def reducedOnEveryScanPath(node: LogicalPlan, seenReducing: Boolean): Seq[String] = {
      val reducingHere = node match {
        case _: Filter | _: Aggregate | _: GlobalLimit => true
        case _ => false
      }
      node match {
        case lr: LogicalRelation if !seenReducing && !reducingHere =>
          lr.relation match {
            case fs: HadoopFsRelation =>
              val path = fs.location.rootPaths.mkString(",")
              sfScalingTables.filter(t => path.contains(s"$t.parquet"))
            case _ => Nil
          }
        case _ =>
          node.children.flatMap(
            reducedOnEveryScanPath(_, seenReducing || reducingHere))
      }
    }
    for (name <- checked) {
      val analyzed = SparkEntry.queries(name)(spark, sf001).queryExecution.analyzed
      val hints = analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
      }
      for (h <- hints) {
        // the analyzed plan carries only USER-written Filters (Catalyst
        // adds IsNotNull guards later, in optimization), so a reducing
        // node on the path is a deliberate sliver/aggregate/top-k
        val unreduced = reducedOnEveryScanPath(h.child, seenReducing = false)
        assert(unreduced.isEmpty,
          s"$name broadcast-hints ${unreduced.mkString(",")} with no reducing " +
            s"node on the hint-to-scan path — a pinned full-table broadcast:\n${h.child}")
      }
    }
  }

  test("ivfpq: the only cartesians are the centroid-broadcast stages; ADC joins are equi") {
    // two legitimate BNLJs: the n x K assignment pass and the Q x K
    // probe stage — each crosses against the BROADCAST centroid table
    // (K rows, constant-bounded), so both are linear in their big side.
    // The code and LUT joins must plan as equi joins or the ADC stage
    // degrades to scoring every (candidate, lut-row) combination
    val plan = finalPlan(SparkEntry.queries("sim_ivfpq_fixed")(spark, sf001))
    val all = collectAll(plan)
    val bnl = all.collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnl.size <= 2, s"sim_ivfpq_fixed plans ${bnl.size} BNLJs:\n$plan")
    val bhj = all.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty,
      s"ADC lut join must broadcast-equi, none found:\n$plan")
  }
}
