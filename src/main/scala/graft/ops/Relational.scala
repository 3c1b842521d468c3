package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-ish star schema (SURVEY.md §7
  * step 4). The reference's own relational surface is thin (single-table
  * scans with predicates — pipeline_architecture.py:207-227 — and its
  * README's declared-but-unimplemented "optimal joins", README.md:324);
  * this module provides the full operator set a user of such a pipeline
  * queries with, all on built-in Catalyst operators.
  *
  * Determinism rules for the DuckDB oracle (SURVEY.md §5.1): money
  * aggregates accumulate as exact integers (`exactMoneySum`/`Avg` below
  * — see their docs for the rounding-boundary hazard that plain
  * `round(sum(double))` carries); other double aggregates are rounded
  * where the true value's decimal lattice makes that stable; every
  * computed column is aliased identically on both sides; ties in top-k
  * / window ranks are broken by a unique key.
  *
  * Scale notes: only FIXED-cardinality dimensions (`region`, `nation` —
  * 5 and 25 rows at every SF) and provably-reduced derivations (a
  * selective filter sliver, an aggregate, a top-k) take explicit
  * `broadcast()` hints. Every SF-scaling table (`customer`, `orders`,
  * `lineitem`, `supplier`, `part`) joins UNHINTED: a hint overrides
  * size-based planning at every scale, and what fits at sf0.1 is a
  * 100×-scale OOM (supplier is 10k·SF rows, part 200k·SF). AQE promotes
  * those sides to broadcast only while they actually measure under
  * `spark.sql.autoBroadcastJoinThreshold` — the decision flips on its
  * own as data grows, which is exactly what a hint prevents.
  * `PlanAssertSpec` enforces this: no broadcast hint whose subtree
  * scans an SF-scaling table without a reducing node above the scan.
  * Aggregations are plain `groupBy` → partial (map-side) + final hash
  * aggregation.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** Exact money-sum: TPC-H prices/discounts have ≤`scale` true decimal
    * digits, so each row's product is converted to an exact integer (at
    * 10^scale) — per-row rounding error ~1e-11 against a 0.5 margin —
    * and summed as integers, which is bit-exact in every engine. A
    * plain `round(sum(double), 2)` is NOT engine-stable here: the true
    * sum can land exactly on a .005 boundary (≈1% of groups) and the
    * engines' different accumulation orders then round it differently.
    * (At 10^12-row scale the integer sum needs DECIMAL(38) instead of
    * BIGINT; the fixture scales fit comfortably.)
    */
  private def exactMoneySum(e: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    round(sum(round(e * f, 0).cast("long")) / f, scale)
  }

  private def exactMoneySumSql(e: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"round(sum(CAST(round(($e) * $f, 0) AS BIGINT)) / $f.0, $scale)"
  }

  private val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private val discPriceSql = "l_extendedprice * (1 - l_discount)"
  private val charge = discPrice * (lit(1) + col("l_tax"))
  private val chargeSql = s"$discPriceSql * (1 + l_tax)"

  /** Exact money-average (same rationale as `exactMoneySum`, for avg
    * columns of ≤`scale`-decimal inputs): integer numerator, one shared
    * double division, then round — stable even if an engine's parallel
    * aggregation order varies between runs.
    */
  private def exactMoneyAvg(e: Column, scale: Int, outScale: Int): Column = {
    val f = math.pow(10, scale)
    round(sum(round(e * f, 0).cast("long")) / (lit(f) * count(lit(1))), outScale)
  }

  private def exactMoneyAvgSql(e: String, scale: Int, outScale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"round(sum(CAST(round(($e) * $f, 0) AS BIGINT)) / ($f.0 * count(*)), $outScale)"
  }

  /** TPC-H Q1-style pricing summary: scan-filter-aggregate; Catalyst
    * pushes the shipdate predicate and 7-column pruning into the parquet
    * scan, AQE coalesces the tiny post-shuffle partitions.
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        exactMoneySum(discPrice, 4).as("sum_disc_price"),
        exactMoneySum(charge, 6).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"), // integer-valued: exact in any order
        exactMoneyAvg(col("l_extendedprice"), 2, 4).as("avg_price"),
        exactMoneyAvg(col("l_discount"), 2, 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style: two fact joins + a customer join AQE may promote
    * to broadcast when the filtered side fits, top-10 by revenue with
    * key tie-break. No hint on customer — it scales with SF.
    */
  def topOrdersBySegment(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(exactMoneySum(discPrice, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-style: revenue per nation for one region; the tiny dims
    * (nation, region) broadcast onto customer, the two facts shuffle
    * once on their join keys, and the customer edge shuffles too —
    * customer scales with SF, so no broadcast hint (AQE promotes it
    * only when the region-filtered side measures small enough).
    */
  def regionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    val dims = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(dims, o("o_custkey") === dims("c_custkey"))
      .groupBy(col("n_name"))
      .agg(exactMoneySum(discPrice, 4).as("revenue"))
  }

  /** TPC-H Q7-style: revenue matrix between supplier nation and
    * customer nation — the same dimension joined twice under different
    * roles (both nation legs broadcast; supplier and customer join
    * unhinted — both scale with SF, AQE promotes them only while they
    * measure small).
    */
  def nationPairVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val n1 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
    val s = Tables.supplier(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), s("s_nationkey") === n1("snk"))
      .join(broadcast(n2), c("c_nationkey") === n2("cnk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"))
      .agg(exactMoneySum(discPrice, 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q10-style: revenue lost to returned items per customer,
    * top 20.
    */
  def returnedItemRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R")
    // Aggregate to per-customer revenue and take the top 20 BEFORE
    // touching the customer table, then attach attributes by
    // broadcasting the 20-row side INTO customer. Joining the raw fact
    // rows to customer first (the naive shape) only works when customer
    // broadcasts — at 100 TB customer is fact-sized and that plan dies;
    // this one's only broadcast is 20 rows. Same result under the
    // schema's referential integrity (every o_custkey resolves), which
    // the DuckDB hash check pins at both test SFs.
    val topKeys = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(exactMoneySum(discPrice, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey").asc)
      .limit(20)
    broadcast(topKeys).join(c, topKeys("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
  }

  /** Relational division ("for all" membership): customers with at
    * least one order in EVERY calendar year the table spans — distinct
    * year count per customer equal to the global year count.
    */
  def everyYearCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    // the year-universe count joins in as a broadcast scalar, keeping
    // the whole query one lazy plan (no driver-side action)
    val universe = o.agg(countDistinct(year(col("o_orderdate"))).as("total_years"))
    o.groupBy(col("o_custkey"))
      .agg(countDistinct(year(col("o_orderdate"))).as("n_years"),
        count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(universe))
      .filter(col("n_years") === col("total_years"))
      .select(col("o_custkey"), col("n_years"), col("n_orders"))
  }

  /** Fact ⋈ dim aggregation by brand — part scales with SF, so no
    * broadcast hint (AQE promotes it while it measures small).
    */
  def brandVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        exactMoneyAvg(col("p_retailprice"), 2, 4).as("avg_price"))
  }

  /** EXISTS as a left-semi join (no row duplication, build side only
    * emits keys).
    */
  def customersWithOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** NOT EXISTS as a left-anti join — "new keys only", the membership
    * test behind dedup-against-existing.
    */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  /** LEFT OUTER against a pre-aggregated build side (null-producing). */
  def customerOrderCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_spent"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select(col("c_custkey"), col("n_orders"), col("total_spent"))
  }

  /** Top-3 orders per priority class: rank window, deterministic via key
    * tie-break.
    */
  def rankByPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
  }

  /** Per-customer order history with lag (previous order's price). */
  def orderPriceLag(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"))
  }

  /** Running total per customer: rows-frame cumulative sum. */
  def runningSpend(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
  }

  /** Set ops: customers that never ordered, via EXCEPT (distinct). */
  def exceptKeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select(col("c_custkey").as("k"))
      .except(Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey").as("k")))

  /** Set ops: customer keys present in orders, via INTERSECT. */
  def intersectKeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select(col("c_custkey").as("k"))
      .intersect(Tables.orders(spark, sfDir).select(col("o_custkey").as("k")))

  /** ROLLUP over (returnflag, linestatus): hierarchical subtotals. */
  def rollupQuantities(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))

  /** Exact distinct cardinalities per group (expands to two shuffles
    * under Catalyst's distinct-agg rewrite).
    */
  def distinctCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  /** Global top-k: TakeOrderedAndProject, no full sort at scale. */
  def topOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)

  /** GROUP BY + HAVING (post-aggregation filter). */
  def bigCustomers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .filter(col("n") >= 3)

  /** CASE bucketing + aggregation. */
  def priceBuckets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("bucket",
        when(col("o_totalprice") < 100000, "small")
          .when(col("o_totalprice") < 300000, "medium")
          .otherwise("large"))
      .groupBy(col("bucket"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))

  /** Scalar string functions (projection-only; stays in one codegen
    * stage over the scan).
    */
  def customerNameOps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 8).as("prefix"),
        concat_ws("-", col("c_mktsegment"), col("c_nationkey").cast("string")).as("tag"),
        length(col("c_name")).as("len"))

  /** Calendar aggregation: orders per year/month. */
  def ordersByMonth(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))

  /** Correlated-subquery shape: customers above their nation's average
    * balance — decorrelated as avg-aggregate + broadcast join.
    */
  def aboveNationAverage(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    // exact-integer numerator: the avg both feeds the output AND gates
    // the filter, so it must be bit-identical across engines
    val nat = c.groupBy(col("c_nationkey").as("nk"))
      .agg((sum(round(col("c_acctbal") * 100, 0).cast("long")) /
        (lit(100.0) * count(lit(1)))).as("nation_avg"))
    c.join(broadcast(nat), c("c_nationkey") === nat("nk"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_acctbal"), round(col("nation_avg"), 4).as("nation_avg"))
  }

  /** Tumbling-window aggregation in batch form: events per (hour, type).
    * The streaming twin lives in graft.streaming (windowed agg +
    * watermark); here the hour bucket is a string for exact oracle
    * parity across engines.
    */
  def eventsHourly(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))

  /** CUBE over (returnflag, linestatus): all grouping-set combinations. */
  def cubeQuantities(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))

  /** PIVOT: quantity by linestatus × returnflag (fixed pivot values, so
    * the schema is static and the oracle expresses it as CASE sums).
    */
  def pivotQuantities(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum(col("l_quantity")), 2))

  /** UNION ALL with a provenance tag (bag semantics, unlike EXCEPT /
    * INTERSECT above).
    */
  def unionAllKeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("k"), lit("order").as("src"))
      .unionByName(Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("k"), lit("customer").as("src")))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("src")).as("n_srcs"))

  /** UNION (distinct) — dedup across the combined sets, vs the
    * bag-semantics `unionAllKeys`.
    */
  def unionDistinctKeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(col("o_custkey").as("k"))
      .union(Tables.customer(spark, sfDir).select(col("c_custkey").as("k")))
      .distinct()

  /** INTERSECT ALL / EXCEPT ALL: multiset semantics — each key keeps
    * min(countL, countR) / max(countL − countR, 0) copies, which the
    * grouped output makes visible (and hash-checkable).
    */
  def intersectAllStatuses(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      .intersectAll(Tables.orders(spark, sfDir)
        .filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k")))
      .groupBy(col("k")).agg(count(lit(1)).as("n_copies"))

  def exceptAllStatuses(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      .exceptAll(Tables.orders(spark, sfDir)
        .filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k")))
      .groupBy(col("k")).agg(count(lit(1)).as("n_copies"))

  /** RIGHT OUTER join: every customer kept, order fields null for
    * order-less customers (the mirror of `customerOrderCounts`' left
    * join, exercising the remaining outer-join type).
    */
  def rightJoinOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey"), col("o_orderkey"))
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"), "right")
      .groupBy(col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_big_orders"),
        count(lit(1)).as("n_rows"))

  /** Ordered string aggregation: per return flag, the sorted distinct
    * line statuses as one CSV cell — `collect_list` + `array_sort`
    * keeps it deterministic (↔ DuckDB `string_agg(... ORDER BY)`).
    */
  def stringAggStatuses(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(expr("concat_ws(',', array_sort(collect_list(l_linestatus)))").as("statuses"))

  /** FULL OUTER join with nulls possible on both sides. */
  def fullOuterActivity(spark: SparkSession, sfDir: String): DataFrame = {
    val building = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_acctbal"))
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_recent"))
    building.join(recent, building("c_custkey") === recent("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("k"),
        col("c_acctbal"), col("n_recent"))
  }

  /** HLL cardinality sketch (approx_count_distinct) next to the exact
    * count — no SQL oracle (sketch estimates differ across engines);
    * `RelationalSpec` pins the ≤5% error bound instead.
    */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))

  // ---- classic TPC-H adaptations (schemas here are trimmed: no
  // commitdate/shipmode/container/partsupp, so q4 uses an equivalent
  // EXISTS shape and q12/q2/q9 have no faithful analog) ----------------

  /** TPC-H Q6: one tight scan-and-sum — the predicate (shipdate year,
    * discount band, quantity cap) pushes to parquet, the 4dp money
    * product accumulates as exact integers.
    */
  def q6Revenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(exactMoneySum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"))

  /** TPC-H Q4 reshaped for the trimmed schema: orders in a quarter that
    * had at least one line item shipped after the order date (EXISTS →
    * left-semi join with a non-equi conjunct), counted per priority.
    */
  def q4PriorityExists(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val l = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q14: promo revenue share for one month. Both the CASE'd
    * numerator and the denominator accumulate as exact 4dp integers, so
    * the final ratio is one deterministic double division.
    */
  def q14PromoRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .agg(
        expr("sum(CAST(round((CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 10000, 0) AS BIGINT))").as("num"),
        expr("sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT))").as("den"))
      .selectExpr("round(100.0 * CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) AS promo_revenue")

  /** TPC-H Q15: the quarter's top supplier(s) by revenue — revenue kept
    * as an exact integer for the max comparison, scaled back only in
    * the projection.
    */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(expr("sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT))").as("rev_i"))
    val best = rev.agg(max(col("rev_i")).as("mx"))
    rev.crossJoin(broadcast(best)).filter(col("rev_i") === col("mx"))
      // the max-filtered rev side is ~1 row; supplier scales with SF —
      // leave the join unhinted and AQE broadcasts the tiny side
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .selectExpr("s_suppkey", "s_name",
        "round(CAST(rev_i AS DOUBLE) / 10000.0, 4) AS total_revenue")
  }

  /** TPC-H Q17: revenue that would vanish if sub-20%-of-average-
    * quantity orders for one brand were dropped. The per-part average
    * is a broadcast model join; quantities are integral doubles so the
    * 0.2·avg threshold is deterministic.
    */
  def q17SmallQuantity(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
    val li = Tables.lineitem(spark, sfDir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    val avgs = li.groupBy(col("l_partkey").as("ak"))
      .agg(avg(col("l_quantity")).as("aq"))
    li.join(broadcast(avgs), col("l_partkey") === col("ak"))
      .filter(col("l_quantity") < lit(0.2) * col("aq"))
      .agg(expr("sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))").as("s_i"))
      .selectExpr("round(CAST(s_i AS DOUBLE) / 700.0, 2) AS avg_yearly")
  }

  /** TPC-H Q18: large-volume orders (line-quantity sum over 300) with
    * their customers — the IN-subquery-with-HAVING shape, as one
    * aggregation plus two key joins.
    */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sq"))
      .filter(col("sq") > 300)
    // the >300 HAVING keeps the hit set to ~1e-4 of orders, so HITS is
    // the natural build side of the customer join — but it still grows
    // linearly with SF (~1.5e7 rows at 100 TB, past any broadcast
    // threshold), so no hint: AQE's runtime size check broadcasts it at
    // scales where that is safe and falls back to a shuffle join where
    // it is not. A pinned broadcast here would be the q2-supplier
    // hazard one derivation removed
    val hits = Tables.orders(spark, sfDir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
    hits
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .selectExpr("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        "CAST(sq AS BIGINT) AS sum_qty")
  }

  /** TPC-H Q19: disjunction of brand/quantity/size conjunctions — the
    * OR-of-ANDs predicate a row-group pruner can't help with; one
    * broadcast join + filtered exact-money sum.
    */
  def q19Discounted(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11) && col("p_size").between(1, 5)) ||
        (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20) && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30) && col("p_size").between(1, 15)))
      .agg(exactMoneySum(discPrice, 4).as("revenue"))

  /** TPC-H Q8 (adapted: the fixture has no partsupp, so the supplier's
    * nation comes straight off `supplier`): yearly market share of one
    * supplier nation inside one region's customer orders for one part
    * type. At-scale shape: the fact joins the type-filtered part slice
    * (hinted — a filter sliver) and the nation dim as broadcasts,
    * shuffles once onto orders, and the region membership test is a
    * LEFT SEMI join against the region's customers. Supplier and
    * customer both scale with SF, so neither is hinted (AQE promotes
    * them only while they measure small). Numerator and
    * denominator accumulate as exact 4dp integers per year, so the
    * share is one deterministic double division.
    */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_type") === "STANDARD").select(col("p_partkey"))
    val n2 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("cnk"), col("n_regionkey").as("crk"))
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val regionCust = Tables.customer(spark, sfDir)
      .join(broadcast(n2), col("c_nationkey") === col("cnk"))
      .join(broadcast(r), col("crk") === col("r_regionkey"))
      .select(col("c_custkey"))
    val s = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n1 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(regionCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("snk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        expr("sum(CASE WHEN supp_nation = 'NATION_2' THEN CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT) ELSE CAST(0 AS BIGINT) END)").as("num"),
        expr("sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT))").as("den"))
      .selectExpr("o_year",
        "round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS mkt_share")
  }

  /** TPC-H Q12 (adapted: no l_shipmode / l_commitdate in the fixture —
    * the "late" predicate is shipped-after-order-date and the grouping
    * key is the return flag): per flag, how many late line items came
    * from critical- vs normal-priority orders. One fact-fact key join
    * + map-side CASE counts — no distinct, one shuffle.
    */
  def q12LateShipments(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q13: distribution of per-customer order counts — LEFT join
    * with an extra join-side predicate (the non-urgent filter must sit
    * INSIDE the join, not under it, to keep zero-order customers), two
    * cascaded aggregations. The first groupBy carries the c_custkey
    * shuffle; the second groups a ≤max-orders-sized domain.
    */
  def q13CustomerDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(spark, sfDir).select(col("c_custkey"))
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q21 (adapted: "late" = shipped after order date): suppliers
    * who were the SOLE late supplier on a finished multi-supplier
    * order. The textbook form is a correlated EXISTS + NOT EXISTS pair
    * against lineitem; at scale that is two extra fact self-joins, so
    * this computes each order's supplier stats in ONE pass — distinct
    * suppliers, distinct late suppliers, and (via max over a CASE) the
    * unique late supplier when there is exactly one — then counts
    * qualifying orders per supplier. One o_orderkey shuffle over the
    * fact; everything after operates on per-order rows.
    */
  def q21WaitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val late = when(col("l_shipdate") > col("o_orderdate"), col("l_suppkey"))
    val perOrder = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(late).as("n_late_supp"),
        max(late).as("late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
    perOrder.groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      // both sides are ≤|supplier| rows and supplier scales with SF:
      // no hint, AQE picks the build side by measured size
      .join(Tables.supplier(spark, sfDir),
        col("late_supp") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(25)
  }

  /** TPC-H Q22 (adapted: no c_phone — the grouping key is the nation
    * and the "positive balance" filter stands in for the country-code
    * IN list): customers above the average positive balance with no
    * orders at all, counted per nation. The average is held as an
    * exact integer pair (sum of cents, count) broadcast to every row,
    * and the comparison is pure integer arithmetic
    * (`bal_cents · cnt > sum_cents`) — no float threshold for the two
    * engines to disagree on. The dormancy test is a LEFT ANTI join
    * against recent orders (every fixture customer has SOME order, so
    * "no orders at all" would be vacuously empty — "no orders since
    * 1999" keeps Q22's anti-join-with-filter shape and real rows).
    */
  def q22GlobalSales(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val thr = c.filter(col("c_acctbal") > 0)
      .agg(
        sum(expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)")).as("sum_i"),
        count(lit(1)).as("cnt"))
    c.join(Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(thr))
      .filter(expr("CAST(round(c_acctbal * 100, 0) AS BIGINT) * cnt > sum_i"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        exactMoneySum(col("c_acctbal"), 2).as("totacctbal"))
  }

  /** TPC-H Q2 (adapted: the fixture has no `partsupp`, so "supplies the
    * part" = shipped it at least once in lineitem, and the argmin over
    * ps_supplycost becomes an argmax over s_acctbal — same
    * correlated-best-supplier-per-part shape): for every LARGE part,
    * the best-funded EUROPE supplier who ships it. The distinct
    * (part, supplier) pairs are one fact shuffle; the LARGE part sliver
    * and the fixed nation/region dims broadcast, supplier joins
    * unhinted (it scales with SF); the per-part argmax is a window over
    * the already-aggregated pair set (ties broken by s_suppkey —
    * acctbals are unique in the fixture but not at 100 TB).
    */
  def q2MinCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_type") === "LARGE")
      .select(col("p_partkey"), col("p_name"))
    // the selective LARGE broadcast joins BEFORE the pair dedup, so the
    // distinct's shuffle carries only qualifying parts' pairs — at
    // 100 TB the filter's selectivity prunes the dedup shuffle, where
    // dedup-first would shuffle every (part, supplier) pair in the fact
    val pairs = Tables.lineitem(spark, sfDir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("l_suppkey")).distinct()
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE")
    val w = Window.partitionBy(col("p_partkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
    pairs
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  /** TPC-H Q9 (adapted: no partsupp ⇒ profit omits ps_supplycost and is
    * the discounted revenue): per supplier nation per order year, over
    * parts whose name contains "widget" (Q9's LIKE '%green%'). The two
    * facts join once on l_orderkey; part (filtered, broadcast) prunes
    * lineitem early; nation broadcasts, supplier joins unhinted (it
    * scales with SF). One groupBy shuffle on (nation, year); money
    * accumulates as exact 4dp integers.
    */
  def q9ProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_name").contains("widget")).select(col("p_partkey"))
    val s = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(exactMoneySum(discPrice, 4).as("sum_profit"))
  }

  /** TPC-H Q11 (adapted: "stock value" = shipped value
    * `l_extendedprice · l_quantity` from one region's suppliers, since
    * there is no partsupp): parts whose value exceeds 1/1000 of the
    * grand total. Q11's scalar-subquery HAVING survives as a
    * broadcast-join threshold, and the comparison is pure integer
    * arithmetic (`val_i · 1000 > tot_i`) — no float epsilon for the
    * engines to disagree on. Per-part aggregation is one shuffle; the
    * grand total is a second pass over the same ~|parts|-sized
    * aggregate, not the fact table. Overflow bound: the `· 1000`
    * comparison consumes three more decimal digits of BIGINT headroom
    * than `exactMoneySum`'s documented ~10^12-row limit — the exact
    * form is safe to ~10^9 rows per part group; past that compare
    * `val_i > tot_i / 1000` (one-off-per-thousandth tolerance) or
    * accumulate in DECIMAL(38, 0).
    */
  def q11ImportantParts(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "AMERICA")
    val perPart = Tables.lineitem(spark, sfDir)
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(expr(
        "CAST(round(l_extendedprice * l_quantity * 100, 0) AS BIGINT)"))
        .as("val_i"))
    val total = perPart.agg(sum(col("val_i")).as("tot_i"))
    perPart.crossJoin(broadcast(total))
      .filter(col("val_i") * 1000 > col("tot_i"))
      .select(col("l_partkey").as("p_partkey"),
        round(col("val_i").cast("double") / 100.0, 2).as("part_value"))
  }

  /** TPC-H Q16 (adapted: the "customer complaints" exclusion list —
    * Q16's NOT IN subquery — is suppliers with negative account
    * balance; "supplies it" = shipped it in lineitem): distinct
    * supplier count per (brand, type, size) over non-PROMO parts. The
    * exclusion list is a CONSTANT FRACTION of supplier (~9% have
    * negative balance), not a sliver — it scales linearly with SF, so
    * the anti join is unhinted and AQE broadcasts it only while it
    * measures small. The distinct pairs carry one fact shuffle;
    * countDistinct re-shuffles the ~|parts×suppliers| pair set, not
    * the fact. The part filter IS a sliver-by-value and keeps its hint.
    */
  def q16SupplierCount(spark: SparkSession, sfDir: String): DataFrame = {
    val excluded = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val p = Tables.part(spark, sfDir)
      .filter(col("p_type") =!= "PROMO" && col("p_brand") =!= "Brand#45")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q20 (adapted: Q20's "availqty > half the year's shipped
    * quantity" becomes "shipped more of the part in 1996 than in all
    * other years combined" — no partsupp, same
    * correlated-quantity-threshold + nested-semi-join shape): suppliers
    * in ASIA with at least one front-loaded "small" part. Lineitem
    * aggregates once per (supplier, part) with the year split as
    * map-side CASE sums (integer-exact: quantities are integral);
    * the qualifying supplier set then semi-joins supplier, and
    * nation/region broadcast.
    */
  def q20PromoSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
    val qualifying = Tables.lineitem(spark, sfDir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(
        // round-then-cast mirrors the oracle's CAST(double AS BIGINT)
        // (DuckDB rounds, Spark's bare cast truncates — they agree on
        // the fixture's integral quantities only by luck otherwise)
        sum(when(year(col("l_shipdate")) === 1996,
          round(col("l_quantity")).cast("long")).otherwise(0L)).as("qty_1996"),
        sum(round(col("l_quantity")).cast("long")).as("qty_all"))
      .filter(col("qty_1996") * 2 > col("qty_all"))
      .select(col("l_suppkey")).distinct()
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    Tables.supplier(spark, sfDir)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name").asc)
  }

  /** KMV sketch size — single source of truth is the Aggregator, so the
    * execution path, the DuckDB oracle SQL, and the spec baseline can
    * never drift apart on K.
    */
  val KmvK: Int = graft.functions.KmvAggregator.K

  /** Approximate distinct count via a k-minimum-values sketch
    * (Bar-Yossef et al.): hash every key to a uniform 60-bit value,
    * keep the K smallest distinct hashes, and estimate
    * `(K-1) / kth_min_normalized`. Unlike HLL (`approxDistinct`), the
    * whole construction is deterministic, engine-neutral md5 arithmetic
    * — so the *estimate itself* is oracle-checked, not just pinned by a
    * spec. The sketch is `graft.functions.KmvAggregator`: bounded ≤K-long
    * state per partition, merged map-side, so the shuffle carries one
    * small array per map partition instead of all n distinct hashes
    * (the earlier distinct+sort+LIMIT form — one full hash shuffle +
    * TakeOrdered — remains in RelationalSpec as the equivalence
    * baseline). Same estimator, bit-identical output.
    */
  def kmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val sketch = udaf(graft.functions.KmvAggregator)
    Tables.lineitem(spark, sfDir)
      .selectExpr(
        "CAST(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT) AS h")
      .agg(sketch(col("h")).as("s"))
      // CAST the 2^60 literal to DOUBLE explicitly: as x.0 SQL text it
      // would parse as DECIMAL in Spark (but DOUBLE in DuckDB) and the
      // two engines could round-to-integer differently near .5
      .selectExpr("s.k AS k", "s.kth_min AS kth_min",
        "CAST(round((s.k - 1) * (CAST(1152921504606846976 AS DOUBLE) / s.kth_min)) AS BIGINT) AS est_distinct")
  }

  /** ROLLUP with grouping indicators: distinguishes subtotal rows from
    * genuine NULL group keys.
    */
  def groupingIndicators(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        expr("CAST(grouping(l_returnflag) AS INT)").as("g_flag"),
        expr("CAST(grouping(l_linestatus) AS INT)").as("g_status"),
        count(lit(1)).as("n"))

  /** Window navigation family: first/last/nth value over an explicit
    * full-partition rows frame (both engines default `last_value` to a
    * running frame, so the frame is always spelled out), plus ntile and
    * the relative-rank functions.
    */
  def windowNavigation(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(full).as("first_price"),
        last(col("o_totalprice")).over(full).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(full).as("second_price"),
        ntile(4).over(ord).cast("long").as("quartile"),
        round(percent_rank().over(ord), 6).as("pct_rank"),
        round(cume_dist().over(ord), 6).as("cume"))
  }

  /** Value-based (RANGE) window frame over event time: trailing-30-day
    * revenue per priority. RANGE frames are tie-insensitive (every row
    * with the same order date shares a frame), and the money sum inside
    * the frame accumulates as exact integers so incremental frame
    * maintenance order can't shift the rounding.
    */
  def rangeFrameRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).selectExpr(
      "o_orderkey", "o_orderpriority", "o_orderdate",
      // CAST ... AS DOUBLE before dividing: Spark parses the 100.0
      // literal as DECIMAL(4,1) and long/decimal would stay decimal
      """round(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        | OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
        |       RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        | AS DOUBLE) / 100.0, 2) AS r30_total""".stripMargin)

  /** Explicit GROUPING SETS (the general form behind rollup/cube):
    * flag×status detail, per-flag subtotal, and grand total in one
    * aggregation pass.
    */
  def groupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.views(spark, sfDir)
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        | CAST(grouping(l_returnflag) AS INT) AS g_flag,
        | CAST(grouping(l_linestatus) AS INT) AS g_status,
        | count(*) AS n,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
  }

  /** File-format surface (SURVEY.md §2.1 S7) inside the correctness
    * gate: round-trip a lineitem slice through CSV, JSON, and ORC and
    * aggregate each readback. Lossless round-trips make the three rows
    * hash-match an oracle computed straight from the parquet — so
    * text-format type fidelity (double↔text, header handling, schema-on
    * -read) is verified, not just spec-asserted.
    */
  def formatsRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
      .filter(col("l_orderkey") % 97 === 0)
    val tmp = formatsDir
    base.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    base.write.mode("overwrite").json(s"$tmp/json")
    base.write.mode("overwrite").orc(s"$tmp/orc")
    val readbacks = Seq(
      "csv" -> spark.read.option("header", "true").schema(base.schema).csv(s"$tmp/csv"),
      "json" -> spark.read.schema(base.schema).json(s"$tmp/json"),
      "orc" -> spark.read.orc(s"$tmp/orc"))
    readbacks.map { case (fmt, df) =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        countDistinct(col("l_returnflag")).as("n_flags"))
        .withColumn("format", lit(fmt))
    }.reduce(_ unionByName _)
      .select(col("format"), col("n_rows"), col("sum_qty"), col("n_flags"))
  }

  // one scratch dir per JVM, overwritten per invocation and removed on
  // exit — repeated bench/verify runs must not accrete /tmp copies
  private lazy val formatsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt")
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
    dir.toString
  }

  /** Correlated LATERAL subquery with its own ORDER BY + LIMIT: top-2
    * orders per market segment, the "top-k per outer row" shape that a
    * lateral join expresses directly (and Catalyst decorrelates into a
    * ranked window underneath). Same SQL text runs on both engines.
    */
  def lateralTopK(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.views(spark, sfDir)
    spark.sql(
      """SELECT s.c_mktsegment, o.o_orderkey, o.o_totalprice
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders JOIN customer ON o_custkey = c_custkey
        |         WHERE c_mktsegment = s.c_mktsegment
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o""".stripMargin)
  }

  /** The SQL-string surface (SURVEY.md §2.1 S1): the reference issues
    * every query as `spark.sql(...)` text over catalog tables
    * (pipeline_architecture.py:207-227); here the same works against
    * temp views registered by `Tables.views`.
    */
  def sqlSurface(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.views(spark, sfDir)
    spark.sql(
      """SELECT n_name, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
  }

  /** Morton (z-order) values over (partkey, suppkey) — the clustering
    * key `Scale.writeZOrdered` lays data out by; exposed as a query so
    * the interleaving arithmetic is oracle-checked.
    */
  def zorderValues(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).selectExpr(
      "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      s"${Scale.zValueSql("l_partkey", "l_suppkey", "div")} AS zval")

  val queries: Map[String, Q] = Map(
    "q_sql_surface" -> (sqlSurface(_, _)),
    "q_zorder" -> (zorderValues(_, _)),
    "q_grouping_id" -> (groupingIndicators(_, _)),
    "q_window_nav" -> (windowNavigation(_, _)),
    "q7_nation_pairs" -> (nationPairVolume(_, _)),
    "q_all_years" -> (everyYearCustomers(_, _)),
    "q10_returned_items" -> (returnedItemRevenue(_, _)),
    "q_cube" -> (cubeQuantities(_, _)),
    "q_pivot" -> (pivotQuantities(_, _)),
    "q_union_all" -> (unionAllKeys(_, _)),
    "q_union_distinct" -> (unionDistinctKeys(_, _)),
    "q_right_join" -> (rightJoinOrders(_, _)),
    "q_string_agg" -> (stringAggStatuses(_, _)),
    "q_intersect_all" -> (intersectAllStatuses(_, _)),
    "q_except_all" -> (exceptAllStatuses(_, _)),
    "q_full_outer" -> (fullOuterActivity(_, _)),
    "q_approx_distinct" -> (approxDistinct(_, _)),
    "q_kmv_distinct" -> (kmvDistinct(_, _)),
    "q_range_frame" -> (rangeFrameRevenue(_, _)),
    "q_grouping_sets" -> (groupingSets(_, _)),
    "q_lateral_topk" -> (lateralTopK(_, _)),
    "p_formats_roundtrip" -> (formatsRoundtrip(_, _)),
    "q4_priority_exists" -> (q4PriorityExists(_, _)),
    "q6_revenue" -> (q6Revenue(_, _)),
    "q2_min_cost_supp" -> (q2MinCostSupplier(_, _)),
    "q9_product_profit" -> (q9ProductProfit(_, _)),
    "q11_important_parts" -> (q11ImportantParts(_, _)),
    "q16_supplier_count" -> (q16SupplierCount(_, _)),
    "q20_promo_suppliers" -> (q20PromoSuppliers(_, _)),
    "q8_market_share" -> (q8MarketShare(_, _)),
    "q12_late_shipments" -> (q12LateShipments(_, _)),
    "q13_cust_distribution" -> (q13CustomerDistribution(_, _)),
    "q21_waiting_suppliers" -> (q21WaitingSuppliers(_, _)),
    "q22_global_sales" -> (q22GlobalSales(_, _)),
    "q14_promo_revenue" -> (q14PromoRevenue(_, _)),
    "q15_top_supplier" -> (q15TopSupplier(_, _)),
    "q17_small_quantity" -> (q17SmallQuantity(_, _)),
    "q18_large_orders" -> (q18LargeOrders(_, _)),
    "q19_discounted" -> (q19Discounted(_, _)),
    "q1_pricing_summary" -> (pricingSummary(_, _)),
    "q3_top_orders_segment" -> (topOrdersBySegment(_, _)),
    "q5_region_revenue" -> (regionRevenue(_, _)),
    "q_brand_volume" -> (brandVolume(_, _)),
    "q_semi_join" -> (customersWithOrders(_, _)),
    "q_anti_join" -> (customersWithoutOrders(_, _)),
    "q_left_join_agg" -> (customerOrderCounts(_, _)),
    "q_window_rank" -> (rankByPriority(_, _)),
    "q_window_lag" -> (orderPriceLag(_, _)),
    "q_running_sum" -> (runningSpend(_, _)),
    "q_set_except" -> (exceptKeys(_, _)),
    "q_set_intersect" -> (intersectKeys(_, _)),
    "q_rollup" -> (rollupQuantities(_, _)),
    "q_count_distinct" -> (distinctCounts(_, _)),
    "q_topk_orders" -> (topOrders(_, _)),
    "q_having" -> (bigCustomers(_, _)),
    "q_case_buckets" -> (priceBuckets(_, _)),
    "q_string_funcs" -> (customerNameOps(_, _)),
    "q_orders_by_month" -> (ordersByMonth(_, _)),
    "q_above_nation_avg" -> (aboveNationAverage(_, _)),
    "q_events_hourly" -> (eventsHourly(_, _)))

  val oracles: Map[String, String] = Map(
    "q_range_frame" ->
      """SELECT o_orderkey, o_orderpriority, o_orderdate,
        | round(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |  OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
        |        RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |  AS DOUBLE) / 100.0, 2) AS r30_total
        |FROM orders""".stripMargin,
    "p_formats_roundtrip" ->
      """SELECT f.format, a.n_rows, a.sum_qty, a.n_flags
        |FROM (SELECT count(*) AS n_rows,
        |             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |             count(DISTINCT l_returnflag) AS n_flags
        |      FROM lineitem WHERE l_orderkey % 97 = 0) a
        |CROSS JOIN (SELECT unnest(['csv', 'json', 'orc']) AS format) f""".stripMargin,
    "q_lateral_topk" ->
      """SELECT s.c_mktsegment, o.o_orderkey, o.o_totalprice
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders JOIN customer ON o_custkey = c_custkey
        |         WHERE c_mktsegment = s.c_mktsegment
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(grouping(l_returnflag) AS INT) AS g_flag,
        | CAST(grouping(l_linestatus) AS INT) AS g_status,
        | count(*) AS n,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,
    "q6_revenue" ->
      s"""SELECT ${exactMoneySumSql("l_extendedprice * l_discount", 4)} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(o_year AS INT) AS o_year,
        | round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS mkt_share
        |FROM (
        |  SELECT year(o_orderdate) AS o_year,
        |    sum(CASE WHEN n1.n_name = 'NATION_2'
        |        THEN CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)
        |        ELSE 0 END) AS num,
        |    sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) AS den
        |  FROM lineitem
        |   JOIN part ON l_partkey = p_partkey
        |   JOIN orders ON l_orderkey = o_orderkey
        |   JOIN customer ON o_custkey = c_custkey
        |   JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |   JOIN region ON n2.n_regionkey = r_regionkey
        |   JOIN supplier ON l_suppkey = s_suppkey
        |   JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
        |  GROUP BY 1) t""".stripMargin,
    "q2_min_cost_supp" ->
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM (
        |  SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
        |    row_number() OVER (PARTITION BY p_partkey
        |                       ORDER BY s_acctbal DESC, s_suppkey) AS rn
        |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |   JOIN part ON l_partkey = p_partkey
        |   JOIN supplier ON l_suppkey = s_suppkey
        |   JOIN nation ON s_nationkey = n_nationkey
        |   JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_type = 'LARGE' AND r_name = 'EUROPE') t
        |WHERE rn = 1
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         | ${exactMoneySumSql(discPriceSql, 4)} AS sum_profit
         |FROM lineitem
         | JOIN part ON l_partkey = p_partkey
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN supplier ON l_suppkey = s_suppkey
         | JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%widget%'
         |GROUP BY 1, 2""".stripMargin,
    "q11_important_parts" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * l_quantity * 100, 0) AS BIGINT)) AS val_i
        |  FROM lineitem
        |   JOIN supplier ON l_suppkey = s_suppkey
        |   JOIN nation ON s_nationkey = n_nationkey
        |   JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA'
        |  GROUP BY 1)
        |SELECT l_partkey AS p_partkey,
        |  round(CAST(val_i AS DOUBLE) / 100.0, 2) AS part_value
        |FROM per_part
        |WHERE val_i * 1000 > (SELECT sum(val_i) FROM per_part)""".stripMargin,
    "q16_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
        | count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        | JOIN part ON l_partkey = p_partkey
        |WHERE p_type <> 'PROMO' AND p_brand <> 'Brand#45'
        |  AND NOT EXISTS (SELECT 1 FROM supplier
        |                  WHERE s_acctbal < 0 AND s_suppkey = ps.l_suppkey)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q20_promo_suppliers" ->
      """SELECT s_name, s_acctbal
        |FROM supplier
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(CASE WHEN year(l_shipdate) = 1996
        |             THEN CAST(l_quantity AS BIGINT) ELSE 0 END) * 2
        |       > sum(CAST(l_quantity AS BIGINT)))
        |ORDER BY s_name""".stripMargin,
    "q12_late_shipments" ->
      """SELECT l_returnflag,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate
        |GROUP BY l_returnflag""".stripMargin,
    "q13_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH po AS (
        |  SELECT l_orderkey,
        |    count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN l_shipdate > o_orderdate THEN l_suppkey END) AS n_late_supp,
        |    max(CASE WHEN l_shipdate > o_orderdate THEN l_suppkey END) AS late_supp
        |  FROM lineitem
        |   JOIN (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F') o
        |     ON l_orderkey = o_orderkey
        |  GROUP BY 1)
        |SELECT s_name, count(*) AS numwait
        |FROM po JOIN supplier ON late_supp = s_suppkey
        |WHERE n_supp >= 2 AND n_late_supp = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 25""".stripMargin,
    "q22_global_sales" ->
      s"""SELECT n_name, count(*) AS numcust,
         | ${exactMoneySumSql("c_acctbal", 2)} AS totacctbal
         |FROM customer
         |CROSS JOIN (SELECT sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS sum_i,
         |                   count(*) AS cnt
         |            FROM customer WHERE c_acctbal > 0) thr
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) * cnt > sum_i
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
         |GROUP BY n_name""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT round(100.0 * CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) AS promo_revenue
        |FROM (
        |  SELECT
        |    sum(CAST(round((CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 10000, 0) AS BIGINT)) AS num,
        |    sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) AS den
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01') t""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) AS rev_i
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, round(CAST(rev_i AS DOUBLE) / 10000.0, 4) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_i = (SELECT max(rev_i) FROM rev)""".stripMargin,
    "q17_small_quantity" ->
      """SELECT round(CAST(s_i AS DOUBLE) / 700.0, 2) AS avg_yearly FROM (
        |  SELECT sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS s_i
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_brand = 'Brand#23'
        |    AND l.l_quantity < 0.2 * (SELECT avg(l2.l_quantity) FROM lineitem l2
        |                              WHERE l2.l_partkey = l.l_partkey)) t""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(sq AS BIGINT) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS sq FROM lineitem
        |      GROUP BY l_orderkey HAVING sum(l_quantity) > 300) b
        |  ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q19_discounted" ->
      s"""SELECT ${exactMoneySumSql(discPriceSql, 4)} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
         |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
         |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""".stripMargin,
    "q_kmv_distinct" ->
      s"""SELECT k, kth_min,
         | CAST(round((k - 1) * (CAST(1152921504606846976 AS DOUBLE) / kth_min)) AS BIGINT) AS est_distinct
         |FROM (
         |  SELECT count(*) AS k, max(h) AS kth_min FROM (
         |    SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |    FROM lineitem ORDER BY h LIMIT $KmvK) t) s""".stripMargin,
    "q_all_years" ->
      """SELECT o_custkey,
        | count(DISTINCT year(o_orderdate)) AS n_years,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING count(DISTINCT year(o_orderdate)) =
        |  (SELECT count(DISTINCT year(o_orderdate)) FROM orders)""".stripMargin,
    "q7_nation_pairs" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | ${exactMoneySumSql(discPriceSql, 4)} AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY 1, 2""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_mktsegment,
        | ${exactMoneySumSql(discPriceSql, 4)} AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_grouping_id" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(grouping(l_returnflag) AS INT) AS g_flag,
        | CAST(grouping(l_linestatus) AS INT) AS g_status,
        | count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_totalprice) OVER wf AS first_price,
        | last_value(o_totalprice) OVER wf AS last_price,
        | nth_value(o_totalprice, 2) OVER wf AS second_price,
        | CAST(ntile(4) OVER wo AS BIGINT) AS quartile,
        | round(percent_rank() OVER wo, 6) AS pct_rank,
        | round(cume_dist() OVER wo, 6) AS cume
        |FROM orders
        |WINDOW
        | wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        | wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "q_zorder" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         | ${Scale.zValueSql("l_partkey", "l_suppkey", "//")} AS zval
         |FROM lineitem""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q_pivot" ->
      """SELECT l_linestatus,
        | round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END),2) AS "A",
        | round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END),2) AS "N",
        | round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END),2) AS "R"
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q_right_join" ->
      """SELECT c_mktsegment,
        | count(o_orderkey) AS n_big_orders,
        | count(*) AS n_rows
        |FROM (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 400000) o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_string_agg" ->
      """SELECT l_returnflag,
        | string_agg(l_linestatus, ',' ORDER BY l_linestatus) AS statuses
        |FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) t
        |GROUP BY l_returnflag""".stripMargin,
    "q_union_distinct" ->
      """SELECT o_custkey AS k FROM orders
        |UNION
        |SELECT c_custkey AS k FROM customer""".stripMargin,
    "q_intersect_all" ->
      """SELECT k, count(*) AS n_copies FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O') t
        |GROUP BY k""".stripMargin,
    "q_except_all" ->
      """SELECT k, count(*) AS n_copies FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O') t
        |GROUP BY k""".stripMargin,
    "q_union_all" ->
      """SELECT k, count(*) AS n_rows, count(DISTINCT src) AS n_srcs FROM (
        |  SELECT o_custkey AS k, 'order' AS src FROM orders
        |  UNION ALL
        |  SELECT c_custkey AS k, 'customer' AS src FROM customer) t
        |GROUP BY k""".stripMargin,
    "q_full_outer" ->
      """SELECT coalesce(c_custkey, o_custkey) AS k, c_acctbal, n_recent
        |FROM (SELECT c_custkey, c_acctbal FROM customer
        |      WHERE c_mktsegment = 'BUILDING') b
        |FULL OUTER JOIN (
        |  SELECT o_custkey, count(*) AS n_recent FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        |  GROUP BY o_custkey) r ON c_custkey = o_custkey""".stripMargin,
    "q_sql_surface" ->
      """SELECT n_name, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | ${exactMoneySumSql(discPriceSql, 4)} AS sum_disc_price,
        | ${exactMoneySumSql(chargeSql, 6)} AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | ${exactMoneyAvgSql("l_extendedprice", 2, 4)} AS avg_price,
        | ${exactMoneyAvgSql("l_discount", 2, 4)} AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders_segment" ->
      s"""SELECT o_orderkey, o_orderdate,
        | ${exactMoneySumSql(discPriceSql, 4)} AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      s"""SELECT n_name, ${exactMoneySumSql(discPriceSql, 4)} AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q_brand_volume" ->
      s"""SELECT p_brand, count(*) AS n_items,
        | round(sum(l_quantity),2) AS sum_qty,
        | ${exactMoneyAvgSql("p_retailprice", 2, 4)} AS avg_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q_left_join_agg" ->
      """SELECT c_custkey, n_orders, total_spent
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_orders,
        |         round(sum(o_totalprice),2) AS total_spent
        |  FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  rank() OVER (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        | FROM orders) t WHERE rnk <= 3""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders""".stripMargin,
    "q_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_total
        |FROM orders""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey AS k FROM customer EXCEPT
        |SELECT o_custkey AS k FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2000-01-01'""".stripMargin,
    "q_set_intersect" ->
      "SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey AS k FROM orders",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_having" ->
      """SELECT o_custkey, count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 3""".stripMargin,
    "q_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
        |            WHEN o_totalprice < 300000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |       o_orderstatus, count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS uname,
        | substr(c_name, 1, 8) AS prefix,
        | concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS tag,
        | CAST(length(c_name) AS INT) AS len
        |FROM customer""".stripMargin,
    "q_orders_by_month" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
        |       CAST(month(o_orderdate) AS INT) AS m,
        |       count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q_above_nation_avg" ->
      s"""SELECT c_custkey, c_acctbal, round(nation_avg, 4) AS nation_avg
        |FROM customer JOIN (
        |  SELECT c_nationkey AS nk,
        |    sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) / (100.0 * count(*)) AS nation_avg
        |  FROM customer GROUP BY c_nationkey) t ON c_nationkey = nk
        |WHERE c_acctbal > nation_avg""".stripMargin,
    "q_events_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
        | count(*) AS n, round(sum(value),2) AS total
        |FROM events GROUP BY 1, 2""".stripMargin)
}
