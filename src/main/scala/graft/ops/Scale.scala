package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale mechanics that don't change query semantics but decide whether
  * a plan survives 100 TB: key-salting for skewed shuffles and bucketed
  * table layout for shuffle-free co-located joins.
  *
  * AQE's skew-join splitting (on by default) is the first line of
  * defense; `saltedJoin` is the deterministic manual fallback for the
  * pathological keys AQE can't split (e.g. one key = 30% of a fact
  * table). Bucketing is the standing answer for repeated fact⋈fact
  * equi-joins: both sides pre-hashed into the same bucket count on the
  * join key, so the join plans with zero Exchange nodes.
  */
object Scale {

  /** Inner equi-join with the fact side salted: each fact row gets a
    * deterministic salt (hash of the whole row), the build side is
    * replicated across all `saltFactor` salt values, and the join key
    * becomes (key, salt) — splitting one hot key's rows over
    * `saltFactor` reducers. Result set is identical to the plain join.
    */
  def saltedJoin(
      fact: DataFrame, build: DataFrame, factKey: String, buildKey: String,
      saltFactor: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val repl = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedFact.join(repl,
        saltedFact(factKey) === repl(buildKey) &&
          saltedFact("__salt") === repl("__salt"))
      .drop("__salt")
  }

  /** Write `df` as a bucketed+sorted catalog table: pre-shuffled into
    * `numBuckets` by `bucketCol`, the layout that lets later equi-joins
    * and aggregations on that key plan without an Exchange.
    */
  def writeBucketed(df: DataFrame, table: String, location: String,
      bucketCol: String, numBuckets: Int): Unit =
    df.write
      .format("parquet")
      .option("path", location)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Hive-style partitioned layout: directory-per-value on the named
    * columns, so reads filtered on them prune whole directories before
    * any file IO (`PartitionFilters` in the scan, vs `PushedFilters`
    * which still opens footers). The standard lake layout for
    * low-cardinality scan keys (date, type, tenant).
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite").parquet(path)

  /** Bits interleaved per dimension for the z-order curve. */
  val ZBits = 16

  /** SQL text computing the 2-D Morton (z-order) value of two integer
    * columns (low `ZBits` bits each, interleaved x→even positions,
    * y→odd). Spelled with div/mod arithmetic that evaluates identically
    * in Spark SQL (`div`) and DuckDB (`//`) — the caller swaps the
    * operator token, everything else is shared.
    */
  def zValueSql(x: String, y: String, divOp: String): String = {
    val terms = (0 until ZBits).flatMap { b =>
      val pow = 1L << b
      Seq(
        s"((($x % 65536) $divOp $pow) % 2) * ${1L << (2 * b)}",
        s"((($y % 65536) $divOp $pow) % 2) * ${1L << (2 * b + 1)}")
    }
    terms.mkString("(", " + ", ")")
  }

  /** Z-order layout: cluster rows along the Morton curve of two
    * columns, so parquet row-group min/max stats stay tight on BOTH
    * dimensions and a filter on either prunes — the standard
    * multi-dimensional data-skipping layout (range partition by the
    * z-value, sort within partitions).
    */
  def writeZOrdered(df: DataFrame, path: String, x: String, y: String,
      partitions: Int): Unit =
    df.withColumn("__z", expr(zValueSql(x, y, "div")))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  // one scratch parent per JVM for the layout-building queries below,
  // removed on exit (same pattern as PipelineQueries.morScratch)
  private lazy val scratch: java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scale")
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
    dir
  }

  /** `q_salted_skew_join`: the salted fact⋈dim join as an
    * oracle-checked query — lineitem salted on a whole-row hash, part
    * replicated across the salt space, result identical to the plain
    * join (which is exactly what the oracle runs). `ScaleSpec` pins
    * the mechanics (hot key split across reducers); this entry pins
    * result parity at every SF.
    */
  def saltedSkewJoin(spark: SparkSession, sfDir: String): DataFrame =
    saltedJoin(graft.Tables.lineitem(spark, sfDir),
        graft.Tables.part(spark, sfDir),
        "l_partkey", "p_partkey", saltFactor = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))

  /** `q_partition_prune`: hive-partitioned layout end-to-end — write
    * events partitioned by `event_type`, then answer a single-type
    * aggregate from the pruned read. The scan must carry the predicate
    * as a PartitionFilter (directories never opened — `ScaleSpec`
    * asserts it); the oracle replays the same aggregate over the flat
    * table.
    */
  def partitionPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory(scratch, "pp").toString + "/t"
    writePartitioned(
      graft.Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_type"), col("value")),
      path, Seq("event_type"))
    spark.read.parquet(path)
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_clicks"),
        round(sum(col("value")), 2).as("total"))
  }

  /** `q_dpp_join`: dynamic partition pruning end-to-end — the
    * star-join shape that decides 100 TB fact scans. The fact table is
    * written month-partitioned; the dim side (a month calendar with a
    * quarter attribute) is filtered on a DERIVED column, so no static
    * rule can turn it into a partition predicate — only Catalyst's
    * runtime DPP subquery can: the broadcast of the filtered dim is
    * reused as a dynamic pruning filter on the fact scan, and only the
    * three matching month directories are ever listed or read.
    * `PlanAssertSpec` pins the `dynamicpruning` expression in the fact
    * scan's PartitionFilters; this entry pins result parity against
    * the plain-join oracle. Money sums in integer cents (exact at any
    * SF); revenue presented from the same integer in both engines.
    */
  // the month-partitioned fact is read-only after its build — one
  // build per (JVM, sfDir), shared across bench reps
  private val dppCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def dppJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = graft.Tables.orders(spark, sfDir)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
    val path = dppCache.computeIfAbsent(sfDir, _ => {
      val p = java.nio.file.Files.createTempDirectory(scratch, "dpp")
        .toString + "/t"
      writePartitioned(
        orders.select(col("o_orderkey"), col("o_totalprice"), col("o_month"))
          // co-locate each month before the write: one file per
          // directory instead of tasks × months splinters
          .repartition(col("o_month")),
        p, Seq("o_month"))
      p
    })
    val monthDim = orders.select(col("o_month")).distinct()
      .withColumn("o_quarter",
        concat(substring(col("o_month"), 1, 4), lit("-Q"),
          expr("cast((cast(substring(o_month, 6, 2) as int) + 2) / 3 as int)")))
    spark.read.parquet(path)
      .join(monthDim.filter(col("o_quarter") === "1995-Q1"), Seq("o_month"))
      .groupBy(col("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(round(col("o_totalprice") * 100).cast("long")) / 100.0, 2)
          .as("revenue"))
  }

  /** `q_bucketed_join`: the shuffle-free co-located join end-to-end —
    * both sides written bucketed+sorted on the join key into the same
    * bucket count, joined through the catalog, aggregated. `ScaleSpec`
    * asserts the zero-Exchange plan; this entry pins result parity
    * against the plain-join oracle. Fixed table names + overwrite mode
    * keep the entry re-runnable within and across sessions.
    */
  def bucketedJoinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory(scratch, "bj").toString
    writeBucketed(
      graft.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_extendedprice")),
      "graft_bkt_lineitem", s"$base/li", "l_orderkey", numBuckets = 8)
    writeBucketed(
      graft.Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderstatus")),
      "graft_bkt_orders", s"$base/ord", "o_orderkey", numBuckets = 8)
    spark.table("graft_bkt_lineitem")
      .join(spark.table("graft_bkt_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_skew_join" -> (saltedSkewJoin(_, _)),
    "q_partition_prune" -> (partitionPrune(_, _)),
    "q_dpp_join" -> (dppJoin(_, _)),
    "q_bucketed_join" -> (bucketedJoinAgg(_, _)))

  val oracles: Map[String, String] = Map(
    "q_salted_skew_join" ->
      """SELECT p_brand, count(*) AS n_items,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q_partition_prune" ->
      """SELECT user_id, count(*) AS n_clicks, round(sum(value), 2) AS total
        |FROM events WHERE event_type = 'click'
        |GROUP BY user_id""".stripMargin,
    "q_dpp_join" ->
      """SELECT o_month, count(*) AS n_orders,
        | round(sum(cast(round(o_totalprice * 100) as bigint)) / 100.0, 2)
        |   AS revenue
        |FROM (SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_totalprice
        |      FROM orders)
        |WHERE o_month IN ('1995-01', '1995-02', '1995-03')
        |GROUP BY o_month""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n_items,
        | round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin)
}
