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
}
