package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function breadth beyond the reference's own tiny surface
  * (SURVEY.md §2.8: only uuid, to_timestamp, current_date,
  * current_timestamp, from_unixtime, division): math, string,
  * null-handling, JSON, and calendar
  * functions — all projection-only (single codegen stage over the scan)
  * and all oracle-checked. Type notes: Spark `ceil`→BIGINT vs DuckDB
  * →DOUBLE, Spark `signum`→DOUBLE vs DuckDB `sign`→INT, so both sides
  * cast to a common type explicitly.
  */
object ScalarOps {

  /** Math functions over lineitem measures. */
  def mathFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).selectExpr(
      "l_orderkey", "l_linenumber",
      "round(abs(l_discount - 0.05), 4) AS abs_disc_delta",
      "CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil",
      "CAST(floor(l_extendedprice) AS BIGINT) AS price_floor",
      "round(power(l_quantity, 2), 4) AS qty_sq",
      "l_orderkey % 7 AS key_mod",
      "CAST(sign(l_discount - 0.05) AS INT) AS disc_sign",
      "round(sqrt(l_quantity), 6) AS qty_sqrt")

  /** String functions over customer names. */
  def stringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).selectExpr(
      "c_custkey",
      "lpad(CAST(c_custkey AS STRING), 12, '0') AS padded_key",
      "rpad(c_mktsegment, 12, '.') AS padded_seg",
      "replace(c_name, '#', '-') AS renamed",
      "reverse(c_mktsegment) AS rev_seg",
      "translate(c_mktsegment, 'AEIOU', 'aeiou') AS lowered_vowels",
      "trim(concat('  ', c_name, '  ')) AS trimmed",
      "lower(c_mktsegment) AS seg_lower")

  /** Null introduction + handling: nullif / coalesce / null-skipping
    * aggregation (the test data has no natural nulls, so they are
    * manufactured deterministically).
    */
  def nullHandling(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .selectExpr(
        "nullif(o_orderstatus, 'F') AS status_or_null",
        "o_totalprice")
      .groupBy(expr("coalesce(status_or_null, 'finished') AS status_bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("status_or_null")).as("n_non_null"),
        round(sum(col("o_totalprice")), 2).as("total"))

  /** JSON extraction from the events `props` column (`{"k": <int>}`) —
    * the semi-structured side channel every event pipeline carries.
    */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .selectExpr("CAST(get_json_object(props, '$.k') AS BIGINT) AS k_val")
      .groupBy(col("k_val"))
      .agg(count(lit(1)).as("n"))

  /** Calendar breadth: quarter / day-of-month / last-day-of-month. */
  def dateFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(
        expr("CAST(year(o_orderdate) AS INT) AS y"),
        expr("CAST(quarter(o_orderdate) AS INT) AS q"))
      .agg(
        count(lit(1)).as("n"),
        expr("CAST(min(day(o_orderdate)) AS INT) AS first_dom"),
        expr("CAST(max(day(last_day(o_orderdate))) AS INT) AS max_month_len"))

  /** Boolean / conditional aggregates per customer. */
  def boolAggs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(
        expr("bool_and(o_totalprice > 10000)").as("all_over_10k"),
        expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"),
        expr("count_if(o_orderstatus = 'F')").as("n_finished"),
        count(lit(1)).as("n_orders"))

  /** Quantity-weighted average price per flag: ratio of two sums whose
    * true values sit on coarse decimal lattices (safe at these
    * roundings), the standard weighted-mean shape.
    */
  def weightedAvg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(col("l_extendedprice") * col("l_quantity")) /
          sum(col("l_quantity")), 4).as("wavg_price"),
        round(sum(col("l_quantity")), 2).as("total_qty"))

  /** Bitwise-operator surface over the keys (Spark `^` is xor while
    * DuckDB's is exponent — the oracle spells `xor(a,b)`; everything
    * else is common syntax).
    */
  def bitwiseFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).selectExpr(
      "l_orderkey", "l_linenumber",
      "l_orderkey & 255 AS key_and",
      "l_orderkey | 4096 AS key_or",
      "l_orderkey ^ l_partkey AS key_xor",
      "shiftleft(l_linenumber, 3) AS ln_shl",
      "shiftright(l_orderkey, 4) AS key_shr",
      "CAST(bit_count(l_orderkey) AS INT) AS key_bits",
      "~l_linenumber AS ln_not")

  /** Map-typed column surface: construct, probe, and enumerate map
    * columns. Values are multi-character on purpose: DuckDB's map
    * subscript semantics changed at 1.2 (`m[k]` LIST → value), and with
    * single-char values a stale `[1]` unwrap would degrade to harmless
    * first-char string indexing and mask the mismatch. The oracle
    * probes via `list_position` over `map_keys`/`map_values`, which is
    * version-stable; a missing key is NULL on both engines.
    */
  def mapFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).selectExpr(
      "l_orderkey", "l_linenumber",
      "element_at(map('flag', concat(l_returnflag, '_f'), 'status', concat(l_linestatus, '_s')), 'flag') AS m_flag",
      "element_at(map('flag', concat(l_returnflag, '_f'), 'status', concat(l_linestatus, '_s')), 'nope') AS m_missing",
      "CAST(size(map('flag', concat(l_returnflag, '_f'), 'status', concat(l_linestatus, '_s'))) AS BIGINT) AS m_size",
      "concat_ws(',', map_keys(map('flag', concat(l_returnflag, '_f'), 'status', concat(l_linestatus, '_s')))) AS m_keys")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_map_funcs" -> (mapFuncs(_, _)),
    "q_bitwise_funcs" -> (bitwiseFuncs(_, _)),
    "q_weighted_avg" -> (weightedAvg(_, _)),
    "q_bool_aggs" -> (boolAggs(_, _)),
    "q_math_funcs" -> (mathFuncs(_, _)),
    "q_string_funcs2" -> (stringFuncs(_, _)),
    "q_null_handling" -> (nullHandling(_, _)),
    "q_json_extract" -> (jsonExtract(_, _)),
    "q_date_funcs2" -> (dateFuncs(_, _)))

  val oracles: Map[String, String] = Map(
    "q_map_funcs" ->
      """WITH m AS (
        | SELECT l_orderkey, l_linenumber,
        |  map(['flag','status'],
        |      [concat(l_returnflag, '_f'), concat(l_linestatus, '_s')]) AS mp
        | FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        | list_extract(map_values(mp), list_position(map_keys(mp), 'flag')) AS m_flag,
        | list_extract(map_values(mp), list_position(map_keys(mp), 'nope')) AS m_missing,
        | CAST(cardinality(mp) AS BIGINT) AS m_size,
        | array_to_string(map_keys(mp), ',') AS m_keys
        |FROM m""".stripMargin,
    "q_bitwise_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | l_orderkey & 255 AS key_and,
        | l_orderkey | 4096 AS key_or,
        | xor(l_orderkey, l_partkey) AS key_xor,
        | l_linenumber << 3 AS ln_shl,
        | l_orderkey >> 4 AS key_shr,
        | CAST(bit_count(l_orderkey) AS INT) AS key_bits,
        | ~l_linenumber AS ln_not
        |FROM lineitem""".stripMargin,
    "q_weighted_avg" ->
      """SELECT l_returnflag,
        | round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
        | round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_bool_aggs" ->
      """SELECT o_custkey,
        | bool_and(o_totalprice > 10000) AS all_over_10k,
        | bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        | CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | round(abs(l_discount - 0.05), 4) AS abs_disc_delta,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        | CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        | round(power(l_quantity, 2), 4) AS qty_sq,
        | l_orderkey % 7 AS key_mod,
        | CAST(sign(l_discount - 0.05) AS INT) AS disc_sign,
        | round(sqrt(l_quantity), 6) AS qty_sqrt
        |FROM lineitem""".stripMargin,
    "q_string_funcs2" ->
      """SELECT c_custkey,
        | lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
        | rpad(c_mktsegment, 12, '.') AS padded_seg,
        | replace(c_name, '#', '-') AS renamed,
        | reverse(c_mktsegment) AS rev_seg,
        | translate(c_mktsegment, 'AEIOU', 'aeiou') AS lowered_vowels,
        | trim(concat('  ', c_name, '  ')) AS trimmed,
        | lower(c_mktsegment) AS seg_lower
        |FROM customer""".stripMargin,
    "q_null_handling" ->
      """SELECT coalesce(nullif(o_orderstatus, 'F'), 'finished') AS status_bucket,
        | count(*) AS n_rows,
        | count(nullif(o_orderstatus, 'F')) AS n_non_null,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1""".stripMargin,
    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        | count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_date_funcs2" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
        | CAST(quarter(o_orderdate) AS INT) AS q,
        | count(*) AS n,
        | CAST(min(day(o_orderdate)) AS INT) AS first_dom,
        | CAST(max(day(last_day(o_orderdate))) AS INT) AS max_month_len
        |FROM orders GROUP BY 1, 2""".stripMargin)
}
