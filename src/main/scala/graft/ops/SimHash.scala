package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting + hamming-distance near-dup pairs.
  *
  * The 64-bit simhash is built from md5 nibbles so the construction is
  * *exactly* expressible in ANSI SQL for the DuckDB oracle (a
  * Spark-native hash like xxhash64 would be faster but unverifiable):
  * for each distinct token, weight = term frequency, and bit b of the
  * token's hash is bit (3 - b%4) of hex nibble b/4 of md5(token). Bit b
  * of the doc fingerprint is 1 iff the weighted ±1 sum over tokens is
  * positive.
  *
  * Execution shape: one (doc, token) aggregation with 64 integer partial
  * aggregates — a single shuffle on doc_id, no explosion by bit
  * position. The near-dup join uses 4 bands of 16 bits; by pigeonhole a
  * pair at hamming ≤ 3 shares at least one clean band, so banded recall
  * is *exact* for the ≤3 threshold and the brute-force oracle matches.
  */
object SimHash {

  val Bits = 64
  val HammingMax = 3
  val NumBands = 4
  val BandBits: Int = Bits / NumBands // 16

  /** hex digit → int value, identical text in Spark SQL and DuckDB. */
  private def hexVal(m: String, nib: Int): String =
    s"CASE WHEN ascii(substr($m, $nib, 1)) <= 57 THEN ascii(substr($m, $nib, 1)) - 48 " +
      s"ELSE ascii(substr($m, $nib, 1)) - 87 END"

  /** Per-doc (token md5, term frequency) rows, with the 16 md5 nibbles
    * pre-extracted once per row — the per-bit aggregates below index into
    * them, instead of re-running ascii(substr(...)) 64× per row (4× less
    * string work and small enough expressions to stay in whole-stage
    * codegen; the 64-CASE form fell back to interpreted eval and its
    * Janino compile time dominated the query).
    */
  private def tokenHashes(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .select(Seq(col("doc_id"), md5(col("w")).as("m"), col("c")): _*)
      .select(Seq(col("doc_id"), col("c")) ++
        (0 until 16).map(i => expr(hexVal("m", i + 1)).cast("long").as(s"n$i")): _*)

  /** Fingerprints: doc_id + 64-char '0'/'1' string (oracle-checkable)
    * + two internal 32-bit words for cheap XOR hamming.
    *
    * Per-bit aggregate: with bit_b ∈ {0,1}, the signed sum
    * `sum(c·(2·bit_b − 1))` equals `2·sum(c·bit_b) − sum(c)`, so each of
    * the 64 aggregates is a plain conditional sum over a pre-extracted
    * nibble and `sum(c)` is shared.
    */
  def fingerprintsFull(spark: SparkSession, sfDir: String): DataFrame = {
    def bitAgg(b: Int): Column =
      sum(col("c") * shiftright(col(s"n${b / 4}"), 3 - b % 4).bitwiseAND(lit(1L)))
        .as(s"b$b")
    val sums = tokenHashes(spark, sfDir)
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("tot"), (0 until Bits).map(bitAgg): _*)
    // bit is 1 iff 2·sum(c·bit) − sum(c) > 0
    val bitChars = (0 until Bits).map(b =>
      when(col(s"b$b") * 2 > col("tot"), "1").otherwise("0"))
    val word = (range: Range) => range.map(b =>
      when(col(s"b$b") * 2 > col("tot"), lit(1L << (31 - (b % 32)))).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(
      col("doc_id"),
      concat(bitChars: _*).as("simhash"),
      word(0 until 32).as("w_hi"),
      word(32 until 64).as("w_lo"))
  }

  /** Oracle-facing projection: (doc_id, simhash bit-string). */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    fingerprintsFull(spark, sfDir).select(col("doc_id"), col("simhash"))

  /** Near-dup pairs at hamming ≤ 3 via 4×16-bit band join (exact recall
    * — see class doc), hamming computed with XOR + bit_count.
    */
  def nearDupPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = fingerprintsFull(spark, sfDir).cache()
    val banded = fp.select(col("doc_id"), col("simhash"), col("w_hi"), col("w_lo"),
      explode(array((0 until NumBands).map(i =>
        struct(lit(i).as("band"),
          substring(col("simhash"), i * BandBits + 1, BandBits).as("bs"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("w_hi"), col("w_lo"),
        col("b.band").as("band"), col("b.bs").as("bs"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bs") === col("b.bs")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.w_hi").bitwiseXOR(col("b.w_hi"))) +
          bit_count(col("a.w_lo").bitwiseXOR(col("b.w_lo")))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= HammingMax)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_simhash" -> (fingerprints(_, _)),
    "dd_simhash_neardup" -> (nearDupPairs(_, _)))

  private def oracleBitTerm(b: Int): String = {
    val nib = b / 4 + 1
    val p = 1 << (3 - b % 4)
    s"CASE WHEN sum(c * (2 * (((${hexVal("m", nib)}) // $p) % 2) - 1)) > 0 THEN '1' ELSE '0' END"
  }

  private val fingerprintSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, w, count(*) AS c
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
       |  GROUP BY doc_id, w),
       |h AS (SELECT doc_id, md5(w) AS m, c FROM tok)
       |SELECT doc_id, concat(${(0 until Bits).map(oracleBitTerm).mkString(", ")}) AS simhash
       |FROM h GROUP BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "dd_simhash" -> fingerprintSql,
    "dd_simhash_neardup" ->
      s"""WITH fp AS ($fingerprintSql)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       hamming(a.simhash, b.simhash) AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE hamming(a.simhash, b.simhash) <= $HammingMax""".stripMargin)
}
