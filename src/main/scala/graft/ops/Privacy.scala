package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation. Patterns are
  * deliberately backslash-free (character classes only) so the same
  * literal text compiles identically under Java regex (Spark) and RE2
  * (DuckDB) — see TextOps.TokenPattern for the escaping hazard.
  *
  * Shape: pure projections (detection = `regexp_extract_all` counts,
  * redaction = chained `regexp_replace`), one codegen stage over the
  * scan, trivially parallel at any corpus size. The driver corpus is
  * synthetic word salad with no PII, so the oracle checks pattern
  * parity on real data shape while `PrivacySpec` plants positives.
  */
object Privacy {

  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
  val PhonePattern = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  val Ipv4Pattern = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

  private val patterns = Seq(
    "emails" -> EmailPattern,
    "phones" -> PhonePattern,
    "ips" -> Ipv4Pattern)

  /** Per-document PII hit counts + an overall flag. */
  def detect(df: DataFrame, textCol: String): DataFrame = {
    val counted = patterns.foldLeft(df) { case (d, (name, pat)) =>
      d.withColumn(s"n_$name",
        expr(s"CAST(size(regexp_extract_all($textCol, '$pat', 0)) AS BIGINT)"))
    }
    counted.withColumn("has_pii",
      (patterns.map(p => col(s"n_${p._1}")).reduce(_ + _) > 0).cast("int"))
  }

  /** Replace every PII span with a typed placeholder. */
  def redact(c: Column): Column = {
    val steps = Seq(
      EmailPattern -> "<EMAIL>",
      PhonePattern -> "<PHONE>",
      Ipv4Pattern -> "<IP>")
    steps.foldLeft(c) { case (acc, (pat, tag)) => regexp_replace(acc, pat, tag) }
  }

  def piiScan(spark: SparkSession, sfDir: String): DataFrame =
    detect(Tables.documents(spark, sfDir), "text")
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"), col("has_pii"))

  /** `tx_pii_redact`: the redaction WRITE path over the corpus —
    * every PII span replaced with its typed placeholder, fingerprinted
    * (md5) so the oracle pins the redacted BYTES per document without
    * shipping the text. Spark's `regexp_replace` is replace-all;
    * DuckDB needs the explicit 'g' flag — the twin uses it, so a
    * first-match-only regression on either side hash-mismatches.
    * `PrivacySpec` plants real positives (the driver corpus has none).
    */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(redact(col("text"))).as("redacted_md5"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_pii_scan" -> (piiScan(_, _)),
    "tx_pii_redact" -> (piiRedact(_, _)))

  val oracles: Map[String, String] = Map(
    "tx_pii_scan" ->
      s"""SELECT doc_id,
         | len(regexp_extract_all(text, '$EmailPattern')) AS n_emails,
         | len(regexp_extract_all(text, '$PhonePattern')) AS n_phones,
         | len(regexp_extract_all(text, '$Ipv4Pattern')) AS n_ips,
         | CAST((len(regexp_extract_all(text, '$EmailPattern'))
         |   + len(regexp_extract_all(text, '$PhonePattern'))
         |   + len(regexp_extract_all(text, '$Ipv4Pattern'))) > 0 AS INT) AS has_pii
         |FROM documents""".stripMargin,
    "tx_pii_redact" ->
      s"""SELECT doc_id,
         | md5(regexp_replace(regexp_replace(regexp_replace(text,
         |   '$EmailPattern', '<EMAIL>', 'g'),
         |   '$PhonePattern', '<PHONE>', 'g'),
         |   '$Ipv4Pattern', '<IP>', 'g')) AS redacted_md5
         |FROM documents""".stripMargin)
}
