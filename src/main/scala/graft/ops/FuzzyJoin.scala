package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Blocked edit-distance self-join over document prefixes — the
  * record-linkage primitive (fuzzy dedup on titles/keys) next to the
  * token-set joins in [[Dedup]] (reference semantics: the same
  * near-duplicate surface as the `dd_*` family, at character rather
  * than token granularity).
  *
  * Blocking is the segment filter (PassJoin): fix the compared string
  * to the first [[PrefLen]] characters, partition it into
  * [[EdK]]`+1` disjoint [[SegLen]]-char segments, and observe that an
  * optimal alignment with ≤ [[EdK]] edits must leave at least one
  * segment untouched (pigeonhole over the k+1 segments), which
  * therefore appears VERBATIM in the partner string at a start
  * position shifted by at most [[EdK]]. So:
  *
  *   - index side: each doc emits its 3 exact segments (seg_id, gram);
  *   - probe side: each doc emits every 8-char substring starting
  *     within ±[[EdK]] of each segment boundary (≤ 15 keys/doc);
  *   - candidates join on (seg_id, gram) equality — an equi-shuffle on
  *     high-entropy 8-char keys, NOT a cartesian — then dedup to
  *     unordered id pairs and confirm with one exact `levenshtein`
  *     call per candidate.
  *
  * The filter is COMPLETE (the theorem guarantees every true pair
  * collides), so the driver's oracle is the plain O(n²) brute-force
  * SQL and the blocked plan must reproduce it row for row — the same
  * "scalable plan, quadratic oracle" contract as `dd_ngram_jaccard`.
  * At 100 TB: emission is linear (≤ 18 rows/doc), the join carries
  * 8-byte ids + 8-char grams, per-candidate confirm is a 24×24 DP;
  * hot segments are bounded by prefix entropy (`FuzzyJoinSpec` pins
  * candidate selectivity, completeness vs brute force, and a planted
  * one-edit pair).
  */
object FuzzyJoin {

  /** Compared prefix length: fixed so both sides have equal length and
    * the segment theorem applies uniformly ([[Tables.documents]]'s
    * n_chars minimum is 48 ≥ PrefLen at every SF; docs shorter than
    * PrefLen are excluded defensively).
    */
  val PrefLen = 24
  /** Edit-distance threshold. */
  val EdK = 2
  /** Segment length: PrefLen / (EdK + 1). */
  val SegLen: Int = PrefLen / (EdK + 1)

  private def prefixes(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("n_chars") >= PrefLen)
      .select(col("doc_id"), expr(s"substring(text, 1, $PrefLen)").as("p"))

  /** Unordered candidate id pairs from the segment filter — exposed for
    * `FuzzyJoinSpec`'s selectivity check.
    */
  private[ops] def candidatePairs(base: DataFrame): DataFrame = {
    val segs = base.select(col("doc_id").as("id_b"),
      explode(expr(s"sequence(0, $EdK)")).as("i"), col("p"))
      .select(col("id_b"), col("i"),
        expr(s"substring(p, i * $SegLen + 1, $SegLen)").as("g"))
    // probe substrings: segment i of the partner may sit shifted by
    // ±EdK, clamped to the prefix bounds
    val probes = base.select(col("doc_id").as("id_a"),
      explode(expr(s"sequence(0, $EdK)")).as("i"), col("p"))
      .select(col("id_a"), col("i"),
        explode(expr(
          s"sequence(greatest(0, i * $SegLen - $EdK)," +
            s" least(${PrefLen - SegLen}, i * $SegLen + $EdK))")).as("pos"),
        col("p"))
      .select(col("id_a"), col("i"),
        expr(s"substring(p, pos + 1, $SegLen)").as("g"))
    probes.join(segs, Seq("i", "g"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
  }

  /** `dd_fuzzy_prefix_ed`: document pairs whose 24-char prefixes are
    * within edit distance [[EdK]], with the distance — segment-blocked
    * plan, brute-force oracle.
    */
  def fuzzyPrefixPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val base = prefixes(spark, sfDir)
    candidatePairs(base)
      .join(base.select(col("doc_id").as("id_a"), col("p").as("pa")), Seq("id_a"))
      .join(base.select(col("doc_id").as("id_b"), col("p").as("pb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pa"), col("pb")).cast("long").as("dist"))
      .filter(col("dist") <= EdK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_fuzzy_prefix_ed" -> (fuzzyPrefixPairs(_, _)))

  val oracles: Map[String, String] = Map(
    "dd_fuzzy_prefix_ed" ->
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(levenshtein(left(a.text, $PrefLen), left(b.text, $PrefLen)) AS BIGINT) AS dist
         |FROM documents a JOIN documents b ON a.doc_id < b.doc_id
         |WHERE a.n_chars >= $PrefLen AND b.n_chars >= $PrefLen
         |  AND levenshtein(left(a.text, $PrefLen), left(b.text, $PrefLen)) <= $EdK""".stripMargin)
}
