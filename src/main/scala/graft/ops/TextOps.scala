package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation (north-star extension):
  * token counting, quality scoring, n-gram-heuristic language ID, and
  * content fingerprinting over `documents`.
  *
  * Every computation here is a projection or single aggregation over the
  * scan — embarrassingly parallel, no shuffle except the final group-bys
  * — and is written with expressions shared verbatim between Spark SQL
  * and the DuckDB oracle (regex character classes restricted to the
  * ASCII subset both dialects treat identically).
  */
object TextOps {

  /** BPE-ish token pattern: alnum runs or single non-space symbols.
    * Deliberately backslash-free: Spark SQL string literals treat `\` as
    * an escape while DuckDB's don't, so `\s` would silently become `s`
    * on the Spark side only.
    */
  val TokenPattern = "[a-zA-Z0-9]+|[^a-zA-Z0-9 ]"

  /** Tiny stopword profiles for the language-ID heuristic. The corpus
    * text is synthetic English-ish word salad, so `en` dominates — the
    * point is the operator shape: N profile scores + deterministic
    * argmax, the standard cheap lang-ID used before model-based ID in
    * data pipelines.
    */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "une", "et", "est"),
    "zh" -> Seq("的", "了", "是"))

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  private[ops] val wsSplitSpark = "split(text, ' ')"
  private val wsSplitDuck = "string_split(text, ' ')"

  /** Token counts: whitespace tokens and BPE-ish regex tokens. */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).selectExpr(
      "doc_id",
      s"CAST(size($wsSplitSpark) AS BIGINT) AS n_ws_tokens",
      s"CAST(size(regexp_extract_all(text, '$TokenPattern', 0)) AS BIGINT) AS n_re_tokens",
      "CAST(length(text) AS BIGINT) AS n_chars_obs")

  /** Token budget per training shard for [[packShards]]. */
  val ShardBudget = 2000

  /** Docs per prefix-sum block in [[packBySource]]. 128 exercises the
    * multi-block path at every test SF; a production run sizes it so a
    * block's rows fit one task comfortably (e.g. 2^20).
    */
  val PackBlock = 128

  /** Greedy sequential shard packing: assign each doc (in doc_id order,
    * independently per source) to the training shard its running token
    * offset falls in — `shard = floor(start_offset / budget)`, the
    * data-parallel approximation of context-window packing every
    * pre-training data pipeline runs before tokenization.
    */
  def packShards(spark: SparkSession, sfDir: String): DataFrame =
    packBySource(Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "source",
        s"CAST(size($wsSplitSpark) AS BIGINT) AS n_tokens"))

  /** The per-source running-sum shard assignment over a
    * (doc_id, source, n_tokens) relation, as a TWO-LEVEL prefix sum.
    * A single `sum OVER (PARTITION BY source ORDER BY doc_id)` puts
    * each source's entire history in ONE window task — and at 100 TB
    * one source ("web") IS the corpus, so per-source parallelism alone
    * is a single-task bottleneck. Instead: docs fold into
    * [[PackBlock]]-sized blocks by `doc_id div block`; block token
    * totals prefix-sum per source (rows = |corpus|/block — tiny);
    * each block's in-block running sum then adds its block offset.
    * The result is bit-identical to the single-window form (same
    * total order), but every window task holds ≤ block rows — the
    * classic scan-then-offset parallel prefix sum. Output:
    * (doc_id, source, n_tokens, shard).
    */
  private[ops] def packBySource(docs: DataFrame): DataFrame = {
    val base = docs.withColumn("blk", expr(s"doc_id div $PackBlock"))
    val offsets = base.groupBy(col("source"), col("blk"))
      .agg(sum(col("n_tokens")).as("blk_tot"))
      .withColumn("blk_off",
        sum(col("blk_tot")).over(
          Window.partitionBy(col("source")).orderBy(col("blk"))) - col("blk_tot"))
      .select(col("source"), col("blk"), col("blk_off"))
    base
      .withColumn("cum_in",
        sum(col("n_tokens")).over(
          Window.partitionBy(col("source"), col("blk")).orderBy(col("doc_id"))))
      .join(broadcast(offsets), Seq("source", "blk"))
      .selectExpr("doc_id", "source", "n_tokens",
        s"CAST((blk_off + cum_in - n_tokens) div $ShardBudget AS BIGINT) AS shard")
  }

  /** Quality scoring: length, mean word length, stopword ratio, and a
    * composite score — the usual pre-training heuristics (length filters
    * + stopword-density filters).
    */
  def qualityScores(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = inList(Profiles.head._2)
    Tables.documents(spark, sfDir).selectExpr(
      "doc_id",
      "CAST(length(text) AS BIGINT) AS n_chars_obs",
      s"CAST(size($wsSplitSpark) AS BIGINT) AS n_tokens",
      s"round((length(text) - size($wsSplitSpark) + 1) / CAST(size($wsSplitSpark) AS DOUBLE), 4) AS avg_word_len",
      s"round(size(filter($wsSplitSpark, w -> w IN $stop)) / CAST(size($wsSplitSpark) AS DOUBLE), 4) AS stopword_ratio",
      s"""round(ln(1 + size($wsSplitSpark)) *
         | (1.0 - size(filter($wsSplitSpark, w -> w IN $stop)) / CAST(size($wsSplitSpark) AS DOUBLE)), 4) AS quality_score""".stripMargin)
  }

  /** Language ID: per-profile stopword hit counts + deterministic argmax
    * (first profile in declaration order wins ties).
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val scoreCols = Profiles.map { case (l, ws) =>
      s"CAST(size(filter($wsSplitSpark, w -> w IN ${inList(ws)})) AS BIGINT) AS s_$l"
    }
    val langs = Profiles.map(_._1)
    val pred = langs.map { l =>
      val others = langs.filterNot(_ == l).map(o => s"s_$o")
      s"WHEN s_$l >= greatest(${others.mkString(", ")}) THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    val outCols = Seq("doc_id", "declared_lang") ++
      Profiles.map(p => s"s_${p._1}") :+ s"$pred AS pred_lang"
    Tables.documents(spark, sfDir)
      .selectExpr(Seq("doc_id", "lang AS declared_lang") ++ scoreCols: _*)
      .selectExpr(outCols: _*)
  }

  /** Content fingerprint: md5 of the normalized text (lowercase, strip
    * non-alnum, collapse runs of spaces) — the canonicalization step of
    * exact-dedup-after-cleanup.
    */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).selectExpr(
      "doc_id",
      """md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), '  +', ' '))) AS fp""")

  /** Rolling-hash winnowing fingerprint: min/max xxhash64 over all
    * 8-char windows of the text (rows-only: xxhash64 is Spark-native).
    * The min-hash of character shingles is the sketch behind
    * plagiarism-style containment detection.
    */
  def winnowFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 8)
      .selectExpr("doc_id",
        "transform(sequence(1, length(text) - 7), i -> xxhash64(substr(text, i, 8))) AS hs")
      .selectExpr("doc_id",
        "array_min(hs) AS win_min", "array_max(hs) AS win_max",
        "CAST(size(hs) AS BIGINT) AS n_windows")

  /** Top-20 word bigrams across the corpus (n-gram frequency table —
    * the vocabulary/statistics pass of corpus analysis). Deterministic
    * top-k via (count desc, bigram asc).
    */
  def topBigrams(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat_ws(' ', t[i], t[i+1]))")).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(20)

  /** TF-IDF: top-3 most characteristic terms per document. Term
    * frequency and document frequency are integers, so the weight
    * `tf · ln(N/df)` is one deterministic float op per row; ranking uses
    * the 6dp-rounded weight with the term as tie-break (libm vs JVM
    * `ln` can differ in the last ulp, which rounding absorbs).
    */
  def tfidfTopTerms(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val tok = d.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val df = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val n = d.select(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("w").asc)
    tok.join(broadcast(df), "w")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("w"), col("tf"), col("df"), col("tfidf"), col("rnk"))
  }

  /** Repetition-based quality filters (the duplicated-n-gram family of
    * pretraining curation rules): fraction of repeated bigrams and the
    * share of the single most frequent token. Integer counts + one
    * division per row — engine-exact at 6dp.
    */
  def repetitionStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "split(text, ' ') AS t")
      .filter(expr("size(t) >= 2"))
      .selectExpr("doc_id", "t",
        "transform(sequence(0, size(t) - 2), i -> concat_ws(' ', t[i], t[i+1])) AS bg")
      .selectExpr(
        "doc_id",
        "CAST(size(bg) AS BIGINT) AS n_bigrams",
        "CAST(size(array_distinct(bg)) AS BIGINT) AS distinct_bigrams",
        "round(1.0 - size(array_distinct(bg)) / CAST(size(bg) AS DOUBLE), 6) AS dup_bigram_frac",
        """round(aggregate(array_distinct(t),
          |  0L, (acc, w) -> greatest(acc, CAST(size(filter(t, x -> x = w)) AS BIGINT)))
          |  / CAST(size(t) AS DOUBLE), 6) AS top_token_share""".stripMargin)

  /** Oracle-checkable winnowing: min/max 16-bit md5 bucket over all
    * 8-char windows (the xxhash64 variant in `winnowFingerprints` is
    * faster but Spark-only; this one shares its hash construction with
    * `Sampling.md5Bucket16Sql` so DuckDB reproduces it exactly).
    */
  def winnowMd5(spark: SparkSession, sfDir: String): DataFrame = {
    val nib = (i: String, n: Int) =>
      s"(CASE WHEN ascii(substr(md5(substr(text, $i, 8)), $n, 1)) <= 57 " +
        s"THEN ascii(substr(md5(substr(text, $i, 8)), $n, 1)) - 48 " +
        s"ELSE ascii(substr(md5(substr(text, $i, 8)), $n, 1)) - 87 END)"
    val bucket = s"(${nib("i", 1)} * 4096 + ${nib("i", 2)} * 256 + ${nib("i", 3)} * 16 + ${nib("i", 4)})"
    Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 8)
      .selectExpr("doc_id",
        s"transform(sequence(1, length(text) - 7), i -> $bucket) AS hs")
      .selectExpr("doc_id",
        "CAST(array_min(hs) AS BIGINT) AS win_min",
        "CAST(array_max(hs) AS BIGINT) AS win_max",
        "CAST(size(hs) AS BIGINT) AS n_windows")
  }

  /** Winnowing window: one fingerprint is selected from every run of
    * `WinnowW` consecutive k-gram hashes.
    */
  val WinnowW = 8

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Robust winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): slide a
    * w-hash window over the k-gram hash sequence and keep each window's
    * minimum (leftmost on ties — a deterministic variant of the paper's
    * rightmost rule; the guarantee that any shared run of w+k-1 chars
    * yields a shared fingerprint is unchanged). Output is the distinct
    * fingerprint set (doc_id, pos, h) — the sketch behind MOSS-style
    * containment detection, with expected density 2/(w+1) vs the global
    * min/max of `winnowMd5`.
    *
    * Implementation is the at-scale shape: one narrow scan, no shuffle,
    * and a monotonic-deque rolling minimum per document — O(n) per doc
    * where the pure-expression form (nested `slice`+`array_min` per
    * window, which the DuckDB oracle still uses) is O(n·w) with two
    * array allocations per window (measured 20s → 0.4s at sf0.1). The
    * hash is the first 16 bits of md5 of each 8-char window, identical
    * to the oracle's `ascii(substr(md5(...)))` nibble arithmetic.
    */
  def winnowRobust(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    winnowRobustOf(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)])
      .select(col("doc_id"), col("pos"), col("h"))
  }

  /** The winnowing kernel over any (doc_id, text) dataset — separated
    * so the SIGMOD guarantee is testable on constructed documents.
    */
  def winnowRobustOf(docs: org.apache.spark.sql.Dataset[(Long, String)],
      k: Int = 8, w: Int = WinnowW, withFp: Boolean = false): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .mapPartitions { it =>
        // one digest instance per partition (the open-once pattern)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          // iterate CODEPOINTS, not UTF-16 units — SQL length/substr are
          // codepoint-based, and a non-BMP char would otherwise shift
          // every window against the DuckDB oracle
          val cps = text.codePoints().toArray
          val n = cps.length - k + 1
          if (n < w) Iterator.empty
          else {
            val hs = new Array[Int](n)
            var i = 0
            while (i < n) {
              md.reset()
              val d = md.digest(new String(cps, i, k).getBytes("UTF-8"))
              hs(i) = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
              i += 1
            }
            // sliding-window minimum; equal values keep the earlier
            // position at the front => leftmost-tie selection
            val sel = collection.mutable.LinkedHashSet.empty[Int]
            val deque = new java.util.ArrayDeque[Int]()
            var j = 0
            while (j < n) {
              while (!deque.isEmpty && hs(deque.peekLast) > hs(j)) deque.pollLast()
              deque.addLast(j)
              val start = j - w + 1
              if (start >= 0) {
                while (deque.peekFirst < start) deque.pollFirst()
                sel += deque.peekFirst
              }
              j += 1
            }
            sel.iterator.map { p =>
              // full gram digest only for SELECTED positions (~n/w per
              // doc) and only when asked (withFp): the 16-bit bucket
              // drives winnowing, but cross-doc passage matching needs
              // a collision-free fingerprint
              val fp = if (!withFp) "" else {
                md.reset()
                val d = md.digest(new String(cps, p, k).getBytes("UTF-8"))
                val hex = new Array[Char](d.length * 2)
                var b = 0
                while (b < d.length) {
                  hex(b * 2) = HexDigits((d(b) >>> 4) & 0xf)
                  hex(b * 2 + 1) = HexDigits(d(b) & 0xf)
                  b += 1
                }
                new String(hex)
              }
              (id, (p + 1).toLong, hs(p).toLong, fp)
            }
          }
        }
      }
      .toDF("doc_id", "pos", "h", "fp")
  }

  /** Hot-fingerprint cap for [[passageOverlapPairs]]: a winnowed gram
    * shared by more than this many docs is boilerplate (headers,
    * license blocks), carries no pairing signal, and would dominate the
    * fingerprint self-join — same reasoning as `Dedup.MaxShingleFreq`.
    */
  val PassageFpMaxFreq = 1000L

  /** Passage-matching gram/window sizes. The 8-char winnow gram of
    * `tx_winnow_robust` is ~1.5 words — right for per-doc sketching,
    * quadratically noisy as a cross-doc join key (common word pairs
    * collide corpus-wide). Passage matching hashes 32-char grams
    * winnowed over 16-windows: a match witnesses a ≥ 32-char verbatim
    * run, and any shared run of 32+16-1 = 47 chars is guaranteed a
    * shared selected fingerprint — copying signal, not phrase reuse.
    */
  val PassageGram = 32
  val PassageWindow = 16

  /** Pairs must share at least this many winnowed fingerprints — one
    * shared 8-gram is noise; two selected fingerprints witness either a
    * ≥ w+k-1-char shared run or two independent shared grams.
    */
  val MinSharedFps = 2L

  /** Passage-level duplicate pairs: docs sharing ≥ [[MinSharedFps]]
    * winnowed gram fingerprints, with the containment fraction
    * `|shared| / min(|fps_a|, |fps_b|)` — the distributed stand-in for
    * suffix-array substring dedup (winnowing guarantees any shared run
    * of w+k-1 chars contributes a shared fingerprint, so long copied
    * passages are caught even when the documents as a whole are not
    * near-dups; whole-doc Jaccard misses a verbatim paragraph pasted
    * into an otherwise-unrelated page). Scale shape: the per-doc
    * fingerprint relation is |text|/w rows (not |text|), the hot-fp cap
    * bounds the self-join fan-out per key, and everything else is
    * key-partitioned join+agg.
    */
  def passageOverlapPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    passageOverlapOf(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)])
  }

  /** The passage-overlap kernel over any (doc_id, text) dataset —
    * separated so the winnowing run-coverage guarantee is testable on
    * planted shared passages.
    */
  def passageOverlapOf(docs: org.apache.spark.sql.Dataset[(Long, String)]): DataFrame = {
    // the winnow kernel is CPU-bound (one digest per codepoint) and
    // runs at input-split granularity; a small dense file yields fewer
    // splits than cores and serializes the hashing, so rebalance only
    // in that case — at production split counts this is a no-op, never
    // a corpus-wide text shuffle
    val sc = docs.sparkSession.sparkContext
    val spread =
      if (docs.rdd.getNumPartitions < sc.defaultParallelism)
        docs.repartition(sc.defaultParallelism)
      else docs
    // cache the per-doc fingerprint relation (~|corpus|/w rows): it
    // feeds the hot-fp count, both self-join sides, and the size agg —
    // uncached, the mapPartitions winnow kernel re-runs for each
    val f = winnowRobustOf(spread, k = PassageGram, w = PassageWindow, withFp = true)
      .select(col("doc_id"), col("fp")).distinct().cache()
    val hot = f.groupBy(col("fp")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") > PassageFpMaxFreq)
      .select(col("fp"))
    val capped = f.join(broadcast(hot), Seq("fp"), "left_anti")
    val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    capped.as("a").join(capped.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFps)
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_fp").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_fp").as("n_b")), "doc_b")
      .withColumn("containment",
        round(col("n_shared") / least(col("n_a"), col("n_b")), 6))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("n_a"), col("n_b"), col("containment"))
  }

  /** Benchmark doc_ids for the decontamination check (stand-in for an
    * eval set's documents).
    */
  val BenchmarkMaxId = 5L

  /** Eval-set decontamination: flag every corpus document sharing at
    * least one 5-word shingle with the "benchmark" documents (ids <
    * `BenchmarkMaxId`) — the overlap scan run before training to keep
    * eval data out of the corpus. Shape: the benchmark shingle set is
    * tiny by construction → broadcast semi-ish join against it; the
    * corpus side is the one shingle explosion.
    */
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = Dedup.shingles(spark, sfDir)
    val benchSh = sh.filter(col("doc_id") < BenchmarkMaxId)
      .select(col("s")).distinct()
    sh.filter(col("doc_id") >= BenchmarkMaxId)
      .join(broadcast(benchSh), "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_shingles"))
  }

  /** Curation policy verdict: fold the quality signals into one
    * keep/drop decision with a first-match reason — the executable form
    * of a filtering recipe (length floor, repetition cap, stopword-band
    * sanity check).
    */
  def filterVerdict(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = inList(Profiles.head._2)
    Tables.documents(spark, sfDir).selectExpr(
      "doc_id",
      s"CAST(size($wsSplitSpark) AS BIGINT) AS n_tokens",
      s"""CASE
         | WHEN size($wsSplitSpark) < 10 THEN 'too_short'
         | WHEN size(array_distinct($wsSplitSpark)) / CAST(size($wsSplitSpark) AS DOUBLE) < 0.3
         |   THEN 'too_repetitive'
         | WHEN size(filter($wsSplitSpark, w -> w IN $stop)) / CAST(size($wsSplitSpark) AS DOUBLE) > 0.7
         |   THEN 'stopword_soup'
         | ELSE 'keep' END AS verdict""".stripMargin)
      .withColumn("keep", col("verdict") === "keep")
  }

  val ChunkTokens = 64
  val ChunkStride = 48

  /** Fixed-size token chunking with overlap (stride < chunk size) —
    * the document→training-window explosion. Chunk text is emitted as a
    * content hash so the oracle compares exact chunk boundaries without
    * megabytes of repeated text.
    */
  def chunking(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "split(text, ' ') AS t")
      .selectExpr("doc_id", "t",
        s"posexplode(sequence(0, size(t) - 1, $ChunkStride)) AS (chunk_idx, start)")
      .selectExpr(
        "doc_id",
        "CAST(chunk_idx AS BIGINT) AS chunk_idx",
        "CAST(start AS BIGINT) AS chunk_start",
        s"CAST(size(slice(t, start + 1, $ChunkTokens)) AS BIGINT) AS n_chunk_tokens",
        s"md5(array_join(slice(t, start + 1, $ChunkTokens), ' ')) AS chunk_hash")

  /** Unigram LM-proxy quality score: each document's mean log
    * corpus-probability over its tokens — the cheap stand-in for the
    * LM-perplexity filter of corpus curation (a doc of globally-rare
    * tokens scores low; formulaic boilerplate scores high). Two
    * aggregations and one token→frequency equi-join; the vocabulary
    * relation is corpus-bounded and the join key is the token, so at
    * 100 TB this is a standard skew-aware shuffle join (AQE splits the
    * stopword-heavy buckets). Parity hygiene: `ln` is rounded per
    * token at 8dp BEFORE the mean so both engines average identical
    * values, and the mean itself is rounded at 4dp to absorb
    * summation-order noise.
    */
  def unigramLogprob(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val tok = d.select(col("doc_id"),
      explode(expr(wsSplitSpark)).as("w"))
    val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("cf"))
    val total = tok.agg(count(lit(1)).as("n_total"))
    tok.join(freq, Seq("w"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        expr("round(avg(round(ln(CAST(cf AS DOUBLE) / n_total), 8)), 4)")
          .as("avg_logprob"))
  }

  /** CCNet-style LM quality scoring, upgraded from the unigram proxy
    * ([[unigramLogprob]]) to a corpus-trained BIGRAM model with add-k
    * smoothing (Wenzek et al. 2020 filter on LM perplexity; Jurafsky &
    * Martin ch. 3 for the estimator): each document's mean negative
    * log-likelihood over its bigrams,
    * `p(w|prev) = (c(prev,w) + k) / (c(prev) + k·V)`, k = 0.5 — low
    * `avg_nll` = formulaic/boilerplate text, high = rare-continuation
    * text; curation thresholds on it exactly as CCNet buckets on
    * perplexity (a monotone transform of this score). Training IS the
    * two count aggregations (map-side combinable), scoring is two
    * token-keyed equi-joins (AQE splits stopword-skewed buckets) and
    * the vocabulary size broadcasts as one row — no driver-side model
    * object at any scale. Parity hygiene: per-bigram `ln` rounded at
    * 8dp BEFORE the mean, mean rounded at 4dp (same discipline as
    * [[unigramLogprob]]).
    */
  def bigramNll(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val pairs = d.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 2), " +
          "i -> named_struct('prev', t[i], 'w', t[i+1]))")).as("b"))
      .select(col("doc_id"), col("b.prev").as("prev"), col("b.w").as("w"))
    val cPw = pairs.groupBy(col("prev"), col("w"))
      .agg(count(lit(1)).as("c_pw"))
    val cCtx = pairs.groupBy(col("prev")).agg(count(lit(1)).as("c_ctx"))
    val vocab = d.select(explode(expr(wsSplitSpark)).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    pairs.join(cPw, Seq("prev", "w"))
      .join(cCtx, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("round(avg(round(-ln((CAST(c_pw AS DOUBLE) + 0.5) / " +
          "(CAST(c_ctx AS DOUBLE) + 0.5 * v)), 8)), 4)").as("avg_nll"))
  }

  /** Count-min sketch geometry: [[CmsD]] hash rows of [[CmsW]] counters
    * (16 KiB of longs). Estimate error is bounded by ε·N with
    * ε = e/CmsW ≈ 0.5% of total token mass at fixture sizing, with
    * failure probability e^-CmsD ≈ 2%; production sizing is
    * W = ceil(e/ε), D = ceil(ln(1/δ)).
    */
  val CmsW = 512
  val CmsD = 4

  /** Heavy hitters with count-min-sketch estimates: the exact top-20
    * tokens (count desc, token asc) each paired with the count the CMS
    * would report. The sketch is the Bloom filter's counting sibling
    * and needs NO custom aggregator: the counter table is a plain
    * `groupBy(row, position).count()` — map-side combinable by
    * construction, so a 100 TB corpus shuffles ≤ CmsD·CmsW counter rows
    * per map partition — and estimates are a broadcast join + `min`
    * over the [[CmsD]] Kirsch–Mitzenmacher positions (same md5 h1/h2
    * stream as the Bloom path, so DuckDB replays every counter and the
    * estimate itself is hash-checked). CMS never underestimates:
    * `est_count ≥ n_exact` always, with overshoot bounded by colliding
    * token mass — `SketchSpec` pins both.
    */
  def heavyHittersCms(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(explode(expr(wsSplitSpark)).as("w"))
    val withHashes = (df: DataFrame) => df
      .withColumn("h1", expr("CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("h2", expr("CAST(conv(substr(md5(w), 17, 14), 16, 10) AS BIGINT)"))
    val jp = s"transform(sequence(0, ${CmsD - 1}), " +
      s"j -> named_struct('j', j, 'pos', (h1 + j * h2) % $CmsW))"
    val counters = withHashes(tok)
      .select(explode(expr(jp)).as("jp"))
      .select(col("jp.j").as("j"), col("jp.pos").as("pos"))
      .groupBy(col("j"), col("pos"))
      .agg(count(lit(1)).as("c"))
    val top = tok.groupBy(col("w")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("w").asc)
      .limit(20)
    withHashes(top)
      .select(col("w").as("token"), col("n_exact"), explode(expr(jp)).as("jp"))
      .select(col("token"), col("n_exact"),
        col("jp.j").as("j"), col("jp.pos").as("pos"))
      .join(broadcast(counters), Seq("j", "pos"))
      .groupBy(col("token"), col("n_exact"))
      .agg(min(col("c")).as("est_count"))
  }

  /** The end-to-end curation pipeline as ONE query — the composition a
    * training-data run actually executes, each stage the already-
    * oracle-checked operator:
    *   1. policy filter (the [[filterVerdict]] keep rule),
    *   2. exact dedup among kept docs (min-doc_id survivor per content
    *      digest, [[graft.ops.Dedup.exactSurvivors]]'s rule),
    *   3. eval-set decontamination (drop docs sharing any 5-shingle
    *      with the benchmark docs, [[decontaminate]]'s rule; benchmark
    *      docs themselves never ship),
    *   4. greedy per-source shard packing ([[packShards]]).
    * One doc scan feeds stages 1-2; the shingle explosion runs only for
    * stage 3; packing windows per source. At 100 TB: digest groupBy is
    * one shuffle, the benchmark shingle set broadcasts, the
    * contaminated-id set anti-joins (no distinct needed — anti join
    * ignores right-side duplicates), and packing is the two-level
    * prefix sum of [[packBySource]] — parallel even when one source is
    * the whole corpus. Output: the shipped shard manifest.
    */
  def curationPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = inList(Profiles.head._2)
    val kept = Tables.documents(spark, sfDir).selectExpr(
        "doc_id", "source", "text",
        s"CAST(size($wsSplitSpark) AS BIGINT) AS n_tokens",
        s"""CASE
           | WHEN size($wsSplitSpark) < 10 THEN 'too_short'
           | WHEN size(array_distinct($wsSplitSpark)) / CAST(size($wsSplitSpark) AS DOUBLE) < 0.3
           |   THEN 'too_repetitive'
           | WHEN size(filter($wsSplitSpark, w -> w IN $stop)) / CAST(size($wsSplitSpark) AS DOUBLE) > 0.7
           |   THEN 'stopword_soup'
           | ELSE 'keep' END AS verdict""".stripMargin)
      .filter(col("verdict") === "keep")
    val survivorIds = kept.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val survivors = kept.join(survivorIds, Seq("doc_id"), "left_semi")
    val sh = Dedup.shingles(spark, sfDir)
    val benchSh = sh.filter(col("doc_id") < BenchmarkMaxId)
      .select(col("s")).distinct()
    val contaminated = sh.filter(col("doc_id") >= BenchmarkMaxId)
      .join(broadcast(benchSh), "s")
      .select(col("doc_id"))
    packBySource(survivors
      .filter(col("doc_id") >= BenchmarkMaxId)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_tokens")))
  }

  /** Corpus stats rollup per (lang, source): the curation dashboard
    * aggregation.
    */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        round(avg(length(col("text"))), 4).as("avg_chars"),
        expr(s"CAST(sum(size($wsSplitSpark)) AS BIGINT) AS total_tokens"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_pack_shards" -> (packShards(_, _)),
    "tx_token_counts" -> (tokenCounts(_, _)),
    "tx_quality" -> (qualityScores(_, _)),
    "tx_langid" -> (langId(_, _)),
    "tx_fingerprint" -> (fingerprints(_, _)),
    "tx_winnow" -> (winnowFingerprints(_, _)),
    "tx_winnow_md5" -> (winnowMd5(_, _)),
    "tx_winnow_robust" -> (winnowRobust(_, _)),
    "dd_passage_overlap" -> (passageOverlapPairs(_, _)),
    "tx_top_bigrams" -> (topBigrams(_, _)),
    "tx_tfidf" -> (tfidfTopTerms(_, _)),
    "tx_repetition" -> (repetitionStats(_, _)),
    "tx_chunking" -> (chunking(_, _)),
    "tx_decontaminate" -> (decontaminate(_, _)),
    "tx_decontaminate_bloom" -> (decontaminateBloom(_, _)),
    "tx_filter_verdict" -> (filterVerdict(_, _)),
    "tx_unigram_logprob" -> (unigramLogprob(_, _)),
    "tx_bigram_nll" -> (bigramNll(_, _)),
    "tx_heavy_hitters_cms" -> (heavyHittersCms(_, _)),
    "tx_curation_pipeline" -> (curationPipeline(_, _)),
    "tx_corpus_stats" -> (corpusStats(_, _)))

  /** Bloom-filter decontamination — the broadcast-membership form of
    * [[decontaminate]]: instead of semi-joining candidates against the
    * benchmark shingle set (a shuffle whose build side grows with the
    * benchmark corpus), the benchmark collapses to an 8 KiB bitmap
    * (`BloomAggregator`) that broadcasts, and each candidate shingle is
    * K map-local bit tests. Flag = all K Kirsch–Mitzenmacher positions
    * set. Output counts flagged shingles per doc — a deterministic
    * superset of the exact overlap count (fp ≈ 2e-5 at this sizing);
    * the exact twin keeps the semantics pinned while THIS query's
    * oracle replays the bit arithmetic itself.
    */
  def decontaminateBloom(spark: SparkSession, sfDir: String): DataFrame =
    decontaminateBloomOf(Dedup.shingles(spark, sfDir))

  /** Bloom decontamination over an arbitrary (doc_id, s) shingle
    * relation — split at [[BenchmarkMaxId]] like the exact path.
    * `mBits` is the filter-size knob (defaults to the fixture sizing;
    * size production builds with `BloomAggregator.sizeFor(n)` from the
    * measured benchmark-set cardinality).
    */
  def decontaminateBloomOf(sh: DataFrame,
      mBits: Int = graft.functions.BloomAggregator.MBits): DataFrame = {
    val k = graft.functions.BloomAggregator.K
    val m = mBits
    val bloom = udaf(new graft.functions.BloomAggregator(mBits))
    val withHashes = (df: DataFrame) => df
      .withColumn("h1", expr("CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("h2", expr("CAST(conv(substr(md5(s), 17, 14), 16, 10) AS BIGINT)"))
    val filter = withHashes(sh.filter(col("doc_id") < BenchmarkMaxId)
        .select(col("s")).distinct())
      .select(explode(expr(s"transform(sequence(0, ${k - 1}), j -> (h1 + j * h2) % $m)")).as("pos"))
      .agg(bloom(col("pos")).as("bloom"))
    withHashes(sh.filter(col("doc_id") >= BenchmarkMaxId))
      .withColumn("poss", expr(s"transform(sequence(0, ${k - 1}), j -> (h1 + j * h2) % $m)"))
      .crossJoin(broadcast(filter))
      .filter(expr(
        """forall(poss, p ->
          | (element_at(bloom, CAST(p DIV 64 AS INT) + 1)
          |  & shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))) != 0)""".stripMargin))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_flagged_shingles"))
  }

  /** DuckDB form of the composite-quality projection (doc_id,
    * quality_score) — shared with `Dedup`'s cluster-survivor oracle so
    * the two stay one definition.
    */
  lazy val qualityScoreDuckSql: String =
    s"""SELECT doc_id, round(ln(1 + len($wsSplitDuck)) *
       | (1.0 - len(list_filter($wsSplitDuck, w -> w IN ${inList(Profiles.head._2)})) / CAST(len($wsSplitDuck) AS DOUBLE)), 4) AS quality_score
       |FROM documents""".stripMargin

  val oracles: Map[String, String] = {
    val stop = inList(Profiles.head._2)
    Map(
      "tx_pack_shards" ->
        s"""SELECT doc_id, source, n_tokens,
           |  CAST((cum - n_tokens) // $ShardBudget AS BIGINT) AS shard
           |FROM (
           |  SELECT doc_id, source, len($wsSplitDuck) AS n_tokens,
           |    sum(len($wsSplitDuck)) OVER (
           |      PARTITION BY source ORDER BY doc_id) AS cum
           |  FROM documents) t""".stripMargin,
      "tx_token_counts" ->
        s"""SELECT doc_id,
           | len($wsSplitDuck) AS n_ws_tokens,
           | len(regexp_extract_all(text, '$TokenPattern')) AS n_re_tokens,
           | length(text) AS n_chars_obs
           |FROM documents""".stripMargin,
      "tx_unigram_logprob" ->
        s"""WITH tok AS (
           |  SELECT doc_id, unnest($wsSplitDuck) AS w FROM documents),
           |freq AS (SELECT w, count(*) AS cf FROM tok GROUP BY w),
           |tot AS (SELECT count(*) AS n_total FROM tok)
           |SELECT doc_id, count(*) AS n_tokens,
           |  round(avg(round(ln(CAST(cf AS DOUBLE) / n_total), 8)), 4) AS avg_logprob
           |FROM tok JOIN freq USING (w), tot
           |GROUP BY doc_id""".stripMargin,
      // the smoothed-bigram estimator replayed verbatim: counts are
      // integers, the per-bigram ln is 8dp-rounded before the 4dp mean
      "tx_bigram_nll" ->
        s"""WITH pairs AS (
           |  SELECT doc_id, b['prev'] AS prev, b['w'] AS w FROM (
           |    SELECT doc_id, unnest(list_transform(
           |      range(len($wsSplitDuck) - 1),
           |      i -> {'prev': $wsSplitDuck[i+1], 'w': $wsSplitDuck[i+2]})) AS b
           |    FROM documents WHERE len($wsSplitDuck) >= 2) t),
           |cpw AS (SELECT prev, w, count(*) AS c_pw FROM pairs GROUP BY 1, 2),
           |cctx AS (SELECT prev, count(*) AS c_ctx FROM pairs GROUP BY 1),
           |vocab AS (SELECT count(DISTINCT w) AS v FROM (
           |  SELECT unnest($wsSplitDuck) AS w FROM documents) u)
           |SELECT doc_id, count(*) AS n_bigrams,
           |  round(avg(round(-ln((CAST(c_pw AS DOUBLE) + 0.5) /
           |    (CAST(c_ctx AS DOUBLE) + 0.5 * v)), 8)), 4) AS avg_nll
           |FROM pairs JOIN cpw USING (prev, w) JOIN cctx USING (prev), vocab
           |GROUP BY doc_id""".stripMargin,
      "tx_quality" ->
        s"""SELECT doc_id,
           | length(text) AS n_chars_obs,
           | len($wsSplitDuck) AS n_tokens,
           | round((length(text) - len($wsSplitDuck) + 1) / CAST(len($wsSplitDuck) AS DOUBLE), 4) AS avg_word_len,
           | round(len(list_filter($wsSplitDuck, w -> w IN $stop)) / CAST(len($wsSplitDuck) AS DOUBLE), 4) AS stopword_ratio,
           | round(ln(1 + len($wsSplitDuck)) *
           |   (1.0 - len(list_filter($wsSplitDuck, w -> w IN $stop)) / CAST(len($wsSplitDuck) AS DOUBLE)), 4) AS quality_score
           |FROM documents""".stripMargin,
      "tx_langid" -> {
        val scoreCols = Profiles.map { case (l, ws) =>
          s"len(list_filter($wsSplitDuck, w -> w IN ${inList(ws)})) AS s_$l"
        }
        val langs = Profiles.map(_._1)
        val pred = langs.map { l =>
          val others = langs.filterNot(_ == l).map(o => s"s_$o")
          s"WHEN s_$l >= greatest(${others.mkString(", ")}) THEN '$l'"
        }.mkString("CASE ", " ", " ELSE 'und' END")
        s"""SELECT doc_id, declared_lang, ${langs.map(l => s"s_$l").mkString(", ")},
           | $pred AS pred_lang
           |FROM (SELECT doc_id, lang AS declared_lang, ${scoreCols.mkString(", ")}
           |      FROM documents) t""".stripMargin
      },
      "tx_fingerprint" ->
        """SELECT doc_id,
          | md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '  +', ' ', 'g'))) AS fp
          |FROM documents""".stripMargin,
      "tx_top_bigrams" ->
        """SELECT bigram, count(*) AS n FROM (
          |  SELECT unnest(list_transform(
          |    range(len(string_split(text, ' ')) - 1),
          |    i -> concat_ws(' ', string_split(text, ' ')[i+1], string_split(text, ' ')[i+2]))) AS bigram
          |  FROM documents WHERE len(string_split(text, ' ')) >= 2) t
          |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
      "tx_winnow_md5" -> {
        val nib = (n: Int) =>
          s"(CASE WHEN ascii(substr(md5(substr(text, i + 1, 8)), $n, 1)) <= 57 " +
            s"THEN ascii(substr(md5(substr(text, i + 1, 8)), $n, 1)) - 48 " +
            s"ELSE ascii(substr(md5(substr(text, i + 1, 8)), $n, 1)) - 87 END)"
        val bucket = s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})"
        s"""SELECT doc_id,
           | CAST(list_min(hs) AS BIGINT) AS win_min,
           | CAST(list_max(hs) AS BIGINT) AS win_max,
           | CAST(len(hs) AS BIGINT) AS n_windows
           |FROM (
           |  SELECT doc_id,
           |    list_transform(range(length(text) - 7), i -> $bucket) AS hs
           |  FROM documents WHERE length(text) >= 8) t""".stripMargin
      },
      "tx_decontaminate" ->
        s"""WITH sh AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(
           |    range(len(string_split(text, ' ')) - ${Dedup.ShingleSize - 1}),
           |    i -> concat_ws(' ', ${(1 to Dedup.ShingleSize).map(j => s"string_split(text, ' ')[i+$j]").mkString(", ")})))) AS s
           |  FROM documents WHERE len(string_split(text, ' ')) >= ${Dedup.ShingleSize})
           |SELECT c.doc_id, count(*) AS n_contaminated_shingles
           |FROM sh c JOIN (SELECT DISTINCT s FROM sh WHERE doc_id < $BenchmarkMaxId) b
           |  ON c.s = b.s
           |WHERE c.doc_id >= $BenchmarkMaxId
           |GROUP BY c.doc_id""".stripMargin,
      "tx_decontaminate_bloom" -> {
        val k = graft.functions.BloomAggregator.K
        val m = graft.functions.BloomAggregator.MBits
        s"""WITH sh AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(
           |    range(len(string_split(text, ' ')) - ${Dedup.ShingleSize - 1}),
           |    i -> concat_ws(' ', ${(1 to Dedup.ShingleSize).map(j => s"string_split(text, ' ')[i+$j]").mkString(", ")})))) AS s
           |  FROM documents WHERE len(string_split(text, ' ')) >= ${Dedup.ShingleSize}),
           |hh AS (
           |  SELECT doc_id, s,
           |    CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h1,
           |    CAST('0x' || substr(md5(s), 17, 14) AS BIGINT) AS h2
           |  FROM sh),
           |benchbits AS (
           |  SELECT DISTINCT (h1 + j * h2) % $m AS b
           |  FROM (SELECT DISTINCT s, h1, h2 FROM hh WHERE doc_id < $BenchmarkMaxId) t,
           |       (SELECT unnest(range(0, $k)) AS j) js),
           |cand AS (
           |  SELECT doc_id, s, j, (h1 + j * h2) % $m AS b
           |  FROM hh, (SELECT unnest(range(0, $k)) AS j) js
           |  WHERE doc_id >= $BenchmarkMaxId)
           |SELECT doc_id, count(*) AS n_flagged_shingles FROM (
           |  SELECT doc_id, s
           |  FROM cand JOIN benchbits USING (b)
           |  GROUP BY doc_id, s
           |  HAVING count(DISTINCT j) = $k) f
           |GROUP BY doc_id""".stripMargin
      },
      "tx_heavy_hitters_cms" -> {
        s"""WITH tok AS (
           |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
           |h AS (
           |  SELECT w,
           |    CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h1,
           |    CAST('0x' || substr(md5(w), 17, 14) AS BIGINT) AS h2
           |  FROM tok),
           |counters AS (
           |  SELECT j, (h1 + j * h2) % $CmsW AS pos, count(*) AS c
           |  FROM h, (SELECT unnest(range(0, $CmsD)) AS j) js
           |  GROUP BY 1, 2),
           |top AS (
           |  SELECT w, count(*) AS n_exact FROM tok GROUP BY w
           |  ORDER BY n_exact DESC, w LIMIT 20),
           |topjp AS (
           |  SELECT t.w, t.n_exact, js.j,
           |    (CAST('0x' || substr(md5(t.w), 1, 15) AS BIGINT)
           |     + js.j * CAST('0x' || substr(md5(t.w), 17, 14) AS BIGINT)) % $CmsW AS pos
           |  FROM top t, (SELECT unnest(range(0, $CmsD)) AS j) js)
           |SELECT w AS token, CAST(n_exact AS BIGINT) AS n_exact,
           |  min(c) AS est_count
           |FROM topjp JOIN counters USING (j, pos)
           |GROUP BY 1, 2""".stripMargin
      },
      "tx_curation_pipeline" -> {
        val verdict =
          s"""CASE
             | WHEN len($wsSplitDuck) < 10 THEN 'too_short'
             | WHEN len(list_distinct($wsSplitDuck)) / CAST(len($wsSplitDuck) AS DOUBLE) < 0.3
             |   THEN 'too_repetitive'
             | WHEN len(list_filter($wsSplitDuck, w -> w IN $stop)) / CAST(len($wsSplitDuck) AS DOUBLE) > 0.7
             |   THEN 'stopword_soup'
             | ELSE 'keep' END""".stripMargin
        s"""WITH v AS (
           |  SELECT doc_id, source, text,
           |    CAST(len($wsSplitDuck) AS BIGINT) AS n_tokens
           |  FROM documents
           |  WHERE ($verdict) = 'keep'),
           |keepers AS (
           |  SELECT min(doc_id) AS doc_id FROM v GROUP BY md5(text)),
           |surv AS (
           |  SELECT v.doc_id, v.source, v.n_tokens
           |  FROM v JOIN keepers USING (doc_id)),
           |sh AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(
           |    range(len(string_split(text, ' ')) - ${Dedup.ShingleSize - 1}),
           |    i -> concat_ws(' ', ${(1 to Dedup.ShingleSize).map(j => s"string_split(text, ' ')[i+$j]").mkString(", ")})))) AS s
           |  FROM documents WHERE len(string_split(text, ' ')) >= ${Dedup.ShingleSize}),
           |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < $BenchmarkMaxId),
           |contam AS (
           |  SELECT DISTINCT c.doc_id FROM sh c JOIN bench b USING (s)
           |  WHERE c.doc_id >= $BenchmarkMaxId)
           |SELECT doc_id, source, n_tokens,
           |  CAST((cum - n_tokens) // $ShardBudget AS BIGINT) AS shard
           |FROM (
           |  SELECT s.doc_id, s.source, s.n_tokens,
           |    sum(s.n_tokens) OVER (PARTITION BY s.source ORDER BY s.doc_id) AS cum
           |  FROM surv s
           |  WHERE s.doc_id >= $BenchmarkMaxId
           |    AND NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = s.doc_id)) t""".stripMargin
      },
      "tx_filter_verdict" -> {
        s"""SELECT doc_id, n_tokens, verdict, (verdict = 'keep') AS keep FROM (
           |  SELECT doc_id,
           |    CAST(len($wsSplitDuck) AS BIGINT) AS n_tokens,
           |    CASE
           |     WHEN len($wsSplitDuck) < 10 THEN 'too_short'
           |     WHEN len(list_distinct($wsSplitDuck)) / CAST(len($wsSplitDuck) AS DOUBLE) < 0.3
           |       THEN 'too_repetitive'
           |     WHEN len(list_filter($wsSplitDuck, w -> w IN $stop)) / CAST(len($wsSplitDuck) AS DOUBLE) > 0.7
           |       THEN 'stopword_soup'
           |     ELSE 'keep' END AS verdict
           |  FROM documents) t""".stripMargin
      },
      "tx_winnow_robust" -> {
        val nib = (n: Int) =>
          s"(CASE WHEN ascii(substr(md5(substr(text, i + 1, 8)), $n, 1)) <= 57 " +
            s"THEN ascii(substr(md5(substr(text, i + 1, 8)), $n, 1)) - 48 " +
            s"ELSE ascii(substr(md5(substr(text, i + 1, 8)), $n, 1)) - 87 END)"
        val bucket = s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})"
        s"""SELECT doc_id,
           | CAST(pos AS BIGINT) AS pos,
           | CAST(hs[CAST(pos AS INT)] AS BIGINT) AS h
           |FROM (
           |  SELECT doc_id, hs, unnest(list_distinct(list_transform(
           |    range(1, len(hs) - ${WinnowW - 2}),
           |    j -> j - 1 + list_position(list_slice(hs, j, j + ${WinnowW - 1}),
           |                               list_min(list_slice(hs, j, j + ${WinnowW - 1})))))) AS pos
           |  FROM (
           |    SELECT doc_id,
           |      list_transform(range(length(text) - 7), i -> $bucket) AS hs
           |    FROM documents WHERE length(text) >= ${8 + WinnowW - 1}) t) u""".stripMargin
      },
      "dd_passage_overlap" -> {
        val nib = (n: Int) =>
          s"(CASE WHEN ascii(substr(md5(substr(text, i + 1, $PassageGram)), $n, 1)) <= 57 " +
            s"THEN ascii(substr(md5(substr(text, i + 1, $PassageGram)), $n, 1)) - 48 " +
            s"ELSE ascii(substr(md5(substr(text, i + 1, $PassageGram)), $n, 1)) - 87 END)"
        val bucket = s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})"
        // same winnowing CTE as tx_winnow_robust (text carried through)
        // at the passage gram/window sizes, then the full gram md5 at
        // each selected 1-based pos
        s"""WITH sel AS (
           |  SELECT doc_id, text, unnest(list_distinct(list_transform(
           |    range(1, len(hs) - ${PassageWindow - 2}),
           |    j -> j - 1 + list_position(list_slice(hs, j, j + ${PassageWindow - 1}),
           |                               list_min(list_slice(hs, j, j + ${PassageWindow - 1})))))) AS pos
           |  FROM (
           |    SELECT doc_id, text,
           |      list_transform(range(length(text) - ${PassageGram - 1}), i -> $bucket) AS hs
           |    FROM documents WHERE length(text) >= ${PassageGram + PassageWindow - 1}) t),
           |f AS (SELECT DISTINCT doc_id, md5(substr(text, CAST(pos AS INT), $PassageGram)) AS fp FROM sel),
           |capped AS (
           |  SELECT doc_id, fp FROM f
           |  WHERE fp NOT IN (SELECT fp FROM f GROUP BY fp HAVING count(*) > $PassageFpMaxFreq)),
           |sizes AS (SELECT doc_id, count(*) AS n_fp FROM capped GROUP BY doc_id),
           |shared AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
           |  FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT doc_a, doc_b, n_shared, sa.n_fp AS n_a, sb.n_fp AS n_b,
           |  round(n_shared / CAST(least(sa.n_fp, sb.n_fp) AS DOUBLE), 6) AS containment
           |FROM shared
           |JOIN sizes sa ON sa.doc_id = doc_a
           |JOIN sizes sb ON sb.doc_id = doc_b
           |WHERE n_shared >= $MinSharedFps""".stripMargin
      },
      "tx_chunking" ->
        s"""SELECT doc_id,
           | CAST(start // $ChunkStride AS BIGINT) AS chunk_idx,
           | CAST(start AS BIGINT) AS chunk_start,
           | len(t[start + 1 : least(start + $ChunkTokens, len(t))]) AS n_chunk_tokens,
           | md5(array_to_string(t[start + 1 : least(start + $ChunkTokens, len(t))], ' ')) AS chunk_hash
           |FROM (
           |  SELECT doc_id, t, unnest(range(0, len(t), $ChunkStride)) AS start
           |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) s) u""".stripMargin,
      "tx_repetition" ->
        """SELECT doc_id,
          | len(bg) AS n_bigrams,
          | len(list_distinct(bg)) AS distinct_bigrams,
          | round(1.0 - len(list_distinct(bg)) / CAST(len(bg) AS DOUBLE), 6) AS dup_bigram_frac,
          | round(list_max(list_transform(list_distinct(t),
          |   w -> len(list_filter(t, x -> x = w)))) / CAST(len(t) AS DOUBLE), 6) AS top_token_share
          |FROM (
          |  SELECT doc_id, t, list_transform(range(len(t) - 1),
          |    i -> concat_ws(' ', t[i+1], t[i+2])) AS bg
          |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) s
          |  WHERE len(t) >= 2) u""".stripMargin,
      "tx_tfidf" ->
        s"""WITH tok AS (
           |  SELECT doc_id, w, count(*) AS tf FROM (
           |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
           |  GROUP BY doc_id, w),
           |dfreq AS (SELECT w, count(*) AS df FROM tok GROUP BY w),
           |n AS (SELECT count(*) AS n_docs FROM documents)
           |SELECT doc_id, w, tf, df, tfidf, rnk FROM (
           |  SELECT tok.doc_id, tok.w, tf, df,
           |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf,
           |    row_number() OVER (PARTITION BY tok.doc_id
           |      ORDER BY round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) DESC, tok.w) AS rnk
           |  FROM tok JOIN dfreq ON tok.w = dfreq.w CROSS JOIN n) r
           |WHERE rnk <= 3""".stripMargin,
      "tx_corpus_stats" ->
        s"""SELECT lang, source, count(*) AS n_docs,
           | CAST(sum(length(text)) AS BIGINT) AS total_chars,
           | round(avg(length(text)), 4) AS avg_chars,
           | CAST(sum(len($wsSplitDuck)) AS BIGINT) AS total_tokens
           |FROM documents GROUP BY lang, source""".stripMargin)
  }
}
