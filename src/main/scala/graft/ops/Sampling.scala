package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampling for training-data curation. Two shapes:
  *
  *   - **Hash-threshold sampling** — keep a row iff a content hash
  *     falls under a threshold. Deterministic, stable across runs,
  *     partitionings, and cluster sizes (the property `rand()` lacks),
  *     and composable: a 10% sample is a superset of a 5% sample. The
  *     hash here is the first 4 md5 nibbles, decoded with the same
  *     ascii arithmetic as `SimHash`, so the oracle reproduces it
  *     exactly.
  *   - **Stratified sampling** — per-stratum fractions via per-stratum
  *     hash thresholds (same determinism properties; oracle-checked).
  */
object Sampling {

  /** Value of the first `nibbles` hex nibbles of md5(col), as shared
    * SQL (same text on both engines). Capped at 6 nibbles (24 bits) so
    * every intermediate product stays within 32-bit int on both
    * engines (Spark would silently wrap, DuckDB would promote — a
    * cross-engine hash mismatch).
    */
  private def md5NibblesSql(column: String, nibbles: Int): String = {
    require(nibbles >= 1 && nibbles <= 6, "1..6 nibbles (int-safe)")
    def nib(i: Int) =
      s"(CASE WHEN ascii(substr(md5($column), $i, 1)) <= 57 " +
        s"THEN ascii(substr(md5($column), $i, 1)) - 48 " +
        s"ELSE ascii(substr(md5($column), $i, 1)) - 87 END)"
    (1 to nibbles)
      .map(i => s"${nib(i)} * ${math.pow(16, nibbles - i).toLong}")
      .mkString("(", " + ", ")")
  }

  /** 16-bit value of the first 4 hex nibbles of md5(col). */
  def md5Bucket16Sql(column: String): String = md5NibblesSql(column, 4)

  /** 24-bit variant — the shard-assignment lattice for the adaptive
    * training shuffle, where the shard count scales with the corpus
    * (16.7M shard capacity ≈ 16.7 trillion docs at the default
    * [[TargetRowsPerShard]] — the 16-bit lattice would alias above
    * 65536 shards).
    */
  def md5Bucket24Sql(column: String): String = md5NibblesSql(column, 6)

  /** ~`permille`/1000 deterministic sample of documents by content
    * hash. Output carries the bucket so the threshold is auditable.
    */
  def hashSample(spark: SparkSession, sfDir: String, permille: Int = 100): DataFrame = {
    val bucket = md5Bucket16Sql("text")
    Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "lang", "n_chars", s"$bucket AS bucket16")
      .filter(expr(s"bucket16 < ${65536L * permille / 1000}"))
  }

  /** Per-stratum sampling fractions (downsample dominant languages —
    * the rebalancing step of corpus curation), as 16-bit thresholds.
    */
  val StratThresholds: Seq[(String, Long)] =
    Seq("en" -> 0.2, "es" -> 0.5, "de" -> 0.5, "fr" -> 1.0, "zh" -> 1.0)
      .map { case (l, f) => l -> (f * 65536).toLong }

  private def stratCaseSql: String =
    StratThresholds.map { case (l, t) => s"WHEN '$l' THEN $t" }
      .mkString("CASE lang ", " ", " ELSE 0 END")

  /** Per-language stratified sample by hash threshold: a row survives
    * iff its content hash falls under its stratum's threshold. Same
    * determinism/composability properties as [[hashSample]] (a raised
    * fraction strictly grows the sample), and — unlike the earlier
    * seeded `sampleBy` Bernoulli draw, whose RNG stream no other engine
    * can replay — exactly reproducible in the DuckDB oracle. The hash
    * input is salted ('st|') so the stratified draw is independent of
    * `samp_hash`'s.
    */
  def stratifiedByLang(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = md5Bucket16Sql("concat('st|', text)")
    Tables.documents(spark, sfDir)
      .filter(expr(s"$bucket < ($stratCaseSql)"))
      .select(col("doc_id"), col("lang"), col("source"))
  }

  // ---- target-mixture resampling ----------------------------------------

  /** Target mixture weights per source (domain mixing): source `srcI`
    * gets weight I+1, so the output distribution ramps linearly across
    * the 20 sources instead of staying uniform like the corpus.
    */
  val MixtureWeights: Seq[(String, Long)] = (0 until 20).map(i => s"src$i" -> (i + 1L))
  val MixtureSumW: Long = MixtureWeights.map(_._2).sum

  private def mixtureWeightCaseSql: String =
    MixtureWeights.map { case (s, w) => s"WHEN '$s' THEN $w" }
      .mkString("CASE source ", " ", " ELSE 0 END")

  /** Resample the corpus to the target source mixture — the domain-mixing
    * step of training-data curation (the fractions are COMPUTED from the
    * data, unlike [[stratifiedByLang]]'s fixed per-stratum rates):
    *
    *   1. count rows per source (tiny aggregate);
    *   2. feasible output size `n_max` = the largest N for which no
    *      source is oversampled: min over sources of
    *      floor(cnt · ΣW / w) — the highest-weight-to-availability
    *      source keeps 100% and every other source downsamples
    *      proportionally, no replication;
    *   3. per-source acceptance threshold on the same deterministic
    *      16-bit content-hash lattice as [[hashSample]].
    *
    * At 100 TB the per-source counts and thresholds are a ~|sources|-row
    * broadcast; the filter itself is one map-side pass with no shuffle.
    * All arithmetic is IEEE-exact double on integer inputs, so the
    * thresholds replay bit-for-bit in the DuckDB oracle.
    */
  def mixtureSample(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val counts = d.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .withColumn("w", expr(mixtureWeightCaseSql))
      .filter(col("w") > 0)
    val budget = counts
      .agg(min(expr(s"CAST(floor(cnt * $MixtureSumW.0 / w) AS BIGINT)")).as("n_max"))
    val thresholds = counts.crossJoin(broadcast(budget))
      .select(col("source"),
        expr(s"CAST(floor(w * n_max * 65536.0 / ($MixtureSumW.0 * cnt)) AS BIGINT)")
          .as("thr"))
    val bucket = md5Bucket16Sql("concat('mx|', text)")
    d.join(broadcast(thresholds), Seq("source"))
      .filter(expr(s"$bucket < thr"))
      .select(col("doc_id"), col("source"), expr(bucket).as("bucket16"))
  }

  /** Temperature-flattened source mixing (the multilingual/multi-domain
    * rebalancing rule of XLM-R-style pretraining, Conneau et al. 2020:
    * sample language s with probability ∝ (n_s)^(1/T)): at T = 2 the
    * per-language keep-rate is `sqrt(n_min / n_s)`, normalized so the
    * smallest language keeps 100% and every larger one downsamples
    * toward — but never to — uniform (expected kept = sqrt(n_min·n_s),
    * still increasing in n_s). The stratum is `lang` — the XLM-R
    * setting, and the corpus axis that is actually imbalanced (sources
    * here are uniform by construction, so a source-keyed temperature
    * draw would be the identity). T is pinned at 2 because `sqrt` is an
    * IEEE-754 CORRECTLY ROUNDED operation (unlike `pow`), so the
    * threshold `floor(65536 · sqrt(n_min) / sqrt(n_s))` — an exact
    * power-of-two scale of one correctly rounded division — replays
    * bit-for-bit in the DuckDB oracle with no rounding hedge. Same
    * deterministic 16-bit content-hash lattice as [[hashSample]]
    * (salt 'tp|' keeps the draw independent of the other samples); at
    * 100 TB the thresholds are a |sources|-row broadcast and the filter
    * is one map-side pass.
    */
  def temperatureSample(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val floorCnt = counts.agg(min(col("cnt")).as("cnt_min"))
    val thresholds = counts.crossJoin(broadcast(floorCnt))
      .selectExpr("lang",
        "CAST(floor(CAST(65536 AS DOUBLE) * sqrt(cnt_min) / sqrt(cnt)) AS BIGINT) AS thr")
    val bucket = md5Bucket16Sql("concat('tp|', text)")
    d.join(broadcast(thresholds), Seq("lang"))
      .filter(expr(s"$bucket < thr"))
      .select(col("doc_id"), col("lang"), expr(bucket).as("bucket16"))
  }

  /** Split-fraction thresholds for [[leakFreeSplit]]: 90/5/5 as 16-bit
    * bucket cutoffs (integer math, identical in both engines).
    */
  val TrainMax: Long = 65536L * 900 / 1000
  val ValMax: Long = 65536L * 950 / 1000

  /** Leakage-free train/val/test split: hash-split on the near-dup
    * CLUSTER id, not the document — a plain per-doc hash split puts two
    * near-duplicates on opposite sides of the train/eval boundary and
    * the eval set silently becomes training data. Every doc gets its
    * component's label (singletons are their own cluster), and the
    * whole cluster lands in one split. The cluster labels come from the
    * same min-label propagation as `dd_clusters` (one extra left join
    * against the corpus; the propagation itself is the measured cost),
    * and the md5 bucket split replays exactly in the oracle.
    */
  /** Token-budget source mixing — the data-recipe step of LLM corpus
    * assembly (set per-source TOKEN shares, not row shares: a source of
    * long documents must not dominate by row-sampling alone). Budget:
    * 1/4 of the corpus's total tokens, split across sources by the
    * [[MixtureWeights]]; each source contributes its docs in the
    * deterministic content-hash order until its token budget is hit.
    *
    * The 100 TB shape is the whole point: NO per-document window. A
    * per-source running token cumsum over documents would put an
    * entire source in one window task. Instead the cumsum runs over
    * the (source, bucket16) HISTOGRAM — at most |sources|·65536 rows
    * whatever the corpus size — and whole buckets are kept while the
    * budget lasts (granularity ≈ corpus/65536 tokens per source, the
    * same lattice every sampler here draws from). Docs re-attach by a
    * broadcast join on (source, bucket16). All arithmetic is integer
    * (BIGINT multiply/divide), so the oracle replays bit-for-bit.
    */
  def tokenBudgetMix(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = md5Bucket16Sql("concat('tb|', text)")
    val d = Tables.documents(spark, sfDir)
      .withColumn("w", expr(mixtureWeightCaseSql))
      .filter(col("w") > 0)
      .withColumn("n_tokens", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
      .withColumn("bucket16", expr(bucket))
    val total = d.agg(sum(col("n_tokens")).as("total_tokens"))
    val kept = d.groupBy(col("source"), col("w"), col("bucket16"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .withColumn("cum_tokens", sum(col("bucket_tokens"))
        .over(Window.partitionBy(col("source")).orderBy(col("bucket16"))))
      .crossJoin(broadcast(total))
      .filter(expr(
        s"cum_tokens <= (total_tokens * w) DIV ${MixtureSumW * 4}"))
      .select(col("source"), col("bucket16"))
    d.join(broadcast(kept), Seq("source", "bucket16"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("bucket16"))
  }

  def leakFreeSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = md5Bucket16Sql("CAST(cluster_id AS STRING)")
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(Dedup.nearDupClusters(spark, sfDir), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .selectExpr("doc_id", "cluster_id", s"$bucket AS bucket16")
      .selectExpr("doc_id", "cluster_id", "bucket16",
        s"""CASE WHEN bucket16 < $TrainMax THEN 'train'
           |     WHEN bucket16 < $ValMax THEN 'val'
           |     ELSE 'test' END AS split""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "samp_hash" -> (hashSample(_, _)),
    "samp_stratified" -> (stratifiedByLang(_, _)),
    "samp_mixture" -> (mixtureSample(_, _)),
    "samp_temperature" -> (temperatureSample(_, _)),
    "samp_token_budget" -> (tokenBudgetMix(_, _)),
    "samp_leakfree_split" -> (leakFreeSplit(_, _)),
    "samp_shuffle_shards" -> (shuffleShards(_, _)),
    "samp_shuffle_shards_fixed" -> (shuffleShardsFixed(_, _)))

  /** Minimum shard count — also the fixed count of the oracle-twin
    * query `samp_shuffle_shards_fixed`.
    */
  val ShuffleShards = 8

  /** Rows an adaptive shard targets. Each shard is sorted by ONE window
    * task, so this bounds that task's input regardless of corpus size —
    * the same role `IvfIndex.adaptiveK`'s √n plays for cell size. ~1M
    * short rows is comfortably executor-sized; the shard count, not the
    * shard size, grows with the corpus.
    */
  val TargetRowsPerShard: Long = 1000000L

  /** `max(`[[ShuffleShards]]`, ceil(n / targetRowsPerShard))` — the
    * corpus-scaled shard count (mirrors `IvfIndex.adaptiveK`).
    */
  def adaptiveShards(n: Long, targetRowsPerShard: Long = TargetRowsPerShard): Long =
    math.max(ShuffleShards.toLong,
      (n + targetRowsPerShard - 1) / targetRowsPerShard)

  /** Deterministic global shuffle into training shards — the step every
    * pre-training pipeline runs between curation and the loader:
    * within-shard document order must look random (no source/time
    * runs), be stable across reruns and cluster sizes, and never
    * require a global sort. Shard = low bits of a salted content-id
    * hash (an even split independent of the `samp_hash` draw); order
    * within a shard = the remaining hash bits. The plan is
    * hash-partition + per-shard window, with NO single global ordering
    * stage anywhere. A loader reading shard files in `pos` order
    * consumes a reproducible permutation.
    *
    * `shards` must come from [[adaptiveShards]] (or a caller-sized
    * equivalent): each shard is one window task sorting n/shards rows,
    * so a constant count would put ~table/shards rows in one task at
    * 100 TB. `SamplingSpec` pins the per-shard row bound on a corpus
    * sized to force more than [[ShuffleShards]] shards.
    */
  def shuffleShardsOf(docs: DataFrame, shards: Long): DataFrame = {
    val h = "md5(concat('shuf|', CAST(doc_id AS STRING)))"
    docs
      .selectExpr("doc_id", s"$h AS shuffle_key",
        s"CAST(${md5Bucket24Sql(s"concat('shuf|', CAST(doc_id AS STRING))")} % $shards AS BIGINT) AS shard")
      .selectExpr("doc_id", "shard",
        "CAST(row_number() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos")
  }

  /** The registered adaptive shuffle: shard count derived from the
    * corpus row count. The count is one cheap parquet-metadata
    * aggregate, and the oracle replays the same `greatest(min,
    * ceil(count/target))` arithmetic in a CTE — so the adaptive query
    * is fully hash-checked at every SF, not rows-only.
    */
  def shuffleShards(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
    shuffleShardsOf(docs, adaptiveShards(docs.count()))
  }

  /** Fixed-count twin (the pre-adaptive form, 16-bit lattice modulo
    * [[ShuffleShards]]): oracle-stable across SFs, kept as the
    * regression witness for the shared shard/window machinery.
    */
  def shuffleShardsFixed(spark: SparkSession, sfDir: String): DataFrame = {
    val h = "md5(concat('shuf|', CAST(doc_id AS STRING)))"
    Tables.documents(spark, sfDir)
      .selectExpr("doc_id", s"$h AS shuffle_key",
        s"CAST(${md5Bucket16Sql(s"concat('shuf|', CAST(doc_id AS STRING))")} % $ShuffleShards AS BIGINT) AS shard")
      .selectExpr("doc_id", "shard",
        "CAST(row_number() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos")
  }

  val oracles: Map[String, String] = Map(
    "samp_shuffle_shards" ->
      s"""WITH ns AS (
         |  SELECT greatest($ShuffleShards,
         |    CAST(ceil(count(*) / $TargetRowsPerShard.0) AS BIGINT)) AS shards
         |  FROM documents)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY md5(concat('shuf|', CAST(doc_id AS STRING))), doc_id) AS BIGINT) AS pos
         |FROM (
         |  SELECT doc_id,
         |    CAST(${md5Bucket24Sql("concat('shuf|', CAST(doc_id AS STRING))")} % ns.shards AS BIGINT) AS shard
         |  FROM documents, ns) t""".stripMargin,
    "samp_shuffle_shards_fixed" ->
      s"""SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY md5(concat('shuf|', CAST(doc_id AS STRING))), doc_id) AS BIGINT) AS pos
         |FROM (
         |  SELECT doc_id,
         |    CAST(${md5Bucket16Sql("concat('shuf|', CAST(doc_id AS STRING))")} % $ShuffleShards AS BIGINT) AS shard
         |  FROM documents) t""".stripMargin,
    "samp_leakfree_split" -> {
      val bucket = md5Bucket16Sql("CAST(cluster_id AS VARCHAR)")
      s"""WITH RECURSIVE
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM (${Dedup.ngramJaccardSql}) p
         |  UNION
         |  SELECT doc_b, doc_a FROM (${Dedup.ngramJaccardSql}) p),
         |reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |labels AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |lab AS (
         |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
         |SELECT doc_id, cluster_id, $bucket AS bucket16,
         |  CASE WHEN $bucket < ${TrainMax} THEN 'train'
         |       WHEN $bucket < ${ValMax} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM lab""".stripMargin
    },
    "samp_hash" ->
      s"""SELECT doc_id, lang, n_chars,
         | ${md5Bucket16Sql("text")} AS bucket16
         |FROM documents
         |WHERE ${md5Bucket16Sql("text")} < ${65536L * 100 / 1000}""".stripMargin,
    "samp_stratified" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${md5Bucket16Sql("concat('st|', text)")} < ($stratCaseSql)""".stripMargin,
    "samp_mixture" ->
      s"""WITH cw AS (
         |  SELECT source, count(*) AS cnt, $mixtureWeightCaseSql AS w
         |  FROM documents GROUP BY source),
         |cwp AS (SELECT * FROM cw WHERE w > 0),
         |budget AS (
         |  SELECT min(CAST(floor(cnt * $MixtureSumW.0 / w) AS BIGINT)) AS n_max
         |  FROM cwp),
         |thr AS (
         |  SELECT source,
         |    CAST(floor(w * n_max * 65536.0 / ($MixtureSumW.0 * cnt)) AS BIGINT) AS thr
         |  FROM cwp, budget)
         |SELECT d.doc_id, d.source,
         |  ${md5Bucket16Sql("concat('mx|', text)")} AS bucket16
         |FROM documents d JOIN thr t ON d.source = t.source
         |WHERE ${md5Bucket16Sql("concat('mx|', text)")} < t.thr""".stripMargin,
    // token-budget mix: integer arithmetic end to end; DuckDB's sum()
    // returns HUGEINT, which multiplies/divides exactly like the
    // Spark-side BIGINTs
    "samp_token_budget" -> {
      val bucket = md5Bucket16Sql("concat('tb|', text)")
      s"""WITH d AS (
         |  SELECT doc_id, source, $mixtureWeightCaseSql AS w,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    $bucket AS bucket16
         |  FROM documents),
         |d2 AS (SELECT * FROM d WHERE w > 0),
         |tot AS (SELECT sum(n_tokens) AS total_tokens FROM d2),
         |histo AS (
         |  SELECT source, w, bucket16, sum(n_tokens) AS bucket_tokens
         |  FROM d2 GROUP BY 1, 2, 3),
         |kept AS (
         |  SELECT source, bucket16 FROM (
         |    SELECT source, w, bucket16,
         |      sum(bucket_tokens) OVER (PARTITION BY source
         |        ORDER BY bucket16) AS cum_tokens
         |    FROM histo) h, tot
         |  WHERE cum_tokens <= (total_tokens * w) // ${MixtureSumW * 4})
         |SELECT doc_id, source, n_tokens, bucket16
         |FROM d2 JOIN kept USING (source, bucket16)""".stripMargin
    },
    "samp_temperature" ->
      s"""WITH cnt AS (
         |  SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
         |mn AS (SELECT min(cnt) AS cnt_min FROM cnt),
         |thr AS (
         |  SELECT lang,
         |    CAST(floor(CAST(65536 AS DOUBLE) * sqrt(cnt_min) / sqrt(cnt)) AS BIGINT) AS thr
         |  FROM cnt, mn)
         |SELECT d.doc_id, d.lang,
         |  ${md5Bucket16Sql("concat('tp|', text)")} AS bucket16
         |FROM documents d JOIN thr t ON d.lang = t.lang
         |WHERE ${md5Bucket16Sql("concat('tp|', text)")} < t.thr""".stripMargin)
}
