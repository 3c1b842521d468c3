package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval over the `documents`/`embeddings` corpus: Okapi BM25
  * keyword ranking and reciprocal-rank-fusion hybrid search — the
  * query-side half of a training-data/RAG pipeline (the reference's
  * corpus is the ingest side; retrieval is what the curated corpus is
  * FOR). Public formulas only: BM25 (Robertson/Sparck Jones, TREC-3)
  * and RRF (Cormack/Clarke/Buettcher, SIGIR'09).
  *
  * Exactness contract: every arithmetic step that feeds a ranking is
  * either integer (tf, df, dl — exact in both engines) or a correctly
  * rounded IEEE double op written as the SAME expression text on both
  * engines; the one libm-dependent call (`ln`) can differ in the last
  * ulp, which the 6dp round on the final score absorbs (the `tx_tfidf`
  * precedent). Rankings order by the ROUNDED score with the id as
  * tie-break, so the top-k cut is deterministic cross-engine.
  *
  * Scale notes: BM25 is two passes — one map-side tokenize/count pass,
  * one tiny global aggregate (corpus stats broadcast back) — then a
  * `TakeOrdered` top-k; no shuffle touches document text. The RRF
  * fusion joins two already-top-`RrfDepth` rankings (≤50 rows each), so
  * the single-partition rank windows run on limit-bounded inputs, never
  * on the corpus.
  */
object Retrieval {

  /** Okapi BM25 parameters (the textbook defaults). */
  val K1 = 1.2
  val B = 0.75

  /** Pinned keyword query (terms from the corpus vocabulary, as
    * elsewhere: the pinned query vector is `vec_id = 0`).
    */
  val QueryTerms: Seq[String] = Seq("vector", "merge", "spark")

  val TopK = 20

  /** RRF constant k (SIGIR'09 default) and per-ranking depth. */
  val RrfK = 60
  val RrfDepth = 50

  /** Score arithmetic as shared SQL text over columns
    * (dl, tf_i, df_i, n_docs, avgdl) — one string, both engines. */
  private def idfSql(i: Int): String =
    s"ln(1.0 + (n_docs - df$i + 0.5) / (df$i + 0.5))"

  private def termWeightSql(i: Int): String =
    s"(tf$i * ${K1 + 1} / (tf$i + $K1 * (${1 - B} + $B * (dl / avgdl))))"

  private def scoreSql: String =
    QueryTerms.indices.map(i => s"${idfSql(i)} * ${termWeightSql(i)}")
      .mkString(" + ")

  /** One tokenize pass: (doc_id, dl, tf_i per query term). */
  private def bm25PerDoc(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "split(text, ' ') AS t")
      .selectExpr(
        Seq("doc_id", "CAST(size(t) AS BIGINT) AS dl") ++
          QueryTerms.zipWithIndex.map { case (w, i) =>
            s"CAST(size(filter(t, x -> x = '$w')) AS BIGINT) AS tf$i"
          }: _*)

  /** Score every doc against a one-row stats frame
    * (n_docs, avgdl, df_i) broadcast to the scan. */
  private def scoreAgainst(perDoc: DataFrame, stats: DataFrame): DataFrame =
    perDoc.crossJoin(broadcast(stats))
      .selectExpr("doc_id", s"round($scoreSql, 6) AS score")

  /** Per-document BM25 score for [[QueryTerms]]: one tokenize pass for
    * (dl, tf_i), one corpus-stats aggregate (n_docs, avgdl, df_i — a
    * single broadcast row), one scoring map. */
  private[ops] def bm25Scores(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = bm25PerDoc(spark, sfDir)
    val aggCols = Seq(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl")) ++
      QueryTerms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    scoreAgainst(perDoc, perDoc.agg(aggCols.head, aggCols.tail: _*))
  }

  /** `tx_bm25_topk`: global BM25 top-[[TopK]] for the pinned query —
    * `TakeOrdered(TopK)`, no global sort materialized. */
  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame =
    bm25Scores(spark, sfDir)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(TopK)

  /** Shared RRF-score text (both engines): `row_number` ranks are
    * BIGINT ≥ 1, so each reciprocal is one correctly rounded double
    * division; absent ranks contribute 0. */
  private def rrfScoreSql: String =
    s"round(coalesce(CAST(1.0 AS DOUBLE) / ($RrfK + kw_rank), 0.0)" +
      s" + coalesce(CAST(1.0 AS DOUBLE) / ($RrfK + vec_rank), 0.0), 6)"

  /** `sim_hybrid_rrf`: hybrid retrieval — fuse the BM25 keyword ranking
    * (pinned [[QueryTerms]]) with the dense cosine ranking (pinned query
    * vector `vec_id = 0`) by reciprocal-rank fusion over the top
    * [[RrfDepth]] of each, joined on `doc_id = vec_id`. A document only
    * one ranking surfaced still scores (the outer join); ranks are 0 in
    * the output when that side did not rank it. The rank windows are
    * single-partition BUT limit-bounded: each runs on its ranking's
    * already-cut top-50, never on corpus-sized input.
    */
  def hybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    val kw = bm25Scores(spark, sfDir)
      .orderBy(col("score").desc, col("doc_id").asc).limit(RrfDepth)
      .withColumn("kw_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id").as("id"), col("kw_rank"))
    val vec = Similarity.cosineScores(spark, sfDir)
      .orderBy(col("cos_sim").desc, col("vec_id").asc).limit(RrfDepth)
      .withColumn("vec_rank", row_number()
        .over(Window.orderBy(col("cos_sim").desc, col("vec_id").asc)).cast("long"))
      .select(col("vec_id").as("id"), col("vec_rank"))
    kw.join(vec, Seq("id"), "full_outer")
      .selectExpr(
        "id AS doc_id",
        s"$rrfScoreSql AS rrf_score",
        "CAST(coalesce(kw_rank, 0) AS BIGINT) AS kw_rank",
        "CAST(coalesce(vec_rank, 0) AS BIGINT) AS vec_rank")
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(10)
  }

  /** MMR pool/selection sizes and trade-off (Carbonell/Goldstein,
    * SIGIR'98: next pick = argmax λ·rel − (1−λ)·max-sim-to-selected).
    */
  val MmrPool = 20
  val MmrK = 5
  val MmrLambda = 0.7

  /** The MMR computation as shared SQL text, parameterized only by the
    * cosine rendering (`cosine_sim(a, b)` natively in Spark; the
    * index-order `list_sum` fold in DuckDB) and by how the shortlist is
    * referenced. The selection loop is UNROLLED: k is a fixed constant,
    * so step i is a plain CTE over steps 1..i-1 — no recursion, no
    * driver loop, no collect. The text is split in three (shortlist /
    * pairwise sims / selection steps) because Spark INLINES CTEs: a
    * single WITH would re-run the corpus-scanning shortlist once per
    * reference (~15× here). The Spark runner therefore materializes
    * `cand` and `ps` as cached views — the corpus is touched exactly
    * once — while the oracle, where a few repeated scans of a 500-row
    * table are free, runs the three parts as one WITH chain.
    */
  private def mmrCandSql(cos: (String, String) => String): String =
    s"""SELECT e.vec_id, e.embedding,
       |  round(${cos("e.embedding", "q.qv")}, 4) AS rel
       |FROM embeddings e,
       |  (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
       |WHERE e.vec_id <> 0
       |ORDER BY rel DESC, e.vec_id LIMIT $MmrPool""".stripMargin

  private def mmrPsSql(cos: (String, String) => String, cand: String): String =
    s"""SELECT a.vec_id AS ia, b.vec_id AS ib,
       |  round(${cos("a.embedding", "b.embedding")}, 4) AS sim
       |FROM $cand a, $cand b WHERE a.vec_id <> b.vec_id""".stripMargin

  /** The k selection steps over shortlist `cand` and pairwise sims
    * `ps` — constant-size inputs (pool ≤ [[MmrPool]] rows), so the
    * rerank cost is independent of corpus size. Shared per-step texts:
    * step i reads steps 1..i-1 through `stepRef` — the WITH-chain CTE
    * name in the oracle, a MATERIALIZED (cached) 1-row view in Spark.
    * Materializing per step matters: inlined, step i embeds two copies
    * of step i-1's plan and the unrolled tree grows 2^k (a multi-MiB
    * task binary and seconds of planning for k = 5, measured).
    */
  private def mmrS1Sql(cand: String): String =
    s"""SELECT vec_id, rel, 1 AS pick FROM $cand
       |ORDER BY rel DESC, vec_id LIMIT 1""".stripMargin

  private def mmrStepSql(i: Int, cand: String, ps: String,
      stepRef: Int => String): String = {
    val lam = s"CAST($MmrLambda AS DOUBLE)"
    val oneMinus = s"CAST(${1 - MmrLambda} AS DOUBLE)"
    val sel = (1 until i).map(j => s"SELECT vec_id FROM ${stepRef(j)}")
      .mkString(" UNION ALL ")
    s"""SELECT vec_id, rel, $i AS pick FROM (
       |  SELECT c.vec_id, c.rel,
       |    round($lam * c.rel - $oneMinus * m.msim, 6) AS score
       |  FROM $cand c JOIN (
       |    SELECT ia AS vec_id, max(sim) AS msim FROM $ps
       |    WHERE ib IN ($sel) GROUP BY ia) m
       |    ON c.vec_id = m.vec_id
       |  WHERE c.vec_id NOT IN ($sel)
       |) t ORDER BY score DESC, vec_id LIMIT 1""".stripMargin
  }

  private def mmrUnionSql(stepRef: Int => String): String = {
    val unions = (1 to MmrK).map(i => s"SELECT * FROM ${stepRef(i)}")
      .mkString(" UNION ALL ")
    s"SELECT vec_id, rel, CAST(pick AS BIGINT) AS pick FROM ($unions) r"
  }

  /** `sim_mmr_rerank`: maximal-marginal-relevance diversified top-k —
    * the rerank between retrieval and context assembly that keeps a
    * result list from filling with near-duplicates of the best hit.
    * Runs the shared SQL parts through Spark's own parser, with the
    * shortlist and its pairwise sims cached so each is computed once;
    * the oracle runs the identical parts as one WITH chain in DuckDB.
    */
  def mmrRerank(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val cosN = (a: String, b: String) => s"cosine_sim($a, $b)"
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("embeddings")
    val cand = spark.sql(mmrCandSql(cosN)).cache()
    cand.createOrReplaceTempView("mmr_cand")
    val ps = spark.sql(mmrPsSql(cosN, "mmr_cand")).cache()
    ps.createOrReplaceTempView("mmr_ps")
    val ref = (j: Int) => s"mmr_s$j"
    spark.sql(mmrS1Sql("mmr_cand")).cache().createOrReplaceTempView(ref(1))
    (2 to MmrK).foreach { i =>
      spark.sql(mmrStepSql(i, "mmr_cand", "mmr_ps", ref))
        .cache().createOrReplaceTempView(ref(i))
    }
    spark.sql(mmrUnionSql(ref))
  }

  // ---- inverted index ----------------------------------------------------

  /** Document-side shard count for posting lists. A term's postings are
    * stored as ONE array row per (term, shard), so the shard count —
    * not the corpus — bounds the row size: a stopword's postings at
    * web scale would otherwise be a single multi-GB array. Sharding by
    * doc hash is the document-partitioned layout distributed search
    * engines use; at 100 TB this constant scales with the corpus the
    * way `Sampling.adaptiveShards` does.
    */
  val IndexShards = 8

  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private lazy val indexScratch: java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft-inv")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.etl.FsUtil.deleteRecursively(dir)))
    dir
  }

  /** Build (once per JVM — read-only after) the inverted index as a
    * BucketTable keyed on (term, shard) and BUCKETED BY TERM: the
    * posting lists live in the same table layout the engine uses for
    * every other keyed dataset, and a keyword lookup routes to one
    * bucket per term — never a corpus scan. Postings are doc_id-sorted
    * arrays of (doc_id, tf); the build is one tokenize pass + one
    * shuffle on (term, doc) + one on (term, shard).
    */
  private def postingsIndex(spark: SparkSession, sfDir: String): String =
    indexCache.computeIfAbsent(sfDir, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory(indexScratch, "ix").toString + "/t"
      val postings = postingsOf(Tables.documents(spark, sfDir))
        .withColumn("ver", lit(1L))
      graft.etl.BucketTable.create(postings, dir,
        keys = Seq("term", "shard"), precombine = "ver",
        numBuckets = 16, bucketBy = Seq("term"))
      dir
    })

  /** Test seam: the committed index path (builds it if needed). */
  private[ops] def postingsIndexPathForTest(spark: SparkSession,
      sfDir: String): String = postingsIndex(spark, sfDir)

  /** Per-document length table, stored as a BucketTable keyed on
    * doc_id — the doc-stats sidecar every BM25 serving index keeps.
    * Built once per JVM with the corpus-stats row (n_docs, Σdl) saved
    * alongside as table properties would be; here a 1-row parquet.
    */
  private def docStatsTable(spark: SparkSession, sfDir: String): String =
    indexCache.computeIfAbsent("dl|" + sfDir, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory(indexScratch, "dl").toString
      val dl = Tables.documents(spark, sfDir)
        .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS dl",
          "CAST(1 AS BIGINT) AS ver")
      graft.etl.BucketTable.create(dl, dir + "/t",
        keys = Seq("doc_id"), precombine = "ver", numBuckets = 16)
      dl.agg(count(lit(1)).as("n_docs"),
          (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
            .as("avgdl"))
        .write.mode("errorifexists").parquet(dir + "/stats")
      dir
    })

  /** `tx_bm25_served`: BM25 top-k answered ENTIRELY from committed
    * index artifacts — postings (bucket-pruned reads, one per query
    * term; df recomputed from the posting sizes), the doc-stats
    * sidecar (dl fetched by `lookupMany` for candidate docs only), and
    * the 1-row corpus stats — the raw text is never touched at query
    * time, which is the difference between a search INDEX and a scan.
    * Exactness: only docs carrying ≥1 query term can score > 0, and a
    * zero tf contributes an exact `+ 0.0` to the left-to-right score
    * sum, so scoring candidates with per-term tf coalesced to 0
    * through the SAME [[scoreSql]] text reproduces [[bm25TopK]]'s
    * doubles bit-for-bit (same oracle).
    */
  def bm25Served(spark: SparkSession, sfDir: String): DataFrame = {
    val ix = postingsIndex(spark, sfDir)
    val statsDir = docStatsTable(spark, sfDir)
    val perTerm = QueryTerms.zipWithIndex.map { case (t, i) =>
      graft.etl.BucketTable.lookup(spark, ix, Seq(t))
        .select(explode(col("postings")).as("p"))
        .select(col("p.doc_id").as("doc_id"),
          col("p.tf").as(s"tf$i"))
    }
    val candidates = perTerm.reduce((a, b) => a.join(b, Seq("doc_id"), "full_outer"))
      .selectExpr(
        Seq("doc_id") ++
          QueryTerms.indices.map(i => s"coalesce(tf$i, 0L) AS tf$i"): _*)
    val dfCols = QueryTerms.indices.map(i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val dfs = candidates.agg(dfCols.head, dfCols.tail: _*)
    val corpus = spark.read.parquet(statsDir + "/stats")
    val dl = graft.etl.BucketTable
      .lookupMany(spark, statsDir + "/t", candidates.select(col("doc_id")))
      .select(col("doc_id"), col("dl"))
    candidates.join(dl, Seq("doc_id"))
      .crossJoin(broadcast(dfs))
      .crossJoin(broadcast(corpus))
      .selectExpr("doc_id", s"round($scoreSql, 6) AS score")
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(TopK)
  }

  /** `tx_keyword_lookup`: serve a keyword query from the inverted
    * index — one bucket-pruned point read per query term (the
    * `bucketBy` prefix read), postings exploded back to (term, doc_id,
    * tf). The oracle recomputes the same triples from raw text; the
    * index path must agree exactly, which also proves the build lost
    * nothing.
    */
  def keywordLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val path = postingsIndex(spark, sfDir)
    QueryTerms.map(t => graft.etl.BucketTable.lookup(spark, path, Seq(t)))
      .reduce(_ unionByName _)
      .select(col("term"), explode(col("postings")).as("p"))
      .select(col("term"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
  }

  /** Shared posting-list construction: (term, shard) rows carrying
    * doc_id-sorted (doc_id, tf) arrays. */
  private def postingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("shard", expr(s"pmod(xxhash64(doc_id), $IndexShards)"))
      .groupBy(col("term"), col("shard"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("tf"))))
        .as("postings"))

  /** `tx_keyword_incremental`: the inverted index MAINTAINED, not
    * rebuilt — the index lifecycle every live corpus needs. Build from
    * two thirds of the corpus; when the last third arrives, aggregate
    * ONLY the batch, look up only the touched (term, shard) rows
    * (bucket-routed point reads), merge posting arrays, and upsert —
    * the BucketTable rewrites only the touched buckets (its own
    * partial-rewrite contract), so maintenance is O(batch terms), never
    * a corpus re-tokenize. Serving the query terms afterwards must
    * yield byte-identical triples to the full-corpus oracle — the
    * merge lost nothing.
    */
  def keywordIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = maintainedIndex(spark, sfDir)
    QueryTerms.map(t => graft.etl.BucketTable.lookup(spark, dir, Seq(t)))
      .reduce(_ unionByName _)
      .select(col("term"), explode(col("postings")).as("p"))
      .select(col("term"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
  }

  /** The pinned phrase query (an ordered bigram from the corpus
    * vocabulary) served by the POSITIONAL index. */
  val PhraseTerms: (String, String) = ("vector", "merge")

  /** Positional posting lists — (term, shard) rows carrying
    * (doc_id, positions) arrays, the index layout phrase and proximity
    * queries need. Same doc-sharding and term bucketing as the tf
    * index; positions are 0-based token offsets, sorted.
    */
  private def positionalPostingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos").cast("long"))).as("positions"))
      .withColumn("shard", expr(s"pmod(xxhash64(doc_id), $IndexShards)"))
      .groupBy(col("term"), col("shard"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("positions"))))
        .as("plist"))

  private def positionalIndex(spark: SparkSession, sfDir: String): String =
    indexCache.computeIfAbsent("pos|" + sfDir, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory(indexScratch, "px").toString + "/t"
      graft.etl.BucketTable.create(
        positionalPostingsOf(Tables.documents(spark, sfDir))
          .withColumn("ver", lit(1L)),
        dir, keys = Seq("term", "shard"), precombine = "ver",
        numBuckets = 16, bucketBy = Seq("term"))
      dir
    })

  /** `tx_phrase_search`: phrase ("vector merge") matching served from
    * the positional index — one bucket-pruned point read PER PHRASE
    * TERM (never a text scan), then a doc_id equi-join of the two
    * posting lists and an adjacency intersect (positions of term1,
    * shifted by one, ∩ positions of term2). The oracle recounts
    * adjacent pairs from raw text; parity proves the positional build
    * and the intersect both exact.
    */
  def phraseSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val path = positionalIndex(spark, sfDir)
    def side(term: String, as: String): DataFrame =
      graft.etl.BucketTable.lookup(spark, path, Seq(term))
        .select(explode(col("plist")).as("p"))
        .select(col("p.doc_id").as("doc_id"), col("p.positions").as(as))
    side(PhraseTerms._1, "pos_a")
      .join(side(PhraseTerms._2, "pos_b"), Seq("doc_id"))
      .selectExpr("doc_id",
        "CAST(size(array_intersect(transform(pos_a, x -> x + 1), pos_b)) AS BIGINT) AS n_matches")
      .filter(col("n_matches") > 0)
  }

  /** Create the index table from an initial document set. */
  private[ops] def buildIndexFrom(dir: String, docs: DataFrame): Unit =
    graft.etl.BucketTable.create(
      postingsOf(docs).withColumn("ver", lit(1L)), dir,
      keys = Seq("term", "shard"), precombine = "ver",
      numBuckets = 16, bucketBy = Seq("term"))

  /** Fold a batch of NEW documents into the index: aggregate only the
    * batch, point-read only the touched (term, shard) rows, merge the
    * arrays, upsert — the BucketTable rewrites only the touched
    * buckets (partial-rewrite contract; `RetrievalSpec` pins it on a
    * corpus where the batch's terms are confined).
    */
  private[ops] def maintainIndexWith(spark: SparkSession, dir: String,
      docs: DataFrame): Unit = {
    val p2 = postingsOf(docs)
    val existing = graft.etl.BucketTable
      .lookupMany(spark, dir, p2.select(col("term"), col("shard")))
      .select(col("term"), col("shard"), col("postings").as("old"))
    val merged = p2.join(existing, Seq("term", "shard"), "left")
      .selectExpr("term", "shard",
        // batch docs are new, so the merge is a disjoint array union
        "CASE WHEN old IS NULL THEN postings " +
          "ELSE sort_array(concat(old, postings)) END AS postings",
        "CAST(2 AS BIGINT) AS ver")
    graft.etl.BucketTable.upsertInto(spark, dir, merged)
  }

  /** Remove documents from the inverted index — the text-retrieval
    * half of right-to-be-forgotten (`CALL purge_key` is the table
    * half): tokenize ONLY the deleted docs (a takedown request carries
    * them), point-read only their touched (term, shard) rows, filter
    * the doc out of each posting array, and write back through the
    * partial-rewrite upsert; a posting row emptied entirely is deleted
    * from the index, not left as a zero-length array. Cost is
    * O(deleted docs' terms) — never a corpus re-tokenize, never an
    * index rebuild.
    */
  private[ops] def deleteDocsFromIndex(spark: SparkSession, dir: String,
      docs: DataFrame): Unit = {
    val pd = postingsOf(docs)
    val touched = graft.etl.BucketTable
      .lookupMany(spark, dir, pd.select(col("term"), col("shard")))
      .select(col("term"), col("shard"), col("postings").as("old"))
    val upd = touched.join(
        pd.selectExpr("term", "shard",
          "transform(postings, x -> x.doc_id) AS gone"),
        Seq("term", "shard"))
      .selectExpr("term", "shard",
        "filter(old, x -> NOT array_contains(gone, x.doc_id)) AS postings",
        // strictly above every build/maintain version, so the upsert wins
        "CAST(9 AS BIGINT) AS ver")
    graft.etl.BucketTable.upsertInto(spark, dir,
      upd.filter(size(col("postings")) > 0))
    graft.etl.BucketTable.deleteFrom(spark, dir,
      upd.filter(size(col("postings")) === 0).select(col("term"), col("shard")))
    ()
  }

  /** Deterministic takedown set for `tx_keyword_delete`. */
  val DocTakedownMod = 13

  /** `tx_keyword_delete`: serve the keyword query AFTER a document
    * takedown — build from the full corpus, erase every
    * `doc_id % [[DocTakedownMod]] == 0` document via
    * [[deleteDocsFromIndex]] (touched posting rows only), then serve.
    * The oracle recomputes the triples from the corpus minus the
    * deleted docs, so a purged document leaking back into ANY posting
    * list hash-mismatches; `RetrievalSpec` pins that untouched buckets
    * keep their build-time generation.
    */
  def keywordDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = indexCache.computeIfAbsent("del|" + sfDir, _ => {
      val d = java.nio.file.Files
        .createTempDirectory(indexScratch, "kd").toString + "/t"
      val docs = Tables.documents(spark, sfDir)
      buildIndexFrom(d, docs)
      deleteDocsFromIndex(spark, d,
        docs.filter(pmod(col("doc_id"), lit(DocTakedownMod)) === 0))
      d
    })
    QueryTerms.map(t => graft.etl.BucketTable.lookup(spark, dir, Seq(t)))
      .reduce(_ unionByName _)
      .select(col("term"), explode(col("postings")).as("p"))
      .select(col("term"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
  }

  /** The build-then-maintain lifecycle behind [[keywordIncremental]]
    * (returns the table dir so specs can inspect bucket generations).
    */
  private[ops] def maintainedIndex(spark: SparkSession, sfDir: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(indexScratch, "ki").toString + "/t"
    val d = Tables.documents(spark, sfDir)
    buildIndexFrom(dir, d.filter(pmod(col("doc_id"), lit(3)) =!= 2))
    maintainIndexWith(spark, dir, d.filter(pmod(col("doc_id"), lit(3)) === 2))
    dir
  }

  /** `tx_bm25_incremental`: the BM25 corpus statistics (n_docs, Σdl,
    * per-term df) maintained INCREMENTALLY — three batches (doc_id
    * mod 3) each contribute one O(batch) partial aggregate, merged by
    * plain addition into the running totals (the `p_ivm_rollup`
    * discipline applied to the search index's statistics; at scale a
    * new batch costs one aggregate over the batch plus a constant-size
    * merge, never a corpus re-scan). Scoring reads only the merged
    * one-row totals, and the top-k must be byte-equal to the one-pass
    * [[bm25TopK]] (same oracle) — batch boundaries never leak into the
    * ranking, because every statistic BM25 needs is additive.
    */
  def bm25Incremental(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = bm25PerDoc(spark, sfDir)
    val batchStats = (0 until 3).map { b =>
      val aggCols = Seq(
        count(lit(1)).as("n_docs_b"), sum(col("dl")).as("sum_dl_b")) ++
        QueryTerms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df${i}_b"))
      perDoc.filter(pmod(col("doc_id"), lit(3)) === b)
        .agg(aggCols.head, aggCols.tail: _*)
    }
    val mergeCols = Seq(
      sum(col("n_docs_b")).as("n_docs"),
      (sum(col("sum_dl_b")).cast("double") /
        sum(col("n_docs_b")).cast("double")).as("avgdl")) ++
      QueryTerms.indices.map(i => sum(col(s"df${i}_b")).as(s"df$i"))
    val merged = batchStats.reduce(_ unionByName _)
      .agg(mergeCols.head, mergeCols.tail: _*)
    scoreAgainst(perDoc, merged)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(TopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_bm25_topk" -> (bm25TopK(_, _)),
    "tx_bm25_incremental" -> (bm25Incremental(_, _)),
    "tx_bm25_served" -> (bm25Served(_, _)),
    "tx_keyword_lookup" -> (keywordLookup(_, _)),
    "tx_keyword_incremental" -> (keywordIncremental(_, _)),
    "tx_keyword_delete" -> (keywordDelete(_, _)),
    "tx_phrase_search" -> (phraseSearch(_, _)),
    "sim_hybrid_rrf" -> (hybridRrf(_, _)),
    "sim_mmr_rerank" -> (mmrRerank(_, _)))

  /** DuckDB twins: the same tokenize/stats/score construction with
    * DuckDB's list functions; score/rrf arithmetic is the SAME text as
    * the Spark plan ([[scoreSql]]/[[rrfScoreSql]]). */
  private def bm25Cte: String = {
    val tfs = QueryTerms.zipWithIndex.map { case (w, i) =>
      s"CAST(len(list_filter(t, x -> x = '$w')) AS BIGINT) AS tf$i"
    }.mkString(", ")
    val dfs = QueryTerms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(", ")
    s"""tok AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, $tfs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) s),
       |st AS (
       |  SELECT count(*) AS n_docs,
       |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl, $dfs
       |  FROM tok),
       |scored AS (
       |  SELECT doc_id, round($scoreSql, 6) AS score FROM tok, st)""".stripMargin
  }

  private def keywordLookupSql: String = {
    val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""SELECT w AS term, doc_id, CAST(count(*) AS BIGINT) AS tf
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |      FROM documents) t
       |WHERE w IN ($terms)
       |GROUP BY w, doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "tx_bm25_topk" ->
      s"""WITH $bm25Cte
         |SELECT doc_id, score FROM scored
         |ORDER BY score DESC, doc_id LIMIT $TopK""".stripMargin,
    // the incremental stats are additive integers, so the merged totals
    // and therefore the ranking are EXACTLY the one-pass computation
    "tx_bm25_incremental" ->
      s"""WITH $bm25Cte
         |SELECT doc_id, score FROM scored
         |ORDER BY score DESC, doc_id LIMIT $TopK""".stripMargin,
    // the index-served ranking must equal the corpus-scan ranking
    // (zero-tf terms contribute an exact +0.0 to the score sum)
    "tx_bm25_served" ->
      s"""WITH $bm25Cte
         |SELECT doc_id, score FROM scored
         |ORDER BY score DESC, doc_id LIMIT $TopK""".stripMargin,
    "tx_keyword_lookup" -> keywordLookupSql,
    // maintained index must serve the SAME triples as a fresh build
    "tx_keyword_incremental" -> keywordLookupSql,
    // takedown-purged index == fresh build over the surviving corpus
    "tx_keyword_delete" ->
      s"""SELECT w AS term, doc_id, CAST(count(*) AS BIGINT) AS tf
         |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |      FROM documents WHERE doc_id % $DocTakedownMod <> 0) t
         |WHERE w IN (${QueryTerms.map(t => s"'$t'").mkString(", ")})
         |GROUP BY w, doc_id""".stripMargin,
    // recount adjacent pairs from raw text (DuckDB lists are 1-based:
    // i runs over 1..len-1, pairing t[i] with t[i+1])
    "tx_phrase_search" ->
      s"""SELECT doc_id, n_matches FROM (
         |  SELECT doc_id, CAST(len(list_filter(range(1, len(t)),
         |    i -> t[i] = '${PhraseTerms._1}' AND t[i+1] = '${PhraseTerms._2}'))
         |    AS BIGINT) AS n_matches
         |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) s) r
         |WHERE n_matches > 0""".stripMargin,
    "sim_hybrid_rrf" ->
      s"""WITH $bm25Cte,
         |kw AS (
         |  SELECT doc_id AS id,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS kw_rank
         |  FROM scored ORDER BY score DESC, doc_id LIMIT $RrfDepth),
         |vec AS (
         |  SELECT vec_id AS id,
         |    row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS vec_rank
         |  FROM (
         |    SELECT vec_id, round(${Similarity.sqlCos("embedding", "qv")}, 4) AS cos_sim
         |    FROM embeddings,
         |      (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |    WHERE vec_id <> 0) c
         |  ORDER BY cos_sim DESC, vec_id LIMIT $RrfDepth)
         |SELECT coalesce(kw.id, vec.id) AS doc_id,
         |  $rrfScoreSql AS rrf_score,
         |  CAST(coalesce(kw_rank, 0) AS BIGINT) AS kw_rank,
         |  CAST(coalesce(vec_rank, 0) AS BIGINT) AS vec_rank
         |FROM kw FULL OUTER JOIN vec ON kw.id = vec.id
         |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin,
    "sim_mmr_rerank" -> {
      val ref = (j: Int) => s"s$j"
      val steps = (2 to MmrK).map(i =>
        s"${ref(i)} AS (\n${mmrStepSql(i, "cand", "ps", ref)})").mkString(",\n")
      s"""WITH cand AS (
         |${mmrCandSql(Similarity.sqlCos)}),
         |ps AS (
         |${mmrPsSql(Similarity.sqlCos, "cand")}),
         |${ref(1)} AS (
         |${mmrS1Sql("cand")}),
         |$steps
         |${mmrUnionSql(ref)}""".stripMargin
    })
}
