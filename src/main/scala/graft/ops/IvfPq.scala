package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** IVF-PQ search with exact re-rank — the composition a 10^9-vector
  * deployment runs (the classic `IVFx,PQy` index shape; reference
  * semantics: the ANN contract shared by `sim_ivf_*`/`sim_pq_*`):
  *
  *   1. PROBE: rank cells by query-to-centroid cosine, keep
  *      [[IvfIndex.NProbe]] — the corpus scan drops to ~nprobe/k.
  *   2. ADC: score ONLY the probed cells' members on their 4-bit PQ
  *      codes via a per-query (M × K) lookup table of integer partial
  *      dots — reads ~4 bytes per candidate, never the raw vectors.
  *   3. RE-RANK: fetch raw embeddings for the top-[[ShortlistR]] ADC
  *      shortlist only (~Q × R rows) and order by exact cosine.
  *
  * Stage 2 is where PQ's 64× I/O cut happens and stage 3 is what makes
  * the quantization error invisible in the final ranking: ADC only has
  * to land the true neighbors anywhere in the shortlist, not order
  * them. `IvfPqSpec` pins exactly that contract (every true top-5
  * member reaching the shortlist must surface in the final top-5, and
  * a planted near-duplicate must come back rank 1).
  *
  * Two registered twins, same plan, different models:
  * `sim_ivfpq_fixed` (seed centroids + seed codebook) replays end to
  * end in DuckDB — assignment argmax, integer ADC sums, both window
  * cuts — and carries the hash check; `sim_ivfpq_search` serves from
  * the COMMITTED artifacts (Lloyd-trained IVF index at adaptive K,
  * trained PQ codebook + code table) and is rows-only, like every
  * trained-model query.
  */
object IvfPq {

  /** ADC shortlist size per query — the re-rank budget. Recall@5 is
    * insensitive to R once R ≫ 5 (the spec's planted-dup floor holds
    * at 20 already); raising it trades shortlist fetch I/O for tail
    * recall.
    */
  val ShortlistR = 20

  private def cos(a: String, b: String) = expr(s"cosine_sim($a, $b)")

  import Similarity.{PqM, PqSubDim, QuerySetSize}

  /** ADC lookup table and snap scale: SHARED with `pqAdcSearch`
    * ([[Similarity.adcLut]]/[[Similarity.AdcSnap]]) so the two ADC
    * paths — full-corpus and IVF-candidate — stay on one arithmetic
    * by construction; the DuckDB oracles of both replay it and the
    * driver's hash check would flag any drift.
    */
  private def lutFor(queries: DataFrame, cb: DataFrame): DataFrame =
    Similarity.adcLut(queries, cb)

  private def queriesOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))

  /** Probe-cell candidates: (q_id, vec_id) for every corpus vector in
    * one of the query's `nprobe` nearest cells, self excluded. Ids
    * only — vectors never travel with candidates.
    */
  private[ops] def candidates(queries: DataFrame, assignedIds: DataFrame,
      centroids: DataFrame, nprobe: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .select(col("q_id"), col("centroid_id"), cos("qv", "centroid").as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("centroid_id"))
    assignedIds.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
  }

  /** ADC shortlist: score the candidates on their codes, keep the top
    * [[ShortlistR]] per query → (q_id, vec_id, adc_cos, srn). Only
    * this cut leaves the stage, so downstream I/O is bounded by Q × R
    * regardless of corpus size.
    */
  private[ops] def adcShortlist(cand: DataFrame, codes: DataFrame,
      lut: DataFrame): DataFrame = {
    val adcCos = Similarity.adcCosExpr
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_cos").desc, col("vec_id").asc)
    cand.join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("q_id", "m", "code"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pdot_i")).as("dot_i"), sum(col("c2_i")).as("rn2_i"),
        sum(col("q2_i")).as("qn2_i"))
      .selectExpr("q_id", "vec_id", s"$adcCos AS adc_cos")
      .withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= ShortlistR)
  }

  /** Exact re-rank of the shortlist: fetch the ~Q × R raw vectors by
    * id, order by 4dp-rounded exact cosine (vec_id tie-break), top 5 —
    * the same output contract as `sim_ivf_fixed` search.
    */
  private def rerank(short: DataFrame, e: DataFrame,
      queries: DataFrame): DataFrame = {
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    short.select(col("q_id"), col("vec_id"))
      .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cos("embedding", "qv"), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rnk"))
  }

  /** The full fixed-model pipeline over an arbitrary (vec_id,
    * embedding) corpus: seed IVF centroids (first [[IvfIndex.K]]
    * vectors), seed PQ codebook (first `PqK` vectors' slices) —
    * factored so `IvfPqSpec` can run it over a corpus with a planted
    * near-duplicate.
    */
  private[ops] def searchOn(e0: DataFrame, nprobe: Int): DataFrame = {
    val e = e0.select(col("vec_id"), col("embedding"))
    rerank(fixedShortlist(e, nprobe), e, queriesOf(e))
  }

  /** Stages 1+2 of the fixed-model pipeline — exposed separately so
    * `IvfPqSpec` can pin the shortlist-dominance contract (a true
    * neighbor reaching the shortlist MUST surface in the final top-5).
    */
  private[ops] def fixedShortlist(e0: DataFrame, nprobe: Int): DataFrame = {
    val e = e0.select(col("vec_id"), col("embedding"))
    shortlistOn(e, e.filter(col("vec_id") < IvfIndex.K)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid")),
      nprobe)
  }

  /** Stages 1+2 over an arbitrary seed-centroid frame — shared by the
    * fixed-K and adaptive-K paths (seed PQ codebook in both; only the
    * IVF codebook size differs).
    */
  private def shortlistOn(e: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    val assignedIds = IvfIndex.assign(e, centroids)
      .select(col("vec_id"), col("centroid_id"))
    val cb = Similarity.pqCodebook(e)
    val codes = Similarity.pqEncode(e, cb)
      .select(col("vec_id"), col("m"), col("code"))
    val q = queriesOf(e)
    adcShortlist(candidates(q, assignedIds, centroids, nprobe),
      codes, lutFor(q, cb))
  }

  /** `sim_ivfpq_fixed`: the hash-checked twin — every stage replays in
    * DuckDB.
    */
  def searchFixed(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    searchOn(Tables.embeddings(spark, sfDir), IvfIndex.NProbe)
  }

  /** `sim_ivfpq_search`: IVF-PQ at the corpus-adaptive IVF codebook
    * size (K ≈ √n seed centroids — `IvfIndex.adaptiveK` replayed from
    * `count(*)` in the oracle) with the seed PQ codebook — every stage
    * hash-checks in DuckDB, including the sizing. The Lloyd-trained +
    * trained-PQ artifact path remains [[searchTrained]], spec-exercised
    * (trained models don't replay: float summation order differs
    * between engines).
    */
  def search(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val centroids = IvfIndex.adaptiveSeedCentroids(e)
    rerank(shortlistOn(e, centroids, IvfIndex.NProbe), e, queriesOf(e))
  }

  /** The trained-artifact production path — committed Lloyd-trained
    * IVF index for the probes, committed trained PQ codebook + code
    * table for the ADC stage. Raw vectors are read exactly twice: Q
    * query rows and the Q × R shortlist fetch; the corpus-wide inputs
    * are the id-only assignments and the ~4-byte codes. Spec-exercised
    * (`IvfPqSpec`); the registered `sim_ivfpq_search` entry is the
    * hash-checked adaptive-K [[search]].
    */
  def searchTrained(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val (assigned, centroids) = IvfIndex.ensureIndex(spark, sfDir)
    val (cb, codes) = Similarity.ensureTrainedPq(spark, sfDir)
    val e = Tables.embeddings(spark, sfDir)
    val q = queriesOf(e)
    val short = adcShortlist(
      candidates(q, assigned.select(col("vec_id"), col("centroid_id")),
        centroids, IvfIndex.NProbe),
      codes, lutFor(q, cb))
    rerank(short, e, q)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ivfpq_fixed" -> (searchFixed(_, _)),
    "sim_ivfpq_search" -> (search(_, _)))

  /** DuckDB replay of both twins: seed-centroid assignment argmax
    * (`sim_ivf_fixed`'s tie rule) at the fixed resp. adaptive IVF
    * codebook size, the PQ encode CTEs shared with `sim_pq_codes`,
    * integer ADC sums (`sim_pq_adc`'s association order), the
    * ShortlistR window cut, then the exact-cosine re-rank.
    */
  val oracles: Map[String, String] = {
    def sql(adaptive: Boolean): String = {
      val S = Similarity.AdcSnap
      val cosEC = Similarity.sqlCos("e.embedding", "c.centroid")
      val cosQC = Similarity.sqlCos("q.qv", "c.centroid")
      val cosEQ = Similarity.sqlCos("e.embedding", "q.qv")
      def sfold(term: String) =
        s"list_sum(list_transform(range(1, $PqSubDim + 1), d -> $term))"
      val adcCos =
        s"""round((CAST(dot_i AS DOUBLE) / $S)
           | / (sqrt(CAST(rn2_i AS DOUBLE) / $S)
           |  * sqrt(CAST(qn2_i AS DOUBLE) / $S)), 4)""".stripMargin
      // one source of truth for the codebook CTE (named `c`), fixed and
      // adaptive alike — a sizing-rule change cannot drift between the
      // IVF and IVF-PQ oracles
      s"""WITH ${Similarity.pqEncSql},
         |${IvfIndex.centroidCte(adaptive)},
         |asn AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT e.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY $cosEC DESC, c.centroid_id) AS rn
         |    FROM embeddings e, c) t WHERE rn = 1),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS qv FROM embeddings
         |  WHERE vec_id < $QuerySetSize),
         |probes AS (
         |  SELECT q_id, centroid_id FROM (
         |    SELECT q.q_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY $cosQC DESC, c.centroid_id) AS rn
         |    FROM q, c) t WHERE rn <= ${IvfIndex.NProbe}),
         |cand AS (
         |  SELECT p.q_id, a.vec_id
         |  FROM asn a JOIN probes p ON a.centroid_id = p.centroid_id
         |  WHERE a.vec_id <> p.q_id),
         |qsub AS (
         |  SELECT q_id, m, list_transform(range(1, $PqSubDim + 1),
         |           d -> CAST(qv[m * $PqSubDim + d] AS DOUBLE)) AS qsub
         |  FROM q, (SELECT unnest(range(0, $PqM)) AS m) ms),
         |lut AS (
         |  SELECT s.q_id, s.m, c.j AS code,
         |    CAST(round(${sfold("s.qsub[d] * c.csub[d]")} * $S) AS BIGINT) AS pdot_i,
         |    CAST(round(${sfold("c.csub[d] * c.csub[d]")} * $S) AS BIGINT) AS c2_i,
         |    CAST(round(${sfold("s.qsub[d] * s.qsub[d]")} * $S) AS BIGINT) AS q2_i
         |  FROM qsub s JOIN cb c ON s.m = c.m),
         |scored AS (
         |  SELECT cd.q_id, cd.vec_id,
         |    sum(l.pdot_i) AS dot_i, sum(l.c2_i) AS rn2_i, sum(l.q2_i) AS qn2_i
         |  FROM cand cd
         |  JOIN enc e ON e.vec_id = cd.vec_id
         |  JOIN lut l ON l.q_id = cd.q_id AND l.m = e.m AND l.code = e.code
         |  GROUP BY cd.q_id, cd.vec_id),
         |short AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY $adcCos DESC, vec_id) AS srn
         |    FROM scored) s WHERE srn <= $ShortlistR)
         |SELECT q_id, vec_id, cos_sim, rnk FROM (
         |  SELECT s.q_id, s.vec_id, round($cosEQ, 4) AS cos_sim,
         |    row_number() OVER (PARTITION BY s.q_id
         |      ORDER BY round($cosEQ, 4) DESC, s.vec_id) AS rnk
         |  FROM short s
         |  JOIN embeddings e ON e.vec_id = s.vec_id
         |  JOIN q ON q.q_id = s.q_id) r
         |WHERE rnk <= 5""".stripMargin
    }
    Map(
      "sim_ivfpq_fixed" -> sql(adaptive = false),
      "sim_ivfpq_search" -> sql(adaptive = true))
  }
}
