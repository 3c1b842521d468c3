package graft.ops

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north-star extension):
  * brute-force cosine scoring/top-k as the exactness baseline, and a
  * random-hyperplane LSH bucketed path as the 100 TB shape.
  *
  * Exactness contract with the oracle: cosine is computed float→double
  * in index order on both engines (the `cosine_sim` Catalyst expression
  * here; an explicit `CAST AS DOUBLE` list comprehension in DuckDB), so
  * the doubles agree bit-for-bit; results are rounded to 4dp and every
  * ordering ties back to `vec_id`.
  *
  * Scale notes: the query side of every search is a tiny broadcast
  * (`q` vectors), the corpus side streams through whole-stage codegen —
  * no shuffle at all for scoring, one top-k (TakeOrdered) for ranking.
  * The LSH path buckets the corpus once (16 signed projections, one
  * aggregation) and joins queries to buckets only.
  */
object Similarity {

  val Dim = 64
  /** 6 planes → 64 buckets: sized so buckets hold tens of vectors at the
    * test SFs (synthetic embeddings are near-orthogonal; more planes
    * would isolate every vector and the probe would return nothing —
    * production tuning is planes ≈ log2(corpus/target_bucket_size)).
    */
  val NumPlanes = 6
  val QuerySetSize = 5

  private def cos(a: String, b: String) = expr(s"cosine_sim($a, $b)")

  /** All-pairs scores against the pinned query vector (vec_id 0). */
  def cosineScores(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cos("embedding", "qv"), 4).as("cos_sim"))
  }

  /** Global top-10 nearest to the pinned query: brute-force KNN. */
  def knnTop10(spark: SparkSession, sfDir: String): DataFrame =
    cosineScores(spark, sfDir)
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(10)

  /** Per-query top-5 for the query set (vec_id < 5): the batcheable
    * many-query KNN shape — corpus × broadcast(queries), ranked within
    * each query.
    */
  def knnPerQuery(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), round(cos("embedding", "qv"), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
  }

  /** Random-hyperplane LSH bucket code per vector. Plane p's weight on
    * dimension d is ±1 from the parity of the first hex char of
    * `md5("p_d")` — a deterministic, engine-neutral sign matrix (no
    * stored model, and exactly reproducible in the DuckDB oracle, unlike
    * the earlier xxhash64 variant). The matrix is a compile-time
    * constant, so it is derived ONCE in Scala and embedded as literal
    * arrays — re-deriving it per row cost NumPlanes·Dim md5 string
    * hashes per vector, ~10^12 of pure fixed overhead at the 10^9-vector
    * scale this path targets. Each projection is an index-order fold
    * over the array (`aggregate`), so (a) the double accumulation is
    * bit-identical to DuckDB's `list_sum(list_transform(...))`, and
    * (b) there is NO shuffle at all — the old posexplode+groupBy shape
    * shuffled |corpus|·dim rows; this streams the corpus through one
    * codegen stage.
    */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** +1.0/-1.0 per (plane, dim): parity of md5("p_d")'s first hex char
    * — byte-identical to the SQL form
    * `ascii(substr(md5(concat(p,'_',d)),1,1)) % 2`.
    */
  private def sign(p: Int, d: Int): Double =
    if (md5Hex(s"${p}_$d").charAt(0) % 2 == 0) 1.0 else -1.0

  private def signLits(p: Int, sep: String = ", "): String =
    (0 until Dim).map(d => if (sign(p, d) > 0) "1.0" else "-1.0").mkString(sep)

  private def projExpr(p: Int): String =
    s"aggregate(sequence(1, $Dim), CAST(0.0 AS DOUBLE), " +
      s"(acc, d) -> acc + CAST(element_at(embedding, d) AS DOUBLE) * " +
      s"CAST(element_at(array(${signLits(p)}), d) AS DOUBLE))"

  private def bucketCol: org.apache.spark.sql.Column =
    (0 until NumPlanes).map(p =>
      when(expr(projExpr(p)) > 0, lit(1L << p)).otherwise(lit(0L))).reduce(_ + _)

  def lshBuckets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), bucketCol.as("bucket"))

  /** ANN search: queries probe only their own bucket, then exact cosine
    * re-rank inside it. Output is (q_id, vec_id, cos_sim, rnk ≤ 3);
    * oracle-checked (the sign matrix is md5-derived on both engines).
    */
  def annSearch(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), bucketCol.as("bucket"))
    val queries = corpus.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), round(cos("embedding", "qv"), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
  }

  /** Multi-probe ANN: each query probes its own bucket plus every
    * Hamming-1 neighbor (one plane bit flipped) — 1 + NumPlanes buckets.
    * The standard recall repair for sign LSH: a near neighbor that
    * straddles one hyperplane lands one bit away, and probing
    * adjacent buckets recovers it without densifying the index. Each
    * corpus vector lives in exactly one bucket, so the probed sets are
    * disjoint and no dedup is needed. Oracle-checked end to end.
    */
  def annMultiProbe(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), bucketCol.as("bucket"))
    val masks = lit(0L) +: (0 until NumPlanes).map(p => lit(1L << p))
    val queries = corpus.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("bucket").as("qb"))
      .withColumn("mask", explode(array(masks: _*)))
      .select(col("q_id"), col("qv"), expr("qb ^ mask").as("bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), round(cos("embedding", "qv"), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
  }

  /** Bucket histogram — occupancy of the LSH index (oracle-checked). */
  def lshBucketStats(spark: SparkSession, sfDir: String): DataFrame =
    lshBuckets(spark, sfDir)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"))

  /** Scalar quantization (SQ8) search — the compressed-domain scoring
    * path: per-dimension corpus (min, max) define 256 uniform levels,
    * each vector stores one byte per dimension, and queries score
    * against bin-center reconstructions with their exact vector
    * (asymmetric distance computation). 4× memory cut at float32 with
    * near-exact ranking; the model (two 64-float arrays) broadcasts.
    * Everything is deterministic double arithmetic in index order, so
    * the reconstructed scores — not just the ranking — are
    * oracle-checked against DuckDB.
    */
  def sq8Search(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val stats = e.select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .groupBy().agg(array_sort(collect_list(struct(col("d"), col("mn"), col("mx")))).as("dmm"))
      .select(
        expr("transform(dmm, s -> CAST(s.mn AS DOUBLE))").as("mn"),
        expr("transform(dmm, s -> CAST(s.mx AS DOUBLE))").as("mx"))
    val recon =
      s"""transform(sequence(1, $Dim), d ->
         |  CASE WHEN element_at(mx, d) = element_at(mn, d) THEN element_at(mn, d)
         |  ELSE element_at(mn, d) +
         |    (floor((CAST(element_at(embedding, d) AS DOUBLE) - element_at(mn, d)) * 255.0
         |           / (element_at(mx, d) - element_at(mn, d))) + 0.5)
         |    * (element_at(mx, d) - element_at(mn, d)) / 255.0 END)""".stripMargin
    val corpus = e.crossJoin(broadcast(stats))
      .selectExpr("vec_id", s"$recon AS rec")
    val queries = e.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    def fold(term: String) =
      s"aggregate(sequence(1, $Dim), CAST(0.0 AS DOUBLE), (acc, d) -> acc + $term)"
    val qcos =
      s"""round(${fold("element_at(rec, d) * CAST(element_at(qv, d) AS DOUBLE)")}
         | / (sqrt(${fold("element_at(rec, d) * element_at(rec, d)")})
         |  * sqrt(${fold("CAST(element_at(qv, d) AS DOUBLE) * CAST(element_at(qv, d) AS DOUBLE)")})), 4)""".stripMargin
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("qcos").desc, col("vec_id").asc)
    corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id", s"$qcos AS qcos")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
  }

  /** Embedding near-dup pairs, brute force: all pairs ≥ 0.4 cosine.
    * TEST-SCALE ONLY — the `id_a < id_b` cartesian is O(n²) by
    * construction and exists as the exactness/recall baseline for
    * [[embedNearDupLsh]] (the registered scale path); `SimilaritySpec`
    * measures the LSH variant's recall against this one.
    */
  def embedNearDupPairs(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cos("va", "vb"), 4).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
  }

  /** Banded sign-LSH near-dup config: 16 planes split into 8 bands of
    * 2. A pair is a candidate iff SOME band's 2 sign bits agree — the
    * MinHash-LSH banding construction applied to random-hyperplane
    * bits. With per-plane agreement p = 1 − θ/π, candidate recall is
    * 1 − (1 − p^r)^b: ≥ 98% across this corpus's whole near-dup range
    * (cos 0.4–0.6 → p 0.63–0.71). Band width r is the selectivity
    * knob — it is 2 here because the synthetic corpus puts the dup
    * threshold in the tail of the random-pair distribution, and at r=2
    * a random pair still collides in ≥1 band with p ≈ 0.9: ON THIS
    * CORPUS the banded path inspects nearly all pairs and exists to
    * exercise and oracle-check the banding machinery, not to win the
    * benchmark. The asymptotic claim belongs to the production regime
    * (threshold ≥ 0.85, p ≥ 0.93, r ≈ 16 / b ≈ 8): there a random
    * pair collides with probability ~1e-4 and the join touches
    * ~n·E[bucket] pairs instead of n². Sign-LSH fundamentally cannot
    * be selective when the target threshold sits in the random-pair
    * tail — that is a property of the data, not the operator.
    */
  val NdPlanes = 16
  val NdBands = 8
  val NdBandBits: Int = NdPlanes / NdBands
  /** Near-dup sign matrix uses an independent md5 stream ("nd_p_d")
    * so its bits don't correlate with the ANN bucket planes.
    */
  private def ndSignLits(p: Int): String =
    (0 until Dim).map(d =>
      if (md5Hex(s"nd_${p}_$d").charAt(0) % 2 == 0) "1.0" else "-1.0").mkString(", ")

  private def ndProjExpr(p: Int): String =
    s"aggregate(sequence(1, $Dim), CAST(0.0 AS DOUBLE), " +
      s"(acc, d) -> acc + CAST(element_at(embedding, d) AS DOUBLE) * " +
      s"CAST(element_at(array(${ndSignLits(p)}), d) AS DOUBLE))"

  /** 16-bit sign code, one bit per near-dup plane. */
  private def ndCodeCol: org.apache.spark.sql.Column =
    (0 until NdPlanes).map(p =>
      when(expr(ndProjExpr(p)) > 0, lit(1L << p)).otherwise(lit(0L))).reduce(_ + _)

  /** Embedding near-dup pairs via banded sign-LSH — the registered
    * scale path (replaces the brute-force cartesian as the primary
    * query). Each vector computes its 16-bit sign code once (one
    * codegen pass, no shuffle), explodes into 8 (band, 2-bit key)
    * rows, and candidates join only on band equality; the exact
    * cosine then confirms ≥ 0.4 inside each candidate pair. Pairs
    * colliding in several bands are deduplicated before the cosine is
    * computed. Fully oracle-checked: the md5 sign matrix, banding
    * arithmetic, and index-order cosine all reproduce in DuckDB.
    */
  /** Banded sign-LSH candidate pairs over an arbitrary
    * (vec_id, embedding) frame at a caller-chosen (planes, bands)
    * configuration — the banding machinery behind [[embedNearDupLsh]],
    * exposed so `SimilaritySpec` can measure selectivity in the
    * PRODUCTION regime (high threshold, wide bands: r = planes/bands
    * large), where a random pair collides with probability ~p^r per
    * band and the candidate set is ≪ n². Same md5 "nd" sign stream,
    * same band-key arithmetic; no caching (spec-scale inputs).
    */
  def bandedCandidates(vectors: DataFrame, planes: Int, bands: Int): DataFrame = {
    require(planes % bands == 0 && planes <= 62, s"bad config $planes/$bands")
    val bandBits = planes / bands
    val code = (0 until planes).map(p =>
      when(expr(ndProjExpr(p)) > 0, lit(1L << p)).otherwise(lit(0L))).reduce(_ + _)
    val banded = vectors.select(col("vec_id"), code.as("code"))
      .withColumn("band_idx", explode(sequence(lit(0), lit(bands - 1))))
      .select(col("vec_id"), col("band_idx"),
        expr(s"shiftright(code, band_idx * $bandBits) & ${(1L << bandBits) - 1}")
          .as("band_key"))
    banded.select(col("band_idx"), col("band_key"), col("vec_id").as("id_a"))
      .join(banded.select(col("band_idx"), col("band_key"), col("vec_id").as("id_b")),
        Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Production-regime banded sign-LSH: the same 16 md5 planes split
    * into 2 bands of 8 bits, confirming at threshold 0.85 — the (r, b)
    * working point where banding is actually SELECTIVE (per-plane
    * agreement p ≥ 0.93 at cos ≥ 0.85, so a random pair collides in a
    * band with probability ~p_rand^8 ≈ 1e-2 per band instead of ~0.45
    * at r=2; SimilaritySpec proves both selectivity and planted-dup
    * recall in this regime). This is the configuration the sf ≥ 0.1
    * bench carries; [[embedNearDupLsh]] (r=2, threshold 0.4) stays the
    * oracle-checked exerciser of the banding machinery at sf0.01,
    * gated out of the at-scale bench via
    * `SparkEntry.nonSelectiveQueries` — the corpus puts the 0.4
    * threshold in the random-pair tail where NO sign-LSH config is
    * selective (doc above), so benching it at scale would measure a
    * documented anti-pattern.
    */
  val NdBandsProd = 2
  val NdBandBitsProd: Int = NdPlanes / NdBandsProd
  val NdThresholdProd = 0.85

  /** How many vectors the prod-regime witness corpus plants as
    * near-dups, and the id offset their perturbed copies live at.
    */
  val NdPlantCount = 25
  val NdPlantOffset = 1000000L

  /** The prod-regime witness corpus: embeddings ∪ a perturbed copy of
    * the first [[NdPlantCount]] vectors (first component +0.01, ids
    * offset by [[NdPlantOffset]]). The raw corpus has no pairs at
    * cosine ≥ 0.85, so the gate's oracle match on it was vacuous
    * (0 = 0 rows certified nothing about the band-key/confirm
    * arithmetic); each planted copy sits at cosine ≈ 1 of its source,
    * so the selective banding provably finds real near-dups under the
    * DuckDB replay. The perturbation is double-arithmetic + FLOAT cast,
    * bit-identical on both engines.
    */
  private def prodWitnessCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val planted = base.filter(col("vec_id") < NdPlantCount)
      .select((col("vec_id") + NdPlantOffset).as("vec_id"),
        expr(s"transform(sequence(1, $Dim), d -> " +
          "CAST(element_at(embedding, d) + " +
          "CASE WHEN d = 1 THEN 0.01 ELSE 0.0 END AS FLOAT))").as("embedding"))
    base.unionByName(planted)
  }

  def embedNearDupLshProd(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    // same candidates-then-fetch shape as the r=2 exerciser: cached
    // sign codes feed both sides of the self-join, the candidate join
    // shuffles 16-byte id pairs, vectors re-attach by id equi-joins,
    // and the cache-release barrier sits after the cosine confirm
    val corpus = prodWitnessCorpus(spark, sfDir)
    val banded = corpus
      .select(col("vec_id"), ndCodeCol.as("code"))
      .withColumn("band_idx", explode(sequence(lit(0), lit(NdBandsProd - 1))))
      .select(col("vec_id"), col("band_idx"),
        expr(s"shiftright(code, band_idx * $NdBandBitsProd) & ${(1 << NdBandBitsProd) - 1}")
          .as("band_key"))
      .cache()
    val cand = banded.select(col("band_idx"), col("band_key"), col("vec_id").as("id_a"))
      .join(banded.select(col("band_idx"), col("band_key"), col("vec_id").as("id_b")),
        Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val ea = corpus.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val eb = corpus.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val confirmed = cand.join(ea, Seq("id_a")).join(eb, Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(cos("va", "vb"), 4).as("cos_sim"))
      .filter(col("cos_sim") >= NdThresholdProd)
      .localCheckpoint()
    banded.unpersist()
    confirmed
  }

  def embedNearDupLsh(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    // banded rows carry only (band, key, id) — the candidate join and the
    // pair dedup shuffle 16-byte id pairs, not 2×64-float vectors (~30×
    // less exchange volume); vectors re-attach afterwards by two id equi-
    // joins against the corpus, the standard candidates-then-fetch shape
    // cached: the 16-plane sign-code projection is the dominant per-row
    // cost and feeds both sides of the candidate self-join
    val banded = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), ndCodeCol.as("code"))
      .withColumn("band_idx", explode(sequence(lit(0), lit(NdBands - 1))))
      .select(col("vec_id"), col("band_idx"),
        expr(s"shiftright(code, band_idx * $NdBandBits) & ${(1 << NdBandBits) - 1}")
          .as("band_key"))
      .cache()
    val cand = banded.select(col("band_idx"), col("band_key"), col("vec_id").as("id_a"))
      .join(banded.select(col("band_idx"), col("band_key"), col("vec_id").as("id_b")),
        Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // a pair may collide in up to 8 bands; cosine once
    val ea = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val eb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val confirmed = cand.join(ea, Seq("id_a")).join(eb, Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(cos("va", "vb"), 4).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
      // the cache-release barrier sits AFTER the cosine confirm: on this
      // corpus banding is non-selective (doc above), so checkpointing the
      // raw candidate set materialized ~all n² id pairs into block
      // storage inside the timed query (the round-4 bench regression);
      // the confirmed set is orders of magnitude smaller
      .localCheckpoint()
    banded.unpersist()
    confirmed
  }

  /** Per-label centroid coordinates: elementwise mean over each label's
    * vectors (the class-prototype computation; also the IVF recompute
    * step exposed as a query). Output is (label, dim, mean) long form —
    * avg of continuous floats has no decimal-lattice rounding hazard.
    */
  def labelCentroids(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("label"), col("d").cast("long").as("d"))
      .agg(round(avg(col("x")), 6).as("m"), count(lit(1)).as("n_vecs"))

  /** L2-nearest neighbors of the pinned query vector (metric-space twin
    * of the cosine KNN; exercises the `l2_dist` codegen expression).
    */
  def l2Top10(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(expr("l2_dist(embedding, qv)"), 4).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(10)
  }

  /** Array-function surface over the vector column: size, element
    * access, order-independent extrema — the building blocks every
    * embedding pipeline touches before any math.
    */
  def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir).selectExpr(
      "vec_id",
      "CAST(size(embedding) AS BIGINT) AS dim",
      "round(CAST(element_at(embedding, 1) AS DOUBLE), 6) AS first_dim",
      "round(CAST(element_at(embedding, -1) AS DOUBLE), 6) AS last_dim",
      "round(CAST(array_max(embedding) AS DOUBLE), 6) AS max_dim",
      "round(CAST(array_min(embedding) AS DOUBLE), 6) AS min_dim")

  // ---- product quantization (PQ) ------------------------------------
  // The third compression point on the memory/recall curve after SQ8
  // (scalar, 1 byte/dim) and IVF (cell-partitioned exact vectors): PQ
  // stores ONE SMALL CODE PER SUBSPACE (here 8 codes of 4 bits ≈ 4
  // bytes per 64-dim vector, a 64× cut vs float32) and scores queries
  // against additive centroid reconstructions. Two codebooks: the FIXED
  // one (the first PqK corpus vectors' sub-slices, like
  // `sim_ivf_fixed`'s seed codebook) keeps encode, reconstruction, and
  // ranking hash-checked against DuckDB; the TRAINED one
  // (per-subspace Lloyd over the same deterministic init) is the
  // production recall point, spec-floored against the fixed codebook —
  // identical search plan, only the broadcast model differs.

  /** Subspaces: 64 dims → 8 blocks of 8. */
  val PqM = 8
  val PqSubDim: Int = Dim / PqM
  /** Centroids per subspace (codes are 4-bit). */
  val PqK = 16

  /** Codebook: (m, j, csub) — subspace m's j-th centroid, the m-th
    * 8-dim slice of seed vector j. ~`PqM × PqK` rows — broadcast.
    */
  private[ops] def pqCodebook(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < PqK)
      .select(col("vec_id").as("j"),
        explode(expr(s"sequence(0, ${PqM - 1})")).as("m"), col("embedding"))
      .select(col("m"), col("j"),
        expr(s"transform(slice(embedding, m * $PqSubDim + 1, $PqSubDim)," +
          " x -> CAST(x AS DOUBLE))").as("csub"))

  /** Encode: nearest centroid per (vector, subspace). The codebook is
    * `PqM × PqK` ≈ 128 tiny rows, so it collects once and inlines as a
    * LITERAL per-subspace candidate array: assignment is then a pure
    * map stage over the corpus — no broadcast join multiplying the
    * exploded corpus ×PqK, and no per-(vec_id, m) window shuffle+sort
    * (guide §2.4 — the previous shape paid one Exchange of `n × PqM`
    * rows per call, and training calls this every Lloyd round). The
    * distance fold keeps the exact per-dim accumulation order, and
    * `array_min` over `struct(dist, j, csub)` is the same
    * lexicographic (dist asc, j asc) selection the row_number argmin
    * made — bit-identical codes, so every hash-checked PQ query is
    * unchanged.
    */
  private def pqAssign(e: DataFrame, cb: DataFrame): DataFrame =
    pqAssignRows(e, collectCodebook(cb))

  /** The codebook's rows grouped per subspace for literal inlining:
    * index m holds that subspace's (j, centroid-slice) candidates.
    */
  private def collectCodebook(cb: DataFrame)
      : Seq[Seq[(Long, Seq[Double])]] = {
    val byM = cb.select(col("m"), col("j"), col("csub")).collect()
      .groupBy(_.getInt(0))
    (0 until PqM).map { m =>
      byM.getOrElse(m, Array.empty)
        .map(r => (r.getLong(1), r.getSeq[Double](2).toSeq))
        .sortBy(_._1).toSeq
    }
  }

  private def pqAssignRows(e: DataFrame,
      cands: Seq[Seq[(Long, Seq[Double])]]): DataFrame = {
    graft.functions.VectorFunctions.register(e.sparkSession)
    e.select(col("vec_id"),
        explode(expr(s"sequence(0, ${PqM - 1})")).as("m"), col("embedding"))
      .select(col("vec_id"), col("m"),
        expr(s"transform(slice(embedding, m * $PqSubDim + 1, $PqSubDim)," +
          " x -> CAST(x AS DOUBLE))").as("vsub"))
      .withColumn("__cands", element_at(typedLit(cands), col("m") + 1))
      .withColumn("__best", expr(
        """array_min(transform(__cands, c ->
          |struct(l2sq_dist(vsub, c._2) AS dist, c._1 AS j, c._2 AS csub)))"""
          .stripMargin))
      .select(col("vec_id"), col("m"), col("__best.j").as("code"),
        col("vsub"), col("__best.csub").as("csub"))
  }

  private[ops] def pqEncode(e: DataFrame, cb: DataFrame): DataFrame =
    pqAssign(e, cb).select(col("vec_id"), col("m"), col("code"), col("csub"))

  /** Per-subspace Lloyd rounds over the seed codebook. */
  val PqIterations = 3

  /** TRAINED codebook: [[PqIterations]] rounds of per-subspace k-means
    * — assignment is exactly [[pqAssign]]'s oracle-pinned argmin, and
    * recompute is the per-(subspace, code, dim) member mean, the IVF
    * `recompute` pattern at sub-vector granularity. Init is the
    * deterministic seed codebook, so the trained result is reproducible
    * and `SimilaritySpec` can floor its recall against the fixed
    * codebook's. Each round's codebook is `PqM × PqK` rows — the
    * collect-free broadcast-model loop, materialized per iteration to
    * keep the plan one job deep (same discipline as `IvfIndex.build`).
    */
  /** Total squared quantization error of `cb` over corpus `e` — the
    * objective Lloyd training minimizes. Exposed for `SimilaritySpec`:
    * distortion is GUARANTEED non-increasing per round, so
    * `distortion(trained) ≤ distortion(fixed)` is the deterministic
    * training invariant (top-5 cosine recall, by contrast, is a
    * 25-sample observable that noise flips between fixtures).
    */
  private[ops] def pqDistortion(e: DataFrame, cb: DataFrame): Double =
    pqAssign(e, cb)
      .select(expr("l2sq_dist(vsub, csub)").as("d2"))
      .agg(sum(col("d2"))).head.getDouble(0)

  private[ops] def pqTrainedCodebook(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    // each Lloyd round is ONE job: a literal-codebook map-stage
    // assignment feeding the member-mean aggregation, collected back
    // to the driver (≤ PqM × PqK tiny rows). No cache/count
    // materialization, no broadcast build, no window shuffle per
    // round (guide §2.4), and the returned frame is a LOCAL relation
    // of the final values — downstream commit/search re-reads values,
    // not a three-round lineage.
    var rows = collectCodebook(pqCodebook(e))
    for (_ <- 1 to PqIterations) {
      // member means for all PqSubDim dims in ONE aggregation (per-dim
      // sums + count per (m, j) — was posexplode ×PqSubDim into a
      // (m, j, d) aggregation feeding a second (m, j) collect_list
      // aggregation: two exchanges and an 8× exploded shuffle per
      // round, guide §2.3/§2.4). The mean is the same sum/count; only
      // the trained artifact depends on it, and trained models are
      // rows-only by design (float summation order already differs
      // between engines — Lloyd's distortion invariant holds under
      // any summation order).
      val sums = (1 to PqSubDim).map(d =>
        sum(expr(s"element_at(vsub, $d)")).as(s"__s$d"))
      val meanArr = expr(s"array(${(1 to PqSubDim)
        .map(d => s"__s$d / __n").mkString(", ")})")
      val next = pqAssignRows(e, rows)
        .select(col("m"), col("code").as("j"), col("vsub"))
        .groupBy(col("m"), col("j"))
        .agg(count(lit(1)).as("__n"), sums: _*)
        .select(col("m"), col("j"), meanArr.as("csub"))
      rows = collectCodebook(next)
    }
    import spark.implicits._
    rows.zipWithIndex
      .flatMap { case (cs, m) => cs.map { case (j, c) => (m, j, c) } }
      .toDF("m", "j", "csub")
  }

  /** The PQ code table itself — (vec_id, subspace, code), the artifact
    * a 100 TB deployment would persist instead of raw vectors.
    */
  def pqCodes(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    pqEncode(e, pqCodebook(e)).select(col("vec_id"), col("m"), col("code"))
  }

  /** PQ search: score queries against additive reconstructions
    * (concatenated assigned centroids) — asymmetric distance
    * computation with exact query vectors, like `sq8Search` but at
    * sub-vector granularity. Reconstruction order is pinned by
    * array_sort over (m, csub) structs; cosine is the same
    * index-order fold the SQ8 oracle replays.
    */
  def pqSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    pqSearchWith(e, pqCodebook(e))
  }

  /** PQ search over the TRAINED codebook ([[pqTrainedCodebook]]) —
    * the production recall point. Rows-only in the driver gate (the
    * Lloyd means aren't replayed in SQL); `sim_pq_search` (fixed
    * codebook) keeps the full hash check on the identical search plan,
    * and `SimilaritySpec` floors this variant's recall@5 at the fixed
    * codebook's.
    */
  def pqTrainedSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    pqSearchWith(e, ensureTrainedCodebook(spark, sfDir))
  }

  /** The committed trained codebook for `sfDir`, training it first if
    * absent, built with other parameters, or built over a corpus whose
    * files changed — the same build-once/query-many artifact lifecycle
    * as `IvfIndex.ensureIndex` (a real deployment amortizes training
    * over millions of searches; re-running Lloyd inside every query was
    * both a bench distortion and the wrong lifecycle). Commit goes
    * through `HudiLike.commit` (atomic snapshot swap) with the corpus
    * fingerprint + training params as the staleness check.
    */
  private[ops] def ensureTrainedCodebook(spark: SparkSession,
      sfDir: String): DataFrame =
    ensureTrainedPq(spark, sfDir)._1

  /** The committed trained-PQ artifact pair for `sfDir` — (codebook,
    * code table), training and encoding first if absent, built with
    * other parameters, or built over a corpus whose files changed. The
    * CODE TABLE is committed alongside the codebook because it is the
    * artifact a 100 TB deployment actually serves from: ~4 bytes per
    * vector instead of 256 — IVF-PQ search reads codes + codebook and
    * never touches raw vectors until the shortlist re-rank
    * ([[IvfPq]]). Commit goes through `HudiLike.commit` (atomic
    * snapshot swap); the meta version is v2 so v1 artifacts (codebook
    * only) rebuild once rather than serving a missing code table.
    */
  private[ops] def ensureTrainedPq(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = {
    import java.nio.file.{Files, Paths}
    val dir = IvfIndex.artifactDir(sfDir, "pq")
    val meta =
      s"v2 m=$PqM k=$PqK iters=$PqIterations ${IvfIndex.corpusFingerprint(sfDir)}"
    val fresh = Files.exists(Paths.get(s"$dir/codebook")) &&
      Files.exists(Paths.get(s"$dir/codes")) &&
      Files.exists(Paths.get(s"$dir/meta")) &&
      Files.readString(Paths.get(s"$dir/meta")) == meta
    if (!fresh) {
      val e = Tables.embeddings(spark, sfDir)
      val cb = pqTrainedCodebook(e)
      graft.etl.HudiLike.commit(cb, s"$dir/codebook")
      graft.etl.HudiLike.commit(
        pqEncode(e, cb).select(col("vec_id"), col("m"), col("code")),
        s"$dir/codes")
      // fingerprint captured AFTER training read the corpus —
      // fail-rebuild, never fail-stale
      Files.writeString(Paths.get(s"$dir/meta"),
        s"v2 m=$PqM k=$PqK iters=$PqIterations ${IvfIndex.corpusFingerprint(sfDir)}")
    }
    (spark.read.parquet(s"$dir/codebook"), spark.read.parquet(s"$dir/codes"))
  }

  /** PQ search in true ADC form — the shape a 10^9-vector deployment
    * actually runs: per query, a (PqM × PqK)-entry lookup table of
    * partial dot products and centroid partial norms broadcasts, and
    * each candidate scores as PqM table lookups + adds on its 4-bit
    * codes — never touching the raw vectors. [[pqSearch]] scores the
    * same reconstruction by materializing the full 64-dim vector and
    * folding all dims per (candidate, query); algebraically the same
    * cosine (dot and |rec|² decompose over subspaces), but at scale the
    * decomposed form reads the ~4-byte code table instead of 256-byte
    * floats — the 64× I/O cut is the whole point of PQ. Fully
    * hash-checked: fixed codebook, and the oracle replays the ADC
    * association order (per-subspace partials, then the M-term sum)
    * exactly.
    */
  /** Integer-snap scale for the ADC partials: each order-pinned double
    * fold snaps to an 8dp BIGINT so the per-candidate M-term sums are
    * groupBy aggregates of INTEGERS — order-independent and
    * bit-identical across engines (the exactMoneySum discipline; the
    * ~1e-8 snap is noise against the 4dp ranking round). Shared by
    * [[pqAdcSearch]] and `IvfPq` so the two ADC paths cannot drift.
    */
  private[ops] val AdcSnap = "100000000.0"

  /** The ADC lookup table over codebook `cb` for `queries`
    * (q_id, qv): one row per (q_id, m, code) carrying the integer
    * partial dot, centroid-slice norm², and query-slice norm² —
    * everything the final cosine needs. Q × PqM × PqK rows: broadcast.
    */
  private[ops] def adcLut(queries: DataFrame, cb: DataFrame): DataFrame = {
    def fold(term: String) =
      s"aggregate(sequence(1, $PqSubDim), CAST(0.0 AS DOUBLE), (acc, d) -> acc + $term)"
    val qsub = queries
      .select(col("q_id"), explode(expr(s"sequence(0, ${PqM - 1})")).as("m"),
        col("qv"))
      .select(col("q_id"), col("m"),
        expr(s"transform(slice(qv, m * $PqSubDim + 1, $PqSubDim)," +
          " x -> CAST(x AS DOUBLE))").as("qsub"))
    qsub.join(cb, "m")
      .selectExpr("q_id", "m", "j AS code",
        s"CAST(round(${fold("element_at(qsub, d) * element_at(csub, d)")} * $AdcSnap) AS BIGINT) AS pdot_i",
        s"CAST(round(${fold("element_at(csub, d) * element_at(csub, d)")} * $AdcSnap) AS BIGINT) AS c2_i",
        s"CAST(round(${fold("element_at(qsub, d) * element_at(qsub, d)")} * $AdcSnap) AS BIGINT) AS q2_i")
  }

  /** Cosine from the summed integer ADC partials (`dot_i`/`rn2_i`/
    * `qn2_i` columns), rounded to the 4dp ranking lattice.
    */
  private[ops] def adcCosExpr: String =
    s"""round((CAST(dot_i AS DOUBLE) / $AdcSnap)
       | / (sqrt(CAST(rn2_i AS DOUBLE) / $AdcSnap)
       |  * sqrt(CAST(qn2_i AS DOUBLE) / $AdcSnap)), 4)""".stripMargin

  def pqAdcSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val cb = pqCodebook(e)
    val queries = e.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val lut = adcLut(queries, cb)
    val codes = pqEncode(e, cb).select(col("vec_id"), col("m"), col("code"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("qcos").desc, col("vec_id").asc)
    codes
      .join(broadcast(lut), Seq("m", "code"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pdot_i")).as("dot_i"), sum(col("c2_i")).as("rn2_i"),
        sum(col("q2_i")).as("qn2_i"))
      .filter(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id", s"$adcCosExpr AS qcos")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
  }

  private def pqSearchWith(e: DataFrame, cb: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(e.sparkSession)
    val rec = pqEncode(e, cb)
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("csub")))).as("parts"))
      .select(col("vec_id"), expr("flatten(transform(parts, p -> p.csub))").as("rec"))
    val queries = e.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    // dot_vec folds ascending-index with per-element float→double
    // widening — bit-identical to the interpreted SQL aggregate folds
    // this replaces, at native-loop cost (guide §1.2 per-task work)
    val qcos =
      """round(dot_vec(rec, qv)
        | / (sqrt(dot_vec(rec, rec)) * sqrt(dot_vec(qv, qv))), 4)""".stripMargin
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("qcos").desc, col("vec_id").asc)
    rec.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id", s"$qcos AS qcos")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_array_funcs" -> (arrayFuncs(_, _)),
    "sim_l2_top10" -> (l2Top10(_, _)),
    "sim_label_centroids" -> (labelCentroids(_, _)),
    "sim_cosine_scores" -> (cosineScores(_, _)),
    "sim_knn_top10" -> (knnTop10(_, _)),
    "sim_knn_per_query" -> (knnPerQuery(_, _)),
    "sim_ann_lsh" -> (annSearch(_, _)),
    "sim_ann_multiprobe" -> (annMultiProbe(_, _)),
    "sim_sq8_search" -> (sq8Search(_, _)),
    "sim_pq_codes" -> (pqCodes(_, _)),
    "sim_pq_search" -> (pqSearch(_, _)),
    "sim_pq_adc" -> (pqAdcSearch(_, _)),
    "sim_pq_trained" -> (pqTrainedSearch(_, _)),
    "sim_lsh_buckets" -> (lshBucketStats(_, _)),
    "dd_embed_neardup" -> (embedNearDupPairs(_, _)),
    "dd_embed_neardup_lsh" -> (embedNearDupLsh(_, _)),
    "dd_embed_neardup_lsh_prod" -> (embedNearDupLshProd(_, _)))

  /** Shared oracle CTEs replaying the PQ codebook/encode: fixed-seed
    * centroids, per-subspace L2² argmin with (dist, j) tie-break —
    * the exact relational construction `pqEncode` plans.
    */
  private[ops] def pqEncSql: String =
    s"""cb AS (
       |  SELECT m, j, list_transform(range(1, $PqSubDim + 1),
       |           d -> CAST(embedding[m * $PqSubDim + d] AS DOUBLE)) AS csub
       |  FROM (SELECT vec_id AS j, embedding FROM embeddings WHERE vec_id < $PqK) v,
       |       (SELECT unnest(range(0, $PqM)) AS m) ms),
       |sub AS (
       |  SELECT vec_id, m, list_transform(range(1, $PqSubDim + 1),
       |           d -> CAST(embedding[m * $PqSubDim + d] AS DOUBLE)) AS vsub
       |  FROM embeddings, (SELECT unnest(range(0, $PqM)) AS m) ms),
       |enc AS (
       |  SELECT vec_id, m, j AS code, csub FROM (
       |    SELECT s.vec_id, s.m, c.j, c.csub,
       |      row_number() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY list_sum(list_transform(range(1, $PqSubDim + 1),
       |          d -> (s.vsub[d] - c.csub[d]) * (s.vsub[d] - c.csub[d]))), c.j) AS rn
       |    FROM sub s JOIN cb c ON s.m = c.m) t
       |  WHERE rn = 1)""".stripMargin

  /** DuckDB cosine identical to `CosineSimilarity`: float→double per
    * element, index-order accumulation.
    */
  def sqlCos(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, $Dim + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform(range(1, $Dim + 1), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |  * sqrt(list_sum(list_transform(range(1, $Dim + 1), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))))))""".stripMargin

  private def sqlL2(a: String, b: String): String =
    s"sqrt(list_sum(list_transform(range(1, $Dim + 1), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))))"

  /** DuckDB twin of [[projExpr]]/[[bucketCol]]: the same literal sign
    * matrix, same index-order double accumulation.
    */
  private def sqlProj(p: Int, emb: String): String =
    s"""list_sum(list_transform(range(1, $Dim + 1), i ->
       |  CAST($emb[i] AS DOUBLE) * CAST(([${signLits(p)}])[i] AS DOUBLE)))""".stripMargin

  private def sqlBucket(emb: String): String =
    (0 until NumPlanes).map(p =>
      s"(CASE WHEN ${sqlProj(p, emb)} > 0 THEN ${1L << p} ELSE 0 END)")
      .mkString("CAST((", " + ", ") AS BIGINT)")

  /** DuckDB twin of [[ndCodeCol]]: same "nd_" md5 sign stream, same
    * index-order double accumulation, same bit packing.
    */
  private def sqlNdProj(p: Int, emb: String): String =
    s"""list_sum(list_transform(range(1, $Dim + 1), i ->
       |  CAST($emb[i] AS DOUBLE) * CAST(([${ndSignLits(p)}])[i] AS DOUBLE)))""".stripMargin

  private def sqlNdCode(emb: String): String =
    (0 until NdPlanes).map(p =>
      s"(CASE WHEN ${sqlNdProj(p, emb)} > 0 THEN ${1L << p} ELSE 0 END)")
      .mkString("CAST((", " + ", ") AS BIGINT)")

  val oracles: Map[String, String] = Map(
    "sim_array_funcs" ->
      s"""SELECT vec_id,
         | CAST(len(embedding) AS BIGINT) AS dim,
         | round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
         | round(CAST(embedding[-1] AS DOUBLE), 6) AS last_dim,
         | round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_dim,
         | round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_dim
         |FROM embeddings""".stripMargin,
    "sim_l2_top10" ->
      s"""SELECT vec_id, round(${sqlL2("embedding", "qv")}, 4) AS dist
         |FROM embeddings,
         |  (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |WHERE vec_id <> 0
         |ORDER BY dist ASC, vec_id LIMIT 10""".stripMargin,
    "sim_label_centroids" ->
      s"""SELECT label, CAST(d AS BIGINT) AS d,
         | round(avg(CAST(embedding[d + 1] AS DOUBLE)), 6) AS m,
         | count(*) AS n_vecs
         |FROM embeddings, (SELECT unnest(range($Dim)) AS d) dims
         |GROUP BY label, d""".stripMargin,
    "sim_cosine_scores" ->
      s"""SELECT vec_id, round(${sqlCos("embedding", "qv")}, 4) AS cos_sim
         |FROM embeddings,
         |  (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |WHERE vec_id <> 0""".stripMargin,
    "sim_knn_top10" ->
      s"""SELECT vec_id, round(${sqlCos("embedding", "qv")}, 4) AS cos_sim
         |FROM embeddings,
         |  (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |WHERE vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "sim_knn_per_query" ->
      s"""SELECT q_id, vec_id, cos_sim, rnk FROM (
         |  SELECT q_id, vec_id, cos_sim,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rnk
         |  FROM (
         |    SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
         |      round(${sqlCos("e.embedding", "q.embedding")}, 4) AS cos_sim
         |    FROM embeddings e JOIN embeddings q
         |      ON q.vec_id < $QuerySetSize AND e.vec_id <> q.vec_id) s) r
         |WHERE rnk <= 5""".stripMargin,
    "dd_embed_neardup" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${sqlCos("a.embedding", "b.embedding")}, 4) AS cos_sim
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE round(${sqlCos("a.embedding", "b.embedding")}, 4) >= 0.4""".stripMargin,
    "dd_embed_neardup_lsh" ->
      s"""WITH c AS (
         |  SELECT vec_id, ${sqlNdCode("embedding")} AS code FROM embeddings),
         |banded AS (
         |  SELECT vec_id, bi, (code >> (bi * $NdBandBits)) & ${(1 << NdBandBits) - 1} AS bk
         |  FROM c, (SELECT unnest(range($NdBands)) AS bi) bands),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.bi = b.bi AND a.bk = b.bk AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b,
         |  round(${sqlCos("ea.embedding", "eb.embedding")}, 4) AS cos_sim
         |FROM cand
         |JOIN embeddings ea ON ea.vec_id = cand.id_a
         |JOIN embeddings eb ON eb.vec_id = cand.id_b
         |WHERE round(${sqlCos("ea.embedding", "eb.embedding")}, 4) >= 0.4""".stripMargin,
    "dd_embed_neardup_lsh_prod" ->
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + $NdPlantOffset AS vec_id,
         |    list_transform(range(1, $Dim + 1), d ->
         |      CAST(embedding[d] + CASE WHEN d = 1 THEN 0.01 ELSE 0.0 END AS FLOAT)) AS embedding
         |  FROM embeddings WHERE vec_id < $NdPlantCount),
         |c AS (
         |  SELECT vec_id, ${sqlNdCode("embedding")} AS code FROM corpus),
         |banded AS (
         |  SELECT vec_id, bi, (code >> (bi * $NdBandBitsProd)) & ${(1 << NdBandBitsProd) - 1} AS bk
         |  FROM c, (SELECT unnest(range($NdBandsProd)) AS bi) bands),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.bi = b.bi AND a.bk = b.bk AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b,
         |  round(${sqlCos("ea.embedding", "eb.embedding")}, 4) AS cos_sim
         |FROM cand
         |JOIN corpus ea ON ea.vec_id = cand.id_a
         |JOIN corpus eb ON eb.vec_id = cand.id_b
         |WHERE round(${sqlCos("ea.embedding", "eb.embedding")}, 4) >= $NdThresholdProd""".stripMargin,
    "sim_lsh_buckets" ->
      s"""SELECT bucket, count(*) AS n_vectors
         |FROM (SELECT ${sqlBucket("embedding")} AS bucket FROM embeddings) b
         |GROUP BY bucket""".stripMargin,
    "sim_ann_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, ${sqlBucket("embedding")} AS bucket
         |  FROM embeddings)
         |SELECT q_id, vec_id, cos_sim, rnk FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
         |    round(${sqlCos("e.embedding", "q.embedding")}, 4) AS cos_sim,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${sqlCos("e.embedding", "q.embedding")}, 4) DESC, e.vec_id) AS rnk
         |  FROM b e JOIN b q
         |    ON q.vec_id < $QuerySetSize AND e.bucket = q.bucket
         |      AND e.vec_id <> q.vec_id) s
         |WHERE rnk <= 3""".stripMargin,
    "sim_sq8_search" -> {
      def fold(term: String) =
        s"list_sum(list_transform(range(1, $Dim + 1), d -> $term))"
      val recon =
        s"""list_transform(range(1, $Dim + 1), d ->
           |  CASE WHEN s.mx[d] = s.mn[d] THEN s.mn[d]
           |  ELSE s.mn[d] +
           |    (floor((CAST(e.embedding[d] AS DOUBLE) - s.mn[d]) * 255.0
           |           / (s.mx[d] - s.mn[d])) + 0.5)
           |    * (s.mx[d] - s.mn[d]) / 255.0 END)""".stripMargin
      val qcos =
        s"""round(${fold("rec[d] * CAST(qv[d] AS DOUBLE)")}
           | / (sqrt(${fold("rec[d] * rec[d]")})
           |  * sqrt(${fold("CAST(qv[d] AS DOUBLE) * CAST(qv[d] AS DOUBLE)")})), 4)""".stripMargin
      s"""WITH st AS (
         |  SELECT d, min(CAST(embedding[d] AS DOUBLE)) AS mn,
         |         max(CAST(embedding[d] AS DOUBLE)) AS mx
         |  FROM embeddings, (SELECT unnest(range(1, $Dim + 1)) AS d) dims
         |  GROUP BY d),
         |s AS (SELECT list(mn ORDER BY d) AS mn, list(mx ORDER BY d) AS mx FROM st),
         |corpus AS (
         |  SELECT e.vec_id, $recon AS rec FROM embeddings e, s),
         |q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
         |      WHERE vec_id < $QuerySetSize)
         |SELECT q_id, vec_id, qcos, rnk FROM (
         |  SELECT q.q_id, c.vec_id, $qcos AS qcos,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY $qcos DESC, c.vec_id) AS rnk
         |  FROM corpus c, q WHERE c.vec_id <> q.q_id) r
         |WHERE rnk <= 5""".stripMargin
    },
    "sim_pq_codes" ->
      s"""WITH $pqEncSql
         |SELECT vec_id, CAST(m AS INT) AS m, CAST(code AS BIGINT) AS code
         |FROM enc""".stripMargin,
    "sim_pq_search" -> {
      def fold(term: String) =
        s"list_sum(list_transform(range(1, $Dim + 1), d -> $term))"
      val qcos =
        s"""round(${fold("r.rec[d] * CAST(q.qv[d] AS DOUBLE)")}
           | / (sqrt(${fold("r.rec[d] * r.rec[d]")})
           |  * sqrt(${fold("CAST(q.qv[d] AS DOUBLE) * CAST(q.qv[d] AS DOUBLE)")})), 4)""".stripMargin
      s"""WITH $pqEncSql,
         |rec AS (
         |  SELECT vec_id, flatten(list(csub ORDER BY m)) AS rec
         |  FROM enc GROUP BY vec_id),
         |q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
         |      WHERE vec_id < $QuerySetSize)
         |SELECT q_id, vec_id, qcos, rnk FROM (
         |  SELECT q.q_id, r.vec_id, $qcos AS qcos,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY $qcos DESC, r.vec_id) AS rnk
         |  FROM rec r, q WHERE r.vec_id <> q.q_id) s
         |WHERE rnk <= 5""".stripMargin
    },
    "sim_pq_adc" -> {
      def fold(term: String) =
        s"list_sum(list_transform(range(1, $PqSubDim + 1), d -> $term))"
      val S = AdcSnap
      val qcosExpr =
        s"""round((CAST(dot_i AS DOUBLE) / $S)
           | / (sqrt(CAST(rn2_i AS DOUBLE) / $S)
           |  * sqrt(CAST(qn2_i AS DOUBLE) / $S)), 4)""".stripMargin
      s"""WITH $pqEncSql,
         |qsub AS (
         |  SELECT vec_id AS q_id, m, list_transform(range(1, $PqSubDim + 1),
         |           d -> CAST(embedding[m * $PqSubDim + d] AS DOUBLE)) AS qsub
         |  FROM embeddings, (SELECT unnest(range(0, $PqM)) AS m) ms
         |  WHERE vec_id < $QuerySetSize),
         |lut AS (
         |  SELECT q.q_id, q.m, c.j,
         |    CAST(round(${fold("q.qsub[d] * c.csub[d]")} * $S) AS BIGINT) AS pdot_i,
         |    CAST(round(${fold("c.csub[d] * c.csub[d]")} * $S) AS BIGINT) AS c2_i,
         |    CAST(round(${fold("q.qsub[d] * q.qsub[d]")} * $S) AS BIGINT) AS q2_i
         |  FROM qsub q JOIN cb c ON q.m = c.m),
         |scored AS (
         |  SELECT l.q_id, e.vec_id,
         |    sum(l.pdot_i) AS dot_i, sum(l.c2_i) AS rn2_i, sum(l.q2_i) AS qn2_i
         |  FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.j
         |  GROUP BY l.q_id, e.vec_id)
         |SELECT q_id, vec_id, qcos, rnk FROM (
         |  SELECT q_id, vec_id, $qcosExpr AS qcos,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY $qcosExpr DESC, vec_id) AS rnk
         |  FROM scored WHERE vec_id <> q_id) s
         |WHERE rnk <= 5""".stripMargin
    },
    "sim_ann_multiprobe" -> {
      val masks = (0L +: (0 until NumPlanes).map(p => 1L << p)).mkString(", ")
      s"""WITH b AS (
         |  SELECT vec_id, embedding, ${sqlBucket("embedding")} AS bucket
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS qv, xor(bucket, m) AS bucket
         |  FROM b, (SELECT unnest([$masks]) AS m) masks
         |  WHERE vec_id < $QuerySetSize)
         |SELECT q_id, vec_id, cos_sim, rnk FROM (
         |  SELECT q.q_id, e.vec_id,
         |    round(${sqlCos("e.embedding", "q.qv")}, 4) AS cos_sim,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY round(${sqlCos("e.embedding", "q.qv")}, 4) DESC, e.vec_id) AS rnk
         |  FROM b e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.q_id) s
         |WHERE rnk <= 3""".stripMargin
    })
}
