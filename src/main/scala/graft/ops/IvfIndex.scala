package graft.ops

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * centroid-partitioned scale path for similarity search, alongside the
  * hyperplane-LSH variant in `Similarity`.
  *
  * Index build = k-means-lite: deterministic init (first k vectors by
  * id), a fixed number of Lloyd iterations with assignment as a
  * broadcast cross-score + argmin, centroid recomputation as a
  * per-dimension mean (posexplode → avg → re-assemble). The centroid set
  * is a k×dim model — small by construction — so collecting it to the
  * driver between iterations is the legitimate "broadcast the model"
  * pattern, not a driver-side data loop.
  *
  * Search probes the `nprobe` nearest centroids per query and re-ranks
  * only vectors in those cells: corpus scan cost drops to ~nprobe/k of
  * brute force, the property that matters at 10^9 vectors.
  */
object IvfIndex {

  val K = 8
  val Iterations = 3
  val NProbe = 2

  private def cos(a: String, b: String) = expr(s"cosine_sim($a, $b)")

  /** Cluster assignment for every vector: nearest centroid by cosine
    * (ties broken by centroid id — deterministic).
    */
  private def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    // argmax as a single max_by aggregation (tie → lower centroid_id via
    // the negated id in the ordering struct): one partial+final agg, no
    // window sort — this runs once per Lloyd iteration
    vectors.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        cos("embedding", "centroid").as("sim"))
      .groupBy(col("vec_id"))
      .agg(
        first(col("embedding")).as("embedding"),
        expr("max_by(centroid_id, struct(sim, -centroid_id))").as("centroid_id"))

  /** Recompute centroids as the per-dimension mean of their members. */
  private def recompute(assigned: DataFrame): DataFrame =
    assigned
      .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("centroid_id"), col("d"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("centroid_id"))
      .agg(array_sort(collect_list(struct(col("d"), col("m")))).as("dm"))
      .select(col("centroid_id"),
        expr("transform(dm, s -> CAST(s.m AS FLOAT))").as("centroid"))

  /** Build the index: returns (assignments, centroids). */
  def build(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir).cache()
    var centroids = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
      .cache()
    for (_ <- 1 to Iterations) {
      val assigned = assign(e, centroids)
      centroids = recompute(assigned).cache()
      // materialize each iteration: keeps the plan one job deep instead
      // of stacking three lazy assign+recompute rounds into one lineage
      centroids.count()
    }
    (assign(e, centroids).cache(), centroids)
  }

  /** ANN search: probe the NProbe nearest cells per query vector
    * (vec_id < 5 as elsewhere), exact re-rank inside them, top-5 out.
    */
  def search(spark: SparkSession, sfDir: String): DataFrame = {
    val (assigned, centroids) = build(spark, sfDir)
    val queries = assigned.filter(col("vec_id") < Similarity.QuerySetSize)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .select(col("q_id"), col("qv"), col("centroid_id"),
        cos("qv", "centroid").as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= NProbe)
      .select(col("q_id"), col("qv"), col("centroid_id"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("centroid_id"),
        round(cos("embedding", "qv"), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .filter(col("rnk") <= 5)
  }

  /** Cell occupancy histogram (index health check). */
  def cellStats(spark: SparkSession, sfDir: String): DataFrame = {
    val (assigned, _) = build(spark, sfDir)
    assigned.groupBy(col("centroid_id")).agg(count(lit(1)).as("n_vectors"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ivf_search" -> (search(_, _)),
    "sim_ivf_cells" -> (cellStats(_, _)))
}
