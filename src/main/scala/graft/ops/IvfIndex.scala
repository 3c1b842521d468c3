package graft.ops

import graft.Tables
import graft.etl.{Catalog, HudiLike}
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

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
  * The index is an ARTIFACT, not a query intermediate: [[buildCommit]]
  * writes assignments + centroids once through `HudiLike.commit` (atomic
  * snapshot swap, `Catalog` views kept in sync), and every search/stats
  * query reads the committed tables via [[ensureIndex]] — the
  * build-once/query-many shape the reference itself uses for its tables
  * (pipeline_architecture.py:78-97 build vs py:201-231 query). A real
  * ANN system amortizes the k-means build over millions of queries;
  * rebuilding per query was both a bench distortion and the wrong
  * lifecycle.
  *
  * Search probes the `nprobe` nearest centroids per query and re-ranks
  * only vectors in those cells: corpus scan cost drops to ~nprobe/k of
  * brute force, the property that matters at 10^9 vectors.
  */
object IvfIndex {

  /** Fixed codebook size for the oracle-checked twins (`sim_ivf_fixed`,
    * `dd_embed_neardup_ivf_fixed`, …): with the codebook pinned to the
    * first K vectors the whole search path replays in DuckDB. The
    * COMMITTED index does not use this constant — its cell count adapts
    * to the corpus via [[adaptiveK]].
    */
  val K = 8
  val Iterations = 3

  /** Cell count for the committed index: K ≈ √n. Per-cell candidate
    * generation in [[cellPairs]] is quadratic in cell size, so a
    * constant K leaves candidates at ~n²/K — half of brute force at ANY
    * corpus size. K = √n keeps expected cell size at √n and candidates
    * at ~n^1.5, the same discipline as LSH bucket width. Floored at the
    * fixed-codebook K so tiny fixtures keep multi-cell behavior.
    */
  def adaptiveK(n: Long): Int =
    math.max(K, math.ceil(math.sqrt(n.toDouble)).toInt)
  val NProbe = 2
  /** Wider probe setting exercised by `sim_ivf_multiprobe` — the
    * recall/cost knob: nprobe cells of k are scanned, so recall rises
    * with nprobe while scan cost stays ~nprobe/k of brute force.
    */
  val NProbeWide = 4

  private def cos(a: String, b: String) = expr(s"cosine_sim($a, $b)")

  /** Cluster assignment for every vector: nearest centroid by cosine
    * (ties broken by centroid id — deterministic).
    */
  private[ops] def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
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

  /** Build the index at the corpus-adaptive cell count: returns
    * (assignments, centroids).
    */
  def build(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val (assigned, centroids, _) = buildDetail(spark, sfDir)
    (assigned, centroids)
  }

  /** [[build]] plus the cell count it chose — `buildCommit` records the
    * k in the index meta so a formula or corpus change forces a rebuild.
    */
  private def buildDetail(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame, Int) = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir).cache()
    val k = adaptiveK(e.count())
    var centroids = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
      .cache()
    for (_ <- 1 to Iterations) {
      val assigned = assign(e, centroids)
      centroids = recompute(assigned).cache()
      // materialize each iteration: keeps the plan one job deep instead
      // of stacking three lazy assign+recompute rounds into one lineage
      centroids.count()
    }
    (assign(e, centroids).cache(), centroids, k)
  }

  // ---- committed-index lifecycle ----------------------------------------

  /** Where a corpus's committed index lives: one dir per canonical
    * corpus path (cwd-relative — sbt forks in the project root, so
    * Bench/Verify/tests share artifacts).
    */
  private def indexDir(sfDir: String): String = artifactDir(sfDir, "ivf")

  /** Shared artifact-location scheme for committed per-corpus models
    * (IVF index, trained PQ codebook): one dir per (kind, canonical
    * corpus path).
    */
  private[ops] def artifactDir(sfDir: String, kind: String): String = {
    val canon = Paths.get(sfDir).toAbsolutePath.normalize.toString
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"target/graft-index/$kind-$key"
  }

  /** Fingerprint of the corpus files backing the index (file count,
    * total bytes, newest modification time): driver-side metadata only,
    * no scan. A corpus that changed underneath a committed index must
    * force a rebuild — `ensureIndex` must never silently serve stale
    * assignments. Same "did the table move?" question the reference's
    * watermark answers before an incremental read (py:128-148), applied
    * to the index artifact.
    */
  private[ops] def corpusFingerprint(sfDir: String): String = {
    val root = Paths.get(s"$sfDir/embeddings.parquet")
    val files: Seq[java.nio.file.Path] =
      if (Files.isDirectory(root)) {
        val s = Files.walk(root)
        try {
          val it = s.filter(p => Files.isRegularFile(p)).iterator()
          val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
          while (it.hasNext) buf += it.next()
          buf.toSeq
        } finally s.close()
      } else if (Files.exists(root)) Seq(root)
      else Seq.empty
    val bytes = files.map(Files.size(_)).sum
    val mtime =
      if (files.isEmpty) 0L
      else files.map(Files.getLastModifiedTime(_).toMillis).max
    s"corpus files:${files.size} bytes:$bytes mtime:$mtime"
  }

  /** Per-file corpus inventory (relative path, size, mtime) — the
    * evidence [[appendCommit]] needs to tell APPEND-ONLY growth (every
    * file the base index was built over is intact, new files carry the
    * batch) from an in-place rewrite, which the aggregate
    * [[corpusFingerprint]] cannot distinguish from growth. One line
    * per file, sorted.
    */
  private def corpusInventory(sfDir: String): Seq[String] = {
    val root = Paths.get(s"$sfDir/embeddings.parquet")
    val files: Seq[java.nio.file.Path] =
      if (Files.isDirectory(root)) {
        val s = Files.walk(root)
        try {
          val it = s.filter(p => Files.isRegularFile(p)).iterator()
          val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
          while (it.hasNext) buf += it.next()
          buf.toSeq
        } finally s.close()
      } else if (Files.exists(root)) Seq(root)
      else Seq.empty
    files
      // data files only: _SUCCESS markers and .crc shadows are
      // rewritten by every append job without touching any data
      .filterNot { f =>
        val n = f.getFileName.toString
        n.startsWith("_") || n.startsWith(".")
      }
      .map(f => s"${root.getParent.relativize(f)} ${Files.size(f)} " +
        s"${Files.getLastModifiedTime(f).toMillis}").sorted
  }

  /** Fingerprint stored next to the committed tables: an artifact built
    * by older code (different k formula/Iterations/init) OR over a
    * corpus that has since changed must be rebuilt, never silently read.
    * The cell count `k` is recorded at build time; [[ensureIndex]]
    * validates the version + iterations + corpus parts without a scan
    * (an unchanged corpus fingerprint implies an unchanged row count and
    * therefore an unchanged adaptive k — k is derived deterministically
    * from n at build).
    */
  private def indexFingerprint(sfDir: String, k: Int): String =
    s"v3 k=$k iters=$Iterations ${corpusFingerprint(sfDir)}"

  /** Does the stored meta witness a current-version index over the
    * current corpus? Matches `v3 k=<n> iters=… <corpus fingerprint>`
    * with any k — the k itself is build-derived, and the corpus part
    * pins it (same files → same n → same adaptive k).
    */
  private def metaCurrent(meta: String, sfDir: String): Boolean =
    "^v3 k=\\d+ ".r.findPrefixOf(meta).exists(p =>
      meta.drop(p.length) == s"iters=$Iterations ${corpusFingerprint(sfDir)}")

  /** Build the index and commit it as a table artifact: assignments and
    * centroids each written through `HudiLike.commit` (atomic pointer
    * swap; registered `Catalog` views resync), plus the params marker.
    * Always rebuilds — this IS the index-creation operation; use
    * [[ensureIndex]] on the query path.
    */
  def buildCommit(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val dir = indexDir(sfDir)
    val (assigned, centroids, k) = buildDetail(spark, sfDir)
    HudiLike.commit(assigned, s"$dir/assignments")
    HudiLike.commit(centroids, s"$dir/centroids")
    // commit materialized both frames to parquet; drop the build caches
    // (long-lived sessions must not accrete k-means intermediates)
    assigned.unpersist(); centroids.unpersist()
    // fingerprint captured AFTER the build read the corpus: a corpus
    // mutation racing the build makes the meta stale and the next
    // ensureIndex rebuilds — fail-rebuild, never fail-stale
    Files.writeString(Paths.get(s"$dir/files"),
      corpusInventory(sfDir).mkString("\n"))
    Files.writeString(Paths.get(s"$dir/meta"), indexFingerprint(sfDir, k))
    (spark.read.parquet(s"$dir/assignments"),
      spark.read.parquet(s"$dir/centroids"))
  }

  /** The committed index for `sfDir`, building it first if absent,
    * built with different parameters, or built over a corpus whose
    * files have since changed (count/bytes/mtime — see
    * [[corpusFingerprint]]). Query entry points read through this, so
    * the Lloyd build runs once per corpus VERSION, not once per query.
    */
  def ensureIndex(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val dir = indexDir(sfDir)
    val fresh = Files.exists(Paths.get(s"$dir/assignments")) &&
      Files.exists(Paths.get(s"$dir/centroids")) &&
      Files.exists(Paths.get(s"$dir/meta")) &&
      metaCurrent(Files.readString(Paths.get(s"$dir/meta")), sfDir)
    if (fresh)
      (spark.read.parquet(s"$dir/assignments"),
        spark.read.parquet(s"$dir/centroids"))
    else buildCommit(spark, sfDir)
  }

  /** Incrementally append a batch of NEW vectors to the committed
    * index without retraining — the production path for corpus growth
    * between periodic retrains: each new vector assigns to its nearest
    * EXISTING committed centroid (the same tie rule as the build), the
    * assignment table re-commits atomically (re-sent vec_ids take their
    * new assignment — upsert-by-key), and the meta re-stamps with the
    * post-append corpus fingerprint at the UNCHANGED cell count, so
    * `ensureIndex` keeps serving the appended artifact instead of
    * triggering a full rebuild. Centroids intentionally stay fixed;
    * cell balance degrades gradually until the next [[buildCommit]],
    * which [[adaptiveK]] then right-sizes for the grown corpus. Cost is
    * one broadcast cross-score over the BATCH only — never the corpus.
    */
  def appendCommit(spark: SparkSession, sfDir: String,
      newVectors: DataFrame): (DataFrame, DataFrame) = {
    VectorFunctions.register(spark)
    val dir = indexDir(sfDir)
    require(Files.exists(Paths.get(s"$dir/meta")),
      s"no committed index under $dir — run buildCommit first")
    val meta = Files.readString(Paths.get(s"$dir/meta"))
    val k = "^v3 k=(\\d+) ".r.findFirstMatchIn(meta).map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"unparseable index meta: $meta"))
    // append is only sound over APPEND-ONLY growth: every file the
    // committed index was built over must be byte-identical on disk
    // (new files carry the batch). An in-place rewrite means the
    // committed assignments describe embeddings that no longer exist —
    // refuse, so the caller rebuilds instead of this call laundering a
    // stale index into a "current" fingerprint
    val filesPath = Paths.get(s"$dir/files")
    require(Files.exists(filesPath),
      s"no corpus inventory under $dir (index predates append support) — " +
        "run buildCommit first")
    val recorded = Files.readString(filesPath)
      .linesIterator.filter(_.nonEmpty).toSet
    val current = corpusInventory(sfDir).toSet
    val mutated = recorded -- current
    require(mutated.isEmpty,
      s"corpus files changed since the index was built (not append-only " +
        s"growth): ${mutated.take(3).mkString("; ")} — run buildCommit instead")
    val existing = spark.read.parquet(s"$dir/assignments")
    val centroids = spark.read.parquet(s"$dir/centroids")
    val assignedNew = assign(newVectors, centroids)
    val merged = existing
      .join(assignedNew.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .unionByName(assignedNew)
    HudiLike.commit(merged, s"$dir/assignments")
    // stamp AFTER the append read the grown corpus: same fail-rebuild
    // discipline as buildCommit, at the retained cell count
    Files.writeString(Paths.get(s"$dir/files"),
      corpusInventory(sfDir).mkString("\n"))
    Files.writeString(Paths.get(s"$dir/meta"),
      s"v3 k=$k iters=$Iterations ${corpusFingerprint(sfDir)}")
    (spark.read.parquet(s"$dir/assignments"), centroids)
  }

  /** The `sim_ivf_build` query: a full rebuild + commit, surfaced as
    * the committed centroid coordinates in long form. This is the one
    * entry that pays the Lloyd loop; its cost is the per-corpus
    * index-creation cost the searches amortize.
    */
  def buildQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, centroids) = buildCommit(spark, sfDir)
    centroids
      .select(col("centroid_id"), posexplode(col("centroid")).as(Seq("d", "x")))
      .select(col("centroid_id"), col("d").cast("long").as("d"),
        round(col("x").cast("double"), 6).as("m"))
  }

  /** Trained-index ANN search: probe the NProbe nearest cells per query
    * vector (vec_id < 5 as elsewhere), exact re-rank inside them, top-5
    * out. Reads the committed Lloyd-trained index ([[ensureIndex]]) —
    * no per-query build. Spec-exercised (`IvfIndexSpec` recall and
    * artifact-parity cases); the REGISTERED `sim_ivf_search` entry is
    * [[searchAdaptive]], whose whole path — adaptive cell count
    * included — replays in DuckDB, because Lloyd refinement does not
    * (float summation order differs between engines).
    */
  def search(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val (assigned, centroids) = ensureIndex(spark, sfDir)
    searchFrom(assigned, centroids)
  }

  /** Trained-index ANN search at the wide probe setting
    * ([[NProbeWide]]) — the recall/cost knob on the Lloyd-trained
    * artifact path. Spec-exercised; `IvfIndexSpec` asserts its recall
    * dominates the nprobe=2 path. Registered `sim_ivf_search_wide` is
    * [[searchAdaptiveWide]].
    */
  def searchWide(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val (assigned, centroids) = ensureIndex(spark, sfDir)
    searchFrom(assigned, centroids, NProbeWide)
  }

  /** Seed codebook (the first k vectors by id, no Lloyd refinement) at
    * the corpus-adaptive cell count [[adaptiveK]] — "IVF-flat with a
    * provided codebook", sized like the committed index. Everything
    * downstream of the seed choice is the production arithmetic, and
    * because the seed is deterministic the ENTIRE path — including the
    * K ≈ √n sizing — replays in DuckDB (`count(*)` in a CTE, the same
    * construction `samp_shuffle_shards` uses for its adaptive shard
    * count). The one count() action is driver-side metadata, not a
    * data loop.
    */
  private[ops] def adaptiveSeedCentroids(e: DataFrame): DataFrame = {
    val k = adaptiveK(e.count())
    e.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
  }

  /** `sim_ivf_search`: hash-checked ANN search at the corpus-adaptive
    * cell count over the seed codebook (see [[adaptiveSeedCentroids]]);
    * the Lloyd-trained committed artifact keeps serving [[search]],
    * covered by `sim_ivf_build` + `IvfIndexSpec`.
    */
  def searchAdaptive(spark: SparkSession, sfDir: String): DataFrame =
    searchAdaptiveAt(spark, sfDir, NProbe)

  /** `sim_ivf_search_wide`: the adaptive-K seed-codebook search at the
    * wide probe setting — the recall/cost knob, hash-checked end to end.
    */
  def searchAdaptiveWide(spark: SparkSession, sfDir: String): DataFrame =
    searchAdaptiveAt(spark, sfDir, NProbeWide)

  private def searchAdaptiveAt(spark: SparkSession, sfDir: String,
      nprobe: Int): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val centroids = adaptiveSeedCentroids(e)
    searchFrom(assign(e, centroids).cache(), centroids, nprobe)
  }

  /** IVF search over a FIXED codebook (the first K vectors, no Lloyd
    * refinement) — "IVF-flat with a provided codebook". Splitting the
    * operator this way makes the entire search path (assignment, probe
    * selection, in-cell re-rank) hash-checkable against DuckDB; the
    * k-means refinement in [[build]] stays the one spec-verified piece.
    */
  def searchFixed(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val centroids = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    // searchFrom references the assignment from two plan branches
    // (probes + re-rank); cache it as build() does
    searchFrom(assign(e, centroids).cache(), centroids)
  }

  /** `sim_ivf_recall`: ANN quality measured as a first-class query —
    * recall@5 of the fixed-codebook nprobe search against the exact
    * brute-force top-5 for the same query set. The evaluation every
    * ANN deployment runs before trusting an index config: the
    * per-query hit counts are deterministic (both rankings share the
    * 4dp-rounding + vec_id tie rule), so the DuckDB oracle replays the
    * WHOLE construction — index assignment, probe selection, both
    * rankings and the hit join.
    */
  def recallFixed(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val approx = searchFixed(spark, sfDir).select(col("q_id"), col("vec_id"))
    val queries = e.filter(col("vec_id") < Similarity.QuerySetSize)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val exact = e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cos("embedding", "qv"), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("vec_id"))
    approx.join(exact.withColumn("__hit", lit(1)),
        Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("__hit"), lit(0))).as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        round(col("n_hits") / lit(5.0), 4).as("recall"))
  }

  /** Fixed-codebook search at the wide probe setting ([[NProbeWide]]) —
    * the probe-count/recall knob as a first-class query, hash-checkable
    * the same way as `sim_ivf_fixed`; `IvfIndexSpec` asserts its recall
    * against the brute-force KNN dominates the nprobe=2 path.
    */
  def searchFixedMultiprobe(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val centroids = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    searchFrom(assign(e, centroids).cache(), centroids, NProbeWide)
  }

  /** Deterministic takedown set for `sim_ivf_delete`: every
    * `vec_id % TakedownMod == 0` — includes query ids and codebook ids
    * on purpose (a deleted doc must stop being SERVED; the codebook
    * keeps its geometry until the next retrain, exactly as a vector
    * store behaves between compactions).
    */
  val TakedownMod = 17

  /** Tombstone-commit `ids` into a committed index dir — the
    * right-to-be-forgotten path every training-data vector store
    * needs: an O(deletes) artifact written atomically next to the
    * index, ASSIGNMENTS AND CENTROIDS UNTOUCHED (at 100 TB the
    * assignment table is the corpus-sized artifact; a takedown must
    * never rewrite it). Repeated calls union in. Physical removal
    * happens at the next full rebuild, Hudi's delete-then-compact
    * discipline applied to the ANN index.
    */
  def deleteCommit(spark: SparkSession, dir: String, ids: DataFrame): Unit =
    // read-union-commit is a read-modify-write: two concurrent
    // takedowns without the lock would each union against the same
    // base and the second swap would silently drop the first's ids —
    // the same single-writer discipline every table mutator here keeps
    graft.etl.FsLock.withTableLock(dir, graft.etl.FsLock.QueueWaitMs) {
      val path = s"$dir/tombstones"
      val cur =
        if (Files.exists(Paths.get(path))) spark.read.parquet(path)
        else ids.select(col("vec_id")).limit(0)
      HudiLike.commit(
        cur.unionByName(ids.select(col("vec_id"))).distinct(), path)
    }

  /** Per-JVM staged fixed-codebook index + tombstones for
    * `sim_ivf_delete` — build once, serve read-only (the memoFixture
    * discipline; the SHARED committed artifact under [[indexDir]] is
    * never tombstoned, so every other `sim_*` query keeps its corpus).
    */
  private val deleteStage =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[ops] def stagedDeleteIndex(spark: SparkSession, sfDir: String): String =
    deleteStage.computeIfAbsent(sfDir, _ => {
      val dir = Files.createTempDirectory("graft-ivfdel").toString
      val e = Tables.embeddings(spark, sfDir)
      val centroids = e.filter(col("vec_id") < K)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
      HudiLike.commit(assign(e, centroids), s"$dir/assignments")
      HudiLike.commit(centroids, s"$dir/centroids")
      deleteCommit(spark, dir,
        e.filter(col("vec_id") % TakedownMod === 0).select("vec_id"))
      dir
    })

  /** `sim_ivf_delete`: ANN search AFTER takedown deletes — served from
    * the committed artifacts (assignments + codebook + tombstone
    * table), with the deleted vectors knocked out of the candidate
    * side by a broadcast anti-join. The oracle replays the whole
    * construction including the delete rule, so a tombstoned vector
    * leaking back into any top-5 hash-mismatches; `IvfIndexSpec` pins
    * that the delete wrote O(deletes) bytes and the assignment
    * artifact stayed byte-identical.
    */
  def searchFixedAfterDelete(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val dir = stagedDeleteIndex(spark, sfDir)
    val assigned = spark.read.parquet(s"$dir/assignments")
    val centroids = spark.read.parquet(s"$dir/centroids")
    val tomb = spark.read.parquet(s"$dir/tombstones")
    searchFrom(assigned.cache(), centroids, tombstones = Some(tomb))
  }

  /** Metadata predicate for `sim_ivf_filtered` — pre-filtered ANN, the
    * "vector search WHERE scalar-filter" shape every production vector
    * store exposes (filtered HNSW/IVF in FAISS/Milvus terms). Written
    * as an IN list (not the equivalent `label % 2 = 1`) deliberately:
    * `In` is a parquet-pushable filter, so the predicate prunes row
    * groups at the scan (`PlanAssertSpec` pins PushedFilters), while a
    * modulo expression would evaluate post-read.
    */
  val FilterPredSql = "label IN (1, 3, 5, 7, 9)"

  /** `sim_ivf_filtered`: fixed-codebook IVF search restricted to
    * vectors satisfying [[FilterPredSql]] — PRE-filtering: the predicate
    * lands on the posting-list scan (a pushed parquet filter at scale,
    * exactly like a partition/zone-map prune), so filtered-out vectors
    * never reach the distance computation, and the probe width is the
    * WIDE setting because filtering thins cells (the standard
    * recall-under-selectivity compensation). Queries still come from
    * the unfiltered corpus: a query's own label does not constrain what
    * it may match.
    */
  def searchFixedFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val centroids = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    // candidates feed only the re-rank branch (queries read the base
    // table), so no cache is needed here unlike searchFixed
    val candidates = assign(e.filter(expr(FilterPredSql)), centroids)
    val queries = e.filter(col("vec_id") < Similarity.QuerySetSize)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .select(col("q_id"), col("qv"), col("centroid_id"),
        cos("qv", "centroid").as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= NProbeWide)
      .select(col("q_id"), col("qv"), col("centroid_id"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    candidates.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("centroid_id"),
        round(cos("embedding", "qv"), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .filter(col("rnk") <= 5)
  }

  private def searchFrom(assigned: DataFrame, centroids: DataFrame,
      nprobe: Int = NProbe, tombstones: Option[DataFrame] = None): DataFrame = {
    val queries = assigned.filter(col("vec_id") < Similarity.QuerySetSize)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .select(col("q_id"), col("qv"), col("centroid_id"),
        cos("qv", "centroid").as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("qv"), col("centroid_id"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    // takedown tombstones knock vectors out of the CANDIDATE side only
    // (a deleted doc must never be served; external queries still ask)
    // — an O(deletes) broadcast anti-join, the assignments untouched
    val candidates = tombstones match {
      case Some(t) => assigned.join(
        broadcast(t.select(col("vec_id")).distinct()), Seq("vec_id"), "left_anti")
      case None => assigned
    }
    candidates.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("centroid_id"),
        round(cos("embedding", "qv"), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .filter(col("rnk") <= 5)
  }

  /** How many cells each vector joins for cell-blocked near-dup
    * candidate generation — multi-probe in reverse: a pair straddling
    * one cell boundary still collides as long as either of its top-2
    * cells agrees. The recall/cost knob of cell blocking, exactly as
    * band width is for sign-LSH.
    */
  val AssignProbes = 2

  /** Top-m centroid assignments per vector (ids only — the candidate
    * join shuffles 16-byte pairs, vectors re-attach afterwards).
    */
  private def assignTop(vectors: DataFrame, centroids: DataFrame, m: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("centroid_id").asc)
    vectors.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("centroid_id"), cos("embedding", "centroid").as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= m)
      .select(col("vec_id"), col("centroid_id"))
  }

  /** Embedding near-dup pairs blocked by IVF cell: candidates are
    * pairs sharing any of their [[AssignProbes]] nearest cells,
    * confirmed by exact cosine ≥ 0.4 — the third blocking strategy
    * next to brute force and banded sign-LSH, and the one that reuses
    * the index the ANN queries already maintain. Candidates dedup
    * before the cosine (a pair can share both cells), then vectors
    * re-attach by two id equi-joins — the candidates-then-fetch shape.
    * Per-cell pair generation is quadratic in cell size, so the
    * committed path's K grows with the corpus ([[adaptiveK]], K ≈ √n)
    * to keep cells bucket-sized — the same discipline as LSH bucket
    * width; the fixed-K twin exists only for the DuckDB oracle.
    */
  private def cellPairs(spark: SparkSession, sfDir: String,
      cand: DataFrame): DataFrame = {
    val ea = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val eb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    cand.join(ea, Seq("id_a")).join(eb, Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(cos("va", "vb"), 4).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
  }

  /** Distinct unordered candidate pairs sharing any cell — the
    * quadratic-per-cell core of [[cellPairs]], factored so the scaling
    * contract is testable on its own.
    */
  private def candidatesFrom(cells: DataFrame): DataFrame =
    cells.select(col("centroid_id"), col("vec_id").as("id_a"))
      .join(cells.select(col("centroid_id"), col("vec_id").as("id_b")),
        Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

  /** Hot-cell cap factor: a cell holding more than
    * `HotCellCapFactor · √n` vectors sub-partitions before pairing.
    * Expected cell size under [[adaptiveK]] is ~[[AssignProbes]]·√n, so
    * the cap only bites on genuinely skewed assignments (a clustered
    * corpus packing Θ(n) vectors into one cell — where uncapped pair
    * generation is Θ(n²) no matter what K is).
    */
  val HotCellCapFactor = 4

  /** `HotCellCapFactor · ceil(√n)`, floored at 1. */
  def hotCellCap(n: Long): Long =
    math.max(1L, HotCellCapFactor * math.ceil(math.sqrt(n.toDouble)).toLong)

  /** [[candidatesFrom]] with the hot-cell cap: each cell larger than
    * `cap` is split into `ceil(cell_n / cap)` sub-cells by a secondary
    * hash of the vector id, and pairs generate within a sub-cell only.
    * Per-task pair work is then ≤ ~cap² regardless of how skewed the
    * assignment is — total candidates stay O(n · cap) = O(n^1.5) even
    * when every vector lands in ONE cell ([[adaptiveK]] only bounds the
    * EXPECTED cell size; this bounds the worst case). The price is the
    * same recall trade LSH banding makes: a near-dup pair inside a hot
    * cell is found only if the secondary hash co-locates it — on normal
    * corpora the cap never triggers (`sub_id` is constant 0) and the
    * output is identical to the uncapped join. `IvfIndexSpec` pins the
    * pathological-corpus bound.
    */
  private[ops] def candidatesCapped(cells: DataFrame, cap: Long): DataFrame = {
    require(cap >= 1, s"cap must be positive, got $cap")
    val sizes = cells.groupBy(col("centroid_id")).agg(count(lit(1)).as("cell_n"))
    // one shuffle key (centroid_id) shared by the size join and the
    // pair join right after it — co-partitioned, no extra exchange
    val sub = cells.join(sizes, Seq("centroid_id"))
      .withColumn("sub_id",
        pmod(xxhash64(col("vec_id")),
          greatest(lit(1L), ceil(col("cell_n") / lit(cap.toDouble)).cast("long"))))
      .select(col("centroid_id"), col("sub_id"), col("vec_id"))
    sub.select(col("centroid_id"), col("sub_id"), col("vec_id").as("id_a"))
      .join(sub.select(col("centroid_id"), col("sub_id"), col("vec_id").as("id_b")),
        Seq("centroid_id", "sub_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Candidate-pair count for cell blocking over an arbitrary corpus
    * `(vec_id, embedding)` at the adaptive cell count — the at-scale
    * contract `IvfIndexSpec` pins: with K ≈ √n cells and
    * [[AssignProbes]] memberships per vector, expected candidates are
    * ~n^1.5, NOT the ~n²/K a constant K degrades to; and with the
    * hot-cell cap the bound holds even under a fully-degenerate
    * assignment (every vector in one cell).
    */
  def candidatePairCount(spark: SparkSession, e: DataFrame): Long = {
    VectorFunctions.register(spark)
    val n = e.count()
    val k = adaptiveK(n)
    val centroids = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    candidatesCapped(assignTop(e, centroids, AssignProbes), hotCellCap(n)).count()
  }

  /** Cell-blocked near-dup over the COMMITTED Lloyd-trained index's
    * centroids. This is the at-scale artifact path, so it carries the
    * hot-cell cap — a skewed corpus can't make one cell quadratic.
    * Spec-exercised; the registered `dd_embed_neardup_ivf` entry is
    * [[nearDupCellsAdaptive]], hash-checked end to end.
    */
  def nearDupCells(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val (_, centroids) = ensureIndex(spark, sfDir)
    cellPairs(spark, sfDir,
      candidatesCapped(assignTop(e, centroids, AssignProbes), hotCellCap(e.count())))
  }

  /** `dd_embed_neardup_ivf`: cell-blocked near-dup at the
    * corpus-adaptive cell count over the seed codebook — the adaptive
    * sizing (the property that keeps candidates ~n^1.5) hash-checks in
    * DuckDB. Uncapped candidate generation: the hot-cell cap's xxhash64
    * sub-partitioning has no DuckDB replay, so the cap lives on the
    * trained artifact path ([[nearDupCells]]); `IvfIndexSpec` pins that
    * capped ≡ uncapped on a non-pathological corpus, so the two differ
    * only where the cap is actually saving the job.
    */
  def nearDupCellsAdaptive(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    cellPairs(spark, sfDir,
      candidatesFrom(assignTop(e, adaptiveSeedCentroids(e), AssignProbes)))
  }

  /** Cell-blocked near-dup over the fixed codebook — fully
    * oracle-checkable (assignment ranking and index-order cosine both
    * replay in DuckDB; uncapped, since xxhash64 sub-partitioning has no
    * DuckDB replay — the cap lives on the adaptive committed path).
    */
  def nearDupCellsFixed(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val centroids = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    cellPairs(spark, sfDir, candidatesFrom(assignTop(e, centroids, AssignProbes)))
  }

  /** Semantic-dedup similarity threshold — aligned with the corpus's
    * near-dup threshold (the `dd_embed_neardup*` family thresholds at
    * 0.4 on this synthetic embedding space).
    */
  val SemDedupTau = 0.4

  /** `dd_semdedup` — SemDeDup (Abbas et al. 2023, arXiv:2303.09540)
    * over the fixed codebook: cluster the corpus, then WITHIN each
    * cluster drop every vector that has a τ-similar cell-mate LESS
    * similar to the centroid (ties by lower vec_id) — keeping, per
    * group of semantic duplicates, the example farthest from the
    * centroid, which is the paper's diversity-preserving survivor
    * rule. Differs from the near-dup family in kind: those emit PAIRS
    * for review; this emits the surviving CORPUS — the actual
    * train-set pruning operation.
    *
    * Cost shape = one assignment pass + per-cell pairwise, exactly
    * [[nearDupCellsFixed]]'s bound (quadratic in cell size, uncapped
    * here for oracle replay); the committed-index path would run the
    * same rule over [[adaptiveK]] cells (√n expected cell size) with
    * the hot-cell cap. Survivor rule is per-vector EXISTS — no
    * transitive closure — so it replays in DuckDB without recursion
    * and drops every member of a duplicate chain except its
    * least-central vector per adjacent comparison.
    */
  def semDedupFixed(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val centroids = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    semDedupRule(assign(e, centroids), centroids)
  }

  /** `dd_semdedup_prod` — [[semDedupFixed]] over the COMMITTED
    * Lloyd-trained index (`ensureIndex`: corpus-adaptive K ≈ √n cells,
    * read back, never rebuilt per query): the production regime, where
    * per-cell pairwise work is bounded at ~n per cell by the √n cell
    * sizing. no_oracle (trained centroids don't replay in SQL);
    * `dd_semdedup` is the hash-checked twin of the identical survivor
    * rule.
    */
  def semDedupProd(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val (assigned, centroids) = ensureIndex(spark, sfDir)
    semDedupRule(assigned, centroids)
  }

  /** The SemDeDup survivor rule over an assignment: drop every vector
    * with a τ-similar cell-mate LESS similar to the centroid (ties by
    * lower vec_id) — shared verbatim by the fixed-codebook oracle
    * query and the committed-index production twin.
    */
  private def semDedupRule(assigned: DataFrame,
      centroids: DataFrame): DataFrame = {
    val ac = assigned
      .join(broadcast(centroids), Seq("centroid_id"))
      .select(col("centroid_id"), col("vec_id"), col("embedding"),
        round(cos("embedding", "centroid"), 4).as("c_sim"))
    val x = ac.select(col("centroid_id"), col("vec_id").as("id_x"),
      col("embedding").as("ex"), col("c_sim").as("cx"))
    val y = ac.select(col("centroid_id"), col("vec_id").as("id_y"),
      col("embedding").as("ey"), col("c_sim").as("cy"))
    val dropped = x.join(y, Seq("centroid_id"))
      .filter(col("id_x") =!= col("id_y"))
      .filter(round(expr("cosine_sim(ex, ey)"), 4) >= SemDedupTau)
      .filter(col("cy") < col("cx") ||
        (col("cy") === col("cx") && col("id_y") < col("id_x")))
      .select(col("id_x")).distinct()
    ac.join(dropped, col("vec_id") === col("id_x"), "left_anti")
      .select(col("vec_id"), col("centroid_id"), col("c_sim"))
  }

  /** Cell occupancy histogram (index health check) — reads the
    * committed Lloyd-trained assignments, no rebuild. Spec-exercised;
    * the registered `sim_ivf_cells` entry is [[cellStatsAdaptive]].
    */
  def cellStats(spark: SparkSession, sfDir: String): DataFrame = {
    val (assigned, _) = ensureIndex(spark, sfDir)
    assigned.groupBy(col("centroid_id")).agg(count(lit(1)).as("n_vectors"))
  }

  /** `sim_ivf_cells`: occupancy histogram of the adaptive-K
    * seed-codebook assignment — hash-checked, including the K ≈ √n cell
    * count itself (the histogram's row count IS the adaptive k, so the
    * oracle pins the sizing formula, not just the assignment tie rule).
    */
  def cellStatsAdaptive(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    assign(e, adaptiveSeedCentroids(e))
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_vectors"))
  }

  /** Cell histogram over the FIXED codebook (no Lloyd refinement) — the
    * oracle-checked twin of [[cellStats]], same assignment tie rule as
    * `sim_ivf_fixed`.
    */
  def cellStatsFixed(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val centroids = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    assign(e, centroids)
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_vectors"))
  }

  /** One Lloyd refinement round, hash-checkable end to end: assign every
    * vector to its nearest fixed-codebook centroid (the tie rule
    * `sim_ivf_fixed` already oracle-matches), then emit the refined
    * centroid coordinates as per-dimension means at fixed 6dp rounding —
    * long form (centroid_id, d, m, n_members). This pins the k-means
    * REFINEMENT arithmetic against DuckDB, not just the search path; the
    * multi-round [[build]] loop is this step iterated, so its one
    * spec-only remainder is loop plumbing rather than math.
    */
  def oneRound(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val centroids = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    assign(e, centroids)
      .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("centroid_id"), col("d").cast("long").as("d"))
      .agg(round(avg(col("x").cast("double")), 6).as("m"),
        count(lit(1)).as("n_members"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ivf_build" -> (buildQuery(_, _)),
    "sim_ivf_search" -> (searchAdaptive(_, _)),
    "sim_ivf_search_wide" -> (searchAdaptiveWide(_, _)),
    "sim_ivf_fixed" -> (searchFixed(_, _)),
    "sim_ivf_recall" -> (recallFixed(_, _)),
    "sim_ivf_multiprobe" -> (searchFixedMultiprobe(_, _)),
    "sim_ivf_delete" -> (searchFixedAfterDelete(_, _)),
    "sim_ivf_filtered" -> (searchFixedFiltered(_, _)),
    "sim_ivf_one_round" -> (oneRound(_, _)),
    "sim_ivf_cells" -> (cellStatsAdaptive(_, _)),
    "sim_ivf_cells_fixed" -> (cellStatsFixed(_, _)),
    "dd_embed_neardup_ivf" -> (nearDupCellsAdaptive(_, _)),
    "dd_embed_neardup_ivf_fixed" -> (nearDupCellsFixed(_, _)),
    "dd_semdedup" -> (semDedupFixed(_, _)),
    "dd_semdedup_prod" -> (semDedupProd(_, _)))

  /** The centroid-codebook CTE both oracle families share: the fixed
    * form pins `vec_id < K`; the adaptive form computes K ≈ √n from
    * `count(*)` exactly as [[adaptiveK]] does (same `greatest`/`ceil`/
    * `sqrt` over IEEE doubles in both engines), so the sizing formula
    * itself is hash-checked — the `samp_shuffle_shards` construction.
    */
  private[ops] def centroidCte(adaptive: Boolean): String =
    if (adaptive)
      s"""ks AS (
         |  SELECT greatest($K, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k
         |  FROM embeddings),
         |c AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid
         |  FROM embeddings, ks WHERE vec_id < ks.k)""".stripMargin
    else
      s"""c AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid
         |  FROM embeddings WHERE vec_id < $K)""".stripMargin

  /** DuckDB oracles: same assignment tie rule (max sim, then lowest
    * centroid id), probe ranking on the RAW similarity, re-rank on the
    * 4dp-rounded one — mirroring the Spark plan exactly; each query
    * shape exists at both the fixed and the adaptive codebook size.
    */
  val oracles: Map[String, String] = {
    val cosEC = Similarity.sqlCos("e.embedding", "c.centroid")
    val cosQC = Similarity.sqlCos("q.qv", "c.centroid")
    val cosVQ = Similarity.sqlCos("a.embedding", "q.qv")
    def searchSql(nprobe: Int, adaptive: Boolean,
        exclude: String = ""): String =
      s"""WITH ${centroidCte(adaptive)},
         |a AS (
         |  SELECT vec_id, embedding, centroid_id FROM (
         |    SELECT e.vec_id, e.embedding, c.centroid_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY $cosEC DESC, c.centroid_id) AS rn
         |    FROM embeddings e, c) t WHERE rn = 1),
         |q AS (
         |  SELECT a.vec_id AS q_id, a.embedding AS qv FROM a
         |  WHERE a.vec_id < ${Similarity.QuerySetSize}),
         |probes AS (
         |  SELECT q_id, qv, centroid_id FROM (
         |    SELECT q.q_id, q.qv, c.centroid_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY $cosQC DESC, c.centroid_id) AS rn
         |    FROM q, c) t WHERE rn <= $nprobe)
         |SELECT q_id, vec_id, centroid_id, cos_sim, rnk FROM (
         |  SELECT q.q_id, a.vec_id, a.centroid_id,
         |    round($cosVQ, 4) AS cos_sim,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY round($cosVQ, 4) DESC, a.vec_id) AS rnk
         |  FROM a JOIN probes q ON a.centroid_id = q.centroid_id
         |  WHERE a.vec_id <> q.q_id$exclude) s
         |WHERE rnk <= 5""".stripMargin
    val cosXY = Similarity.sqlCos("x.embedding", "y.embedding")
    def nearDupSql(adaptive: Boolean): String =
      s"""WITH ${centroidCte(adaptive)},
         |a AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT e.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY $cosEC DESC, c.centroid_id) AS rn
         |    FROM embeddings e, c) t WHERE rn <= $AssignProbes),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM a x JOIN a y
         |    ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id)
         |SELECT cand.id_a, cand.id_b, round($cosXY, 4) AS cos_sim
         |FROM cand
         |JOIN embeddings x ON cand.id_a = x.vec_id
         |JOIN embeddings y ON cand.id_b = y.vec_id
         |WHERE round($cosXY, 4) >= 0.4""".stripMargin
    def cellsSql(adaptive: Boolean): String =
      s"""WITH ${centroidCte(adaptive)},
         |a AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT e.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY $cosEC DESC, c.centroid_id) AS rn
         |    FROM embeddings e, c) t WHERE rn = 1)
         |SELECT centroid_id, count(*) AS n_vectors
         |FROM a GROUP BY centroid_id""".stripMargin
    Map(
      "sim_ivf_fixed" -> searchSql(NProbe, adaptive = false),
      "sim_ivf_delete" -> searchSql(NProbe, adaptive = false,
        exclude = s" AND a.vec_id % $TakedownMod <> 0"),
      "sim_ivf_recall" ->
        s"""WITH ${centroidCte(false)},
           |a AS (
           |  SELECT vec_id, embedding, centroid_id FROM (
           |    SELECT e.vec_id, e.embedding, c.centroid_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY $cosEC DESC, c.centroid_id) AS rn
           |    FROM embeddings e, c) t WHERE rn = 1),
           |q AS (
           |  SELECT a.vec_id AS q_id, a.embedding AS qv FROM a
           |  WHERE a.vec_id < ${Similarity.QuerySetSize}),
           |probes AS (
           |  SELECT q_id, qv, centroid_id FROM (
           |    SELECT q.q_id, q.qv, c.centroid_id,
           |      row_number() OVER (PARTITION BY q.q_id
           |        ORDER BY $cosQC DESC, c.centroid_id) AS rn
           |    FROM q, c) t WHERE rn <= $NProbe),
           |approx AS (
           |  SELECT q_id, vec_id FROM (
           |    SELECT q.q_id, a.vec_id,
           |      row_number() OVER (PARTITION BY q.q_id
           |        ORDER BY round($cosVQ, 4) DESC, a.vec_id) AS rnk
           |    FROM a JOIN probes q ON a.centroid_id = q.centroid_id
           |    WHERE a.vec_id <> q.q_id) s
           |  WHERE rnk <= 5),
           |exact AS (
           |  SELECT q_id, vec_id FROM (
           |    SELECT q.q_id, e.vec_id,
           |      row_number() OVER (PARTITION BY q.q_id
           |        ORDER BY round(${Similarity.sqlCos("e.embedding", "q.qv")}, 4) DESC,
           |          e.vec_id) AS rnk
           |    FROM embeddings e, q WHERE e.vec_id <> q.q_id) s
           |  WHERE rnk <= 5)
           |SELECT ap.q_id, CAST(count(ex.vec_id) AS BIGINT) AS n_hits,
           |  round(count(ex.vec_id) / 5.0, 4) AS recall
           |FROM approx ap LEFT JOIN exact ex
           |  ON ap.q_id = ex.q_id AND ap.vec_id = ex.vec_id
           |GROUP BY ap.q_id""".stripMargin,
      "sim_ivf_multiprobe" -> searchSql(NProbeWide, adaptive = false),
      // pre-filtered search: the predicate restricts the CANDIDATE
      // assignment only; queries q come from the unfiltered corpus
      "sim_ivf_filtered" ->
        s"""WITH ${centroidCte(false)},
           |a AS (
           |  SELECT vec_id, embedding, centroid_id FROM (
           |    SELECT e.vec_id, e.embedding, c.centroid_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY $cosEC DESC, c.centroid_id) AS rn
           |    FROM embeddings e, c WHERE e.$FilterPredSql) t WHERE rn = 1),
           |q AS (
           |  SELECT vec_id AS q_id, embedding AS qv FROM embeddings
           |  WHERE vec_id < ${Similarity.QuerySetSize}),
           |probes AS (
           |  SELECT q_id, qv, centroid_id FROM (
           |    SELECT q.q_id, q.qv, c.centroid_id,
           |      row_number() OVER (PARTITION BY q.q_id
           |        ORDER BY $cosQC DESC, c.centroid_id) AS rn
           |    FROM q, c) t WHERE rn <= $NProbeWide)
           |SELECT q_id, vec_id, centroid_id, cos_sim, rnk FROM (
           |  SELECT q.q_id, a.vec_id, a.centroid_id,
           |    round($cosVQ, 4) AS cos_sim,
           |    row_number() OVER (PARTITION BY q.q_id
           |      ORDER BY round($cosVQ, 4) DESC, a.vec_id) AS rnk
           |  FROM a JOIN probes q ON a.centroid_id = q.centroid_id
           |  WHERE a.vec_id <> q.q_id) s
           |WHERE rnk <= 5""".stripMargin,
      "sim_ivf_search" -> searchSql(NProbe, adaptive = true),
      "sim_ivf_search_wide" -> searchSql(NProbeWide, adaptive = true),
      "dd_embed_neardup_ivf_fixed" -> nearDupSql(adaptive = false),
      "dd_embed_neardup_ivf" -> nearDupSql(adaptive = true),
      "dd_semdedup" -> {
        val cosAC = Similarity.sqlCos("a.embedding", "c.centroid")
        s"""WITH ${centroidCte(adaptive = false)},
           |a AS (
           |  SELECT vec_id, embedding, centroid_id FROM (
           |    SELECT e.vec_id, e.embedding, c.centroid_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY $cosEC DESC, c.centroid_id) AS rn
           |    FROM embeddings e, c) t WHERE rn = 1),
           |ac AS (
           |  SELECT a.vec_id, a.embedding, a.centroid_id,
           |    round($cosAC, 4) AS c_sim
           |  FROM a JOIN c ON a.centroid_id = c.centroid_id),
           |dropped AS (
           |  SELECT DISTINCT x.vec_id AS id_x
           |  FROM ac x JOIN ac y
           |    ON x.centroid_id = y.centroid_id AND x.vec_id <> y.vec_id
           |  WHERE round($cosXY, 4) >= $SemDedupTau
           |    AND (y.c_sim < x.c_sim
           |      OR (y.c_sim = x.c_sim AND y.vec_id < x.vec_id)))
           |SELECT ac.vec_id, ac.centroid_id, ac.c_sim
           |FROM ac LEFT JOIN dropped ON ac.vec_id = dropped.id_x
           |WHERE dropped.id_x IS NULL""".stripMargin
      },
      "sim_ivf_cells_fixed" -> cellsSql(adaptive = false),
      "sim_ivf_cells" -> cellsSql(adaptive = true),
      "sim_ivf_one_round" ->
        s"""WITH c AS (
           |  SELECT vec_id AS centroid_id, embedding AS centroid
           |  FROM embeddings WHERE vec_id < $K),
           |a AS (
           |  SELECT vec_id, embedding, centroid_id FROM (
           |    SELECT e.vec_id, e.embedding, c.centroid_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY $cosEC DESC, c.centroid_id) AS rn
           |    FROM embeddings e, c) t WHERE rn = 1)
           |SELECT centroid_id, CAST(d AS BIGINT) AS d,
           |  round(avg(CAST(embedding[d + 1] AS DOUBLE)), 6) AS m,
           |  count(*) AS n_members
           |FROM a, (SELECT unnest(range(${Similarity.Dim})) AS d) dims
           |GROUP BY centroid_id, d""".stripMargin)
  }
}
