package graft.ops

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  test("takedown delete: O(deletes) tombstone artifact, assignments untouched, " +
    "no deleted id ever served") {
    import org.apache.spark.sql.functions.col
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val served = IvfIndex.searchFixedAfterDelete(spark, sf0001)
    // no tombstoned vector appears in any top-5
    assert(served.filter(col("vec_id") % IvfIndex.TakedownMod === 0).count() == 0)
    assert(served.count() > 0)
    // the delete wrote a tombstone table only: assignments artifact is
    // byte-identical to a fresh assignment of the same corpus (the
    // takedown never rewrites the corpus-sized artifact)
    // the memoized staged dir (same one the served query read)
    val dir = IvfIndex.stagedDeleteIndex(spark, sf0001)
    def bytesUnder(rel: String): Long = {
      val s = Files.walk(Paths.get(dir, rel).toRealPath())
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(Files.size(_)).sum
      finally s.close()
    }
    assert(bytesUnder("tombstones") < bytesUnder("assignments") / 4)
    // deletes are incremental: a second deleteCommit unions in (an id
    // absent from the corpus, so the shared staged fixture's served
    // results are unchanged for any later reader in this JVM)
    val extra = Seq(999999L).toDF("vec_id")
    IvfIndex.deleteCommit(spark, dir, extra)
    val tomb = spark.read.parquet(s"$dir/tombstones")
    assert(tomb.filter(col("vec_id") === 999999L).count() == 1)
    assert(tomb.filter(col("vec_id") % IvfIndex.TakedownMod === 0).count() > 0)
  }

  test("index build partitions the corpus into at most adaptiveK non-empty cells") {
    val n = graft.Tables.embeddings(spark, sf0001).count()
    val cells = IvfIndex.cellStats(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(cells.length <= IvfIndex.adaptiveK(n) && cells.length > 1)
    assert(cells.map(_._2).sum == n)
  }

  test("committed index is read back, not rebuilt, and matches a fresh build") {
    // buildCommit writes the artifact; ensureIndex must serve the exact
    // same assignments from the committed tables
    val n = graft.Tables.embeddings(spark, sf0001).count()
    val (a1, c1) = IvfIndex.buildCommit(spark, sf0001)
    val committed = a1.select("vec_id", "centroid_id")
      .as[(Long, Long)].collect().toMap
    // Lloyd may drop emptied cells, never add them
    val nCells = c1.count()
    assert(nCells > 1 && nCells <= IvfIndex.adaptiveK(n))
    val (a2, _) = IvfIndex.ensureIndex(spark, sf0001)
    val reread = a2.select("vec_id", "centroid_id")
      .as[(Long, Long)].collect().toMap
    assert(reread == committed)
    val (fresh, _) = IvfIndex.build(spark, sf0001)
    assert(fresh.select("vec_id", "centroid_id")
      .as[(Long, Long)].collect().toMap == committed,
      "persisted assignments must equal a from-scratch deterministic build")
  }

  test("wider probing (nprobe=4) recall >= nprobe=2 recall vs brute-force KNN") {
    // ground truth: exact top-5 per query from the brute-force path
    val truth = Similarity.knnPerQuery(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      (truth & got).size.toDouble / truth.size
    }
    val narrow = recallOf(IvfIndex.searchFixed(spark, sf0001))
    val wide = recallOf(IvfIndex.searchFixedMultiprobe(spark, sf0001))
    assert(wide >= narrow,
      s"probing more cells must not lose neighbors: nprobe2=$narrow nprobe4=$wide")
    assert(wide > 0.0)
  }

  test("ensureIndex rebuilds when the corpus files change underneath it") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-corpus").toString
    val full = graft.Tables.embeddings(spark, sf0001)
    full.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val n1 = full.count()
    val (a1, _) = IvfIndex.ensureIndex(spark, tmp)
    assert(a1.count() == n1)
    // shrink the corpus IN PLACE — same path, different files. A fresh
    // session reads the new listing (Tables memoizes per session); the
    // committed index still carries the old corpus's fingerprint, so
    // ensureIndex must rebuild rather than serve stale assignments.
    val s2 = spark.newSession()
    val half = graft.Tables.embeddings(s2, sf0001).filter("vec_id % 2 = 0")
    val n2 = half.count()
    half.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val (a2, _) = IvfIndex.ensureIndex(s2, tmp)
    assert(a2.count() == n2,
      "changed corpus must force a rebuild, not serve stale assignments")
  }

  test("append refuses a corpus rewritten in place (not append-only growth)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-mut").toString
    graft.Tables.embeddings(spark, sf0001).filter("vec_id < 300")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    IvfIndex.ensureIndex(spark, tmp)
    // rewrite the corpus IN PLACE: same row count, different files —
    // the committed assignments now describe embeddings that no longer
    // exist, so appending must refuse rather than re-stamp the meta
    // over a stale base (ensureIndex would correctly rebuild; append
    // must not launder the staleness away)
    val s2 = spark.newSession()
    graft.Tables.embeddings(s2, sf0001).filter("vec_id < 300")
      .withColumn("embedding", org.apache.spark.sql.functions.expr(
        "transform(embedding, x -> CAST(x * 2.0 AS FLOAT))"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val batch = graft.Tables.embeddings(s2, sf0001).filter("vec_id >= 300")
      .select("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.appendCommit(s2, tmp, batch)
    }
    assert(ex.getMessage.contains("not append-only"), ex.getMessage)
  }

  test("incremental append serves the grown corpus without a rebuild") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    val full = graft.Tables.embeddings(spark, sf0001)
    val base = full.filter("vec_id < 300")
    base.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val (a0, c0) = IvfIndex.ensureIndex(spark, tmp)
    val nBase = a0.count()
    val centsBefore = c0.select("centroid_id", "centroid")
      .as[(Long, Seq[Float])].collect().toMap
    // the corpus grows in place (new vectors land as appended files) —
    // a fresh session sees the new listing
    val s2 = spark.newSession()
    val batch = graft.Tables.embeddings(s2, sf0001).filter("vec_id >= 300")
    batch.write.mode("append").parquet(s"$tmp/embeddings.parquet")
    val nNew = batch.count()
    val (a1, c1) = IvfIndex.appendCommit(s2, tmp,
      batch.select("vec_id", "embedding"))
    assert(a1.count() == nBase + nNew, "append must cover the grown corpus")
    // centroids unchanged: append assigns, never retrains
    val centsAfter = c1.select("centroid_id", "centroid")
      .as[(Long, Seq[Float])].collect().toMap
    assert(centsAfter == centsBefore, "append must not move centroids")
    // the appended artifact is CURRENT: ensureIndex serves it as-is
    // (a rebuild would have re-run Lloyd over the grown corpus and
    // produced adaptiveK(400) > adaptiveK(300) cells)
    val (a2, c2) = IvfIndex.ensureIndex(s2, tmp)
    assert(c2.select("centroid_id", "centroid")
      .as[(Long, Seq[Float])].collect().toMap == centsBefore,
      "ensureIndex after append must serve the appended artifact, not rebuild")
    assert(a2.count() == nBase + nNew)
    // new vectors are assigned to their true nearest committed centroid
    val got = a2.filter("vec_id >= 300").select("vec_id", "centroid_id")
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    val emb = batch.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    got.foreach { case (v, cid) =>
      val best = centsBefore.toSeq
        .map { case (c, cv) => (c, cosine(emb(v), cv)) }
        .sortBy(r => (-r._2, r._1)).head._1
      assert(cid == best, s"vec $v assigned to $cid, nearest is $best")
    }
  }

  test("committed-index wide probe (nprobe=4) recall >= default committed path") {
    val truth = Similarity.knnPerQuery(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      (truth & got).size.toDouble / truth.size
    }
    val narrow = recallOf(IvfIndex.search(spark, sf0001))
    val wide = recallOf(IvfIndex.searchWide(spark, sf0001))
    assert(wide >= narrow,
      s"committed path: probing more cells must not lose neighbors: nprobe2=$narrow nprobe4=$wide")
    // absolute floor: the adaptive cell count (K ≈ √n, larger than the
    // old constant 8) must not collapse recall — each probe now covers a
    // smaller corpus fraction, so this is the regression guard for the
    // K-scaling change
    assert(narrow >= 0.3, s"committed nprobe=2 recall collapsed: $narrow")
    assert(wide >= 0.4, s"committed nprobe=4 recall collapsed: $wide")
  }

  test("adaptive-K candidate pairs grow ~n^1.5, not n^2, on a 10x-larger corpus") {
    // deterministic pseudo-random corpora (no Math.random — repeatable):
    // 16-dim vectors with hash-derived components in (-1, 1)
    def corpus(n: Int) = spark.range(n).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 15), d -> CAST((hash(id * 31 + d) % 997) / 997.0 AS FLOAT)) AS embedding")
    val small = 600
    val big = 6000
    val cSmall = IvfIndex.candidatePairCount(spark, corpus(small))
    val cBig = IvfIndex.candidatePairCount(spark, corpus(big))
    assert(cSmall > 0 && cBig > 0)
    val ratio = cBig.toDouble / cSmall
    // n^1.5 scaling predicts ~10^1.5 ≈ 31.6x for a 10x corpus; constant-K
    // blocking degrades to ~n^2/K ≈ 100x. Assert well below quadratic.
    assert(ratio < 60.0,
      s"candidate growth $ratio ( $cSmall -> $cBig ) looks quadratic — K must scale with n")
    // and the blocking must actually prune: far fewer candidates than all pairs
    assert(cBig < big.toLong * (big - 1) / 2 / 4,
      s"cell blocking pruned too little: $cBig candidates for $big vectors")
  }

  test("hot-cell cap bounds candidates on a fully-degenerate corpus") {
    // pathological corpus: every vector within epsilon of ONE direction,
    // so the whole corpus assigns to the same top-2 cells. adaptiveK
    // only fixes the EXPECTED cell size — here assignment is maximally
    // skewed and uncapped pair generation would be ~n^2/2 per cell.
    val n = 2000
    val e = spark.range(n).selectExpr(
      "id AS vec_id",
      // dominant first component + deterministic 1e-4-scale noise:
      // cosine between any two vectors is ~1, all near one centroid
      "transform(sequence(0, 15), d -> CAST(CASE WHEN d = 0 THEN 1.0 " +
        "ELSE (hash(id * 31 + d) % 997) / 9970000.0 END AS FLOAT)) AS embedding")
    val cap = IvfIndex.hotCellCap(n)
    val got = IvfIndex.candidatePairCount(spark, e)
    // per membership each vector pairs with <= ~cap others; AssignProbes
    // memberships with 2x slack for hash-split variance
    val bound = IvfIndex.AssignProbes.toLong * n * cap
    assert(got <= bound,
      s"degenerate corpus produced $got candidates > O(n^1.5) bound $bound")
    // and far below the ~n^2/2 a single uncapped hot cell degrades to
    assert(got < n.toLong * (n - 1) / 4,
      s"$got candidates is within 2x of all-pairs — the cap did not bite")
    assert(got > 0, "capped blocking must still produce candidates")
  }

  test("cap is inert on a well-spread corpus (sub_id constant)") {
    // the normal-corpus contract: no cell exceeds the cap, so capped
    // and uncapped candidate sets are identical
    def corpus(n: Int) = spark.range(n).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 15), d -> CAST((hash(id * 31 + d) % 997) / 997.0 AS FLOAT)) AS embedding")
    val e = corpus(600)
    graft.functions.VectorFunctions.register(spark)
    val k = IvfIndex.adaptiveK(600)
    val centroids = e.filter($"vec_id" < k)
      .select($"vec_id".as("centroid_id"), $"embedding".as("centroid"))
    val cells = e.crossJoin(org.apache.spark.sql.functions.broadcast(centroids))
      .selectExpr("vec_id", "centroid_id",
        "cosine_sim(embedding, centroid) AS sim")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"vec_id")
          .orderBy($"sim".desc, $"centroid_id".asc)))
      .filter($"rn" <= IvfIndex.AssignProbes)
      .select($"vec_id", $"centroid_id")
    val capped = IvfIndex.candidatesCapped(cells, IvfIndex.hotCellCap(600))
      .as[(Long, Long)].collect().toSet
    val uncapped = cells.select($"centroid_id", $"vec_id".as("id_a"))
      .join(cells.select($"centroid_id", $"vec_id".as("id_b")), Seq("centroid_id"))
      .filter($"id_a" < $"id_b").select($"id_a", $"id_b")
      .as[(Long, Long)].collect().toSet
    assert(capped == uncapped,
      s"cap changed a well-spread corpus: ${capped.size} vs ${uncapped.size}")
  }

  test("cell-blocked near-dup pairs are a sound subset of brute force") {
    val exact = Similarity.embedNearDupPairs(spark, sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cell = IvfIndex.nearDupCellsFixed(spark, sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((cell -- exact).isEmpty,
      "every cell-blocked pair must pass the exact cosine filter")
    assert(cell.nonEmpty && exact.nonEmpty)
    // single-probe blocking misses boundary-straddling pairs by design;
    // it must still recover a meaningful fraction at test scale
    val recall = cell.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"cell-blocked recall $recall (${cell.size}/${exact.size})")
  }

  test("trained-index and adaptive-seed near-dup paths are both sound") {
    // the committed (Lloyd-trained, hot-cell-capped) path lost its
    // driver-gate registration to the hash-checked adaptive twin — keep
    // it exercised here: both must emit only true ≥-threshold pairs
    val exact = Similarity.embedNearDupPairs(spark, sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    for ((name, df) <- Seq(
        "trained" -> IvfIndex.nearDupCells(spark, sf0001),
        "adaptive" -> IvfIndex.nearDupCellsAdaptive(spark, sf0001))) {
      val got = df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.nonEmpty, s"$name produced no pairs")
      assert((got -- exact).isEmpty,
        s"$name emitted pairs failing the exact cosine filter")
    }
  }

  test("search is exact within the probed cells") {
    graft.functions.VectorFunctions.register(spark)
    val got = IvfIndex.search(spark, sf0001)
      .select("q_id", "vec_id", "rnk").as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // recompute the in-probe brute-force ranking and compare
    val (assigned, centroids) = IvfIndex.build(spark, sf0001)
    val byCell = assigned.select("vec_id", "centroid_id")
      .as[(Long, Long)].collect().toMap
    val cents = centroids.select("centroid_id", "centroid")
      .as[(Long, Seq[Float])].collect()
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    got.groupBy(_._1).foreach { case (q, rows) =>
      // derive the probe set exactly as search does: top-NProbe
      // centroids by (cosine desc, centroid_id asc)
      val probedCells = cents
        .map { case (cid, cv) => (cid, cosine(emb(q), cv)) }
        .sortBy(r => (-r._2, r._1)).take(IvfIndex.NProbe).map(_._1).toSet
      val candidates = byCell.collect {
        case (v, c) if probedCells.contains(c) && v != q => v
      }.toSeq
      val expected = candidates
        .map(v => (v, math.rint(cosine(emb(q), emb(v)) * 10000) / 10000))
        .sortBy(r => (-r._2, r._1)).take(5).map(_._1)
      val actual = rows.sortBy(_._3).map(_._2).toSeq
      assert(actual == expected,
        s"q=$q actual=$actual expected=$expected")
    }
  }

  test("semdedup survivors: every dropped vector has a more-peripheral " +
      "tau-similar cell-mate among the survivors' complement rule") {
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, sf0001)
    val n = e.count()
    val survivors = IvfIndex.semDedupFixed(spark, sf0001)
    val kept = survivors.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.size < n,
      s"semdedup must drop something on this corpus (kept ${kept.size}/$n)")
    // survivors carry their cell and centrality; re-derive the drop rule
    // over the full corpus and check it partitions exactly
    val centroids = e.filter(col("vec_id") < IvfIndex.K)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    val ac = e.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        expr("cosine_sim(embedding, centroid)").as("sim"))
      .groupBy(col("vec_id"))
      .agg(first(col("embedding")).as("embedding"),
        expr("max_by(centroid_id, struct(sim, -centroid_id))").as("cid"),
        expr("round(max(sim), 4)").as("c_sim"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getLong(2), r.getDouble(3)))
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val expectDropped = (for {
      x <- ac
      y <- ac
      if x._1 != y._1 && x._3 == y._3
      if math.rint(cosine(x._2, y._2) * 10000) / 10000 >= IvfIndex.SemDedupTau
      if y._4 < x._4 || (y._4 == x._4 && y._1 < x._1)
    } yield x._1).toSet
    assert(kept == ac.map(_._1).toSet -- expectDropped)
  }

  test("semdedup over the committed index applies the same rule shape") {
    val n = graft.Tables.embeddings(spark, sf0001).count()
    val kept = IvfIndex.semDedupProd(spark, sf0001)
    val ids = kept.select("vec_id").collect().map(_.getLong(0))
    // a pruned corpus: unique survivors, strictly fewer than the corpus
    assert(ids.distinct.length == ids.length)
    assert(ids.nonEmpty && ids.length < n)
    // every survivor carries its cell + centrality for downstream audit
    assert(kept.columns.toSeq == Seq("vec_id", "centroid_id", "c_sim"))
  }
}
