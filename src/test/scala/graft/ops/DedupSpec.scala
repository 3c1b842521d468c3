package graft.ops

import graft.SparkSpec

/** Dedup-suite invariants that the SQL oracle can't express:
  * MinHash-LSH (Spark-native hashes) is validated against the exact
  * n-gram Jaccard pairs it approximates.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val exact: Set[(Long, Long, Double)] =
    Dedup.ngramJaccardPairs(spark, sf0001)
      .select("doc_a", "doc_b", "jacc").as[(Long, Long, Double)]
      .collect().toSet

  lazy val lsh: Map[(Long, Long), Double] =
    Dedup.minhashCandidates(spark, sf0001)
      .select("doc_a", "doc_b", "est_jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap

  test("planted near-duplicates exist at sf0.001") {
    assert(exact.nonEmpty, "test data should contain near-dup pairs")
  }

  test("MinHash-LSH recalls every high-similarity pair (jacc >= 0.7)") {
    val truth = exact.filter(_._3 >= 0.7).map(p => (p._1, p._2))
    assert(truth.nonEmpty)
    val missed = truth -- lsh.keySet
    assert(missed.isEmpty, s"LSH missed: $missed")
  }

  test("typed-Aggregator MinHash recalls the same high-similarity pairs") {
    val truth = exact.filter(_._3 >= 0.7).map(p => (p._1, p._2))
    assert(truth.nonEmpty)
    val aggPairs = Dedup.minhashCandidatesAgg(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val missed = truth -- aggPairs
    assert(missed.isEmpty, s"aggregator-LSH missed: $missed")
  }

  test("MinHash estimate tracks exact Jaccard within 0.25") {
    val joined = exact.flatMap(p => lsh.get((p._1, p._2)).map(e => (p._3, e)))
    assert(joined.nonEmpty)
    joined.foreach { case (ex, est) =>
      assert(math.abs(ex - est) < 0.25, s"exact=$ex est=$est")
    }
  }

  test("prefix-filtered Jaccard returns exactly the unfiltered pair set") {
    val prefix = Dedup.prefixJaccardPairs(spark, sf0001)
      .select("doc_a", "doc_b", "jacc").as[(Long, Long, Double)]
      .collect().toSet
    assert(prefix == exact,
      s"prefix filter changed the result: extra=${prefix -- exact} missing=${exact -- prefix}")
  }

  test("prefix filter strictly shrinks the candidate join") {
    val sh = Dedup.cappedShinglesOf(graft.Tables.documents(spark, sf0001))
    val full = sh.as("a").join(sh.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    val pruned = Dedup.prefixCandidatesOf(sh).count()
    assert(pruned < full, s"prefix candidates $pruned not below raw $full")
    assert(pruned >= exact.size.toLong,
      "fewer candidates than true pairs — the filter dropped a qualifying pair")
  }

  test("simhash fingerprints are 64-bit strings and near-dups are symmetric-free") {
    val fp = SimHash.fingerprints(spark, sf0001)
    assert(fp.filter("length(simhash) != 64").count() == 0)
    val pairs = SimHash.nearDupPairs(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.forall(p => p._1 < p._2), "canonical a<b ordering only")
  }

  test("near-dup clusters are consistent with the pair graph") {
    val clusters = Dedup.nearDupClusters(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    // every paired doc is labeled, both ends share a cluster, and the
    // cluster id is a member of the cluster (the min, by construction)
    exact.foreach { case (a, b, _) =>
      assert(clusters.contains(a) && clusters.contains(b))
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keySet.min == cid, s"cluster $cid id must be its min member")
    }
  }

  test("pointer-jumping converges in O(log n) rounds on a planted chain") {
    // a 300-node path graph has diameter 299: hop-only min-label
    // propagation would need 299 rounds and blow the 64-round cap;
    // hop+jump doubles the shortcut distance per round
    val pairs = spark.range(299).selectExpr("id AS doc_a", "id + 1 AS doc_b")
    val (labels, rounds) = Dedup.clustersFromPairs(pairs)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size == 300)
    assert(got.values.forall(_ == 0L), "single chain must collapse to cluster 0")
    assert(rounds <= 16, s"chain of 300 took $rounds rounds — jumping broken?")
  }

  test("exact dedup survivors preserve distinct content count") {
    val d = graft.Tables.documents(spark, sf0001)
    val distinctTexts = d.select("text").distinct().count()
    assert(Dedup.exactSurvivors(spark, sf0001).count() == distinctTexts)
    assert(Dedup.exactGroups(spark, sf0001).count() == distinctTexts)
  }

  test("incremental dedup runs consecutive batches against a persisted index") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("corpus-index").toString
    val d = graft.Tables.documents(spark, sf0001).select("doc_id", "text")
    val corpus = d.filter(col("doc_id") % 2 === 0)
    val batch1 = d.filter(col("doc_id") % 2 === 1)
    // batch2 = batch1's texts under fresh ids: all 'new' while only the
    // corpus is indexed, all 'exact_dup' once batch1 has been folded in
    val batch2 = batch1.select((col("doc_id") + 100000).as("doc_id"), col("text"))

    Dedup.initCorpusIndex(corpus, dir)
    val r1 = Dedup.incrementalAgainstIndex(spark, batch1, dir)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(r1.size == batch1.count(), "one verdict per batch-1 doc")
    assert(!r1.values.exists(_ == "exact_dup"),
      "sf0.001 documents are content-distinct; batch 1 must plant no exact dup")

    // state advances between batches THROUGH THE ARTIFACT, not a
    // recomputation: fold batch1 in, then batch2's copies are caught
    Dedup.appendToCorpusIndex(spark, batch1, dir)
    val r2 = Dedup.incrementalAgainstIndex(spark, batch2, dir)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(r2.size == batch1.count())
    assert(r2.values.forall(_ == "exact_dup"),
      s"every batch-2 doc repeats a batch-1 text; got ${r2.values.groupBy(identity).view.mapValues(_.size).toMap}")

    // idempotent re-ingest: folding batch1 again must not flip verdicts
    // (self-matches are excluded)
    Dedup.appendToCorpusIndex(spark, batch1, dir)
    val r1Again = Dedup.incrementalAgainstIndex(spark, batch1, dir)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(!r1Again.values.exists(_ == "exact_dup"),
      "a re-ingested doc must not count as its own duplicate")
  }

  test("stop-shingle cap bounds the candidate join when a shingle goes hot") {
    import org.apache.spark.sql.functions.col
    // 60 docs share one viral 5-gram (quadratic join fuel, zero dedup
    // signal); one genuine near-dup pair shares a NON-hot shingle.
    val hot = "the quick brown fox jumps"
    val docs = (0 until 60).map(i => (i.toLong, s"$hot u${i}a u${i}b u${i}c u${i}d")) ++
      Seq((100L, "alpha beta gamma delta epsilon zeta"),
        (101L, "alpha beta gamma delta epsilon eta"))
    val df = docs.toDF("doc_id", "text")
    def candidatePairs(sh: org.apache.spark.sql.DataFrame): Long =
      sh.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val uncapped = candidatePairs(Dedup.shinglesOf(df))
    assert(uncapped >= 60L * 59 / 2,
      s"without the cap the hot shingle yields all-pairs: $uncapped")
    // cap at 50 < 60: the viral shingle is dropped, the candidate join
    // collapses to the one genuinely-shared shingle — sub-quadratic by
    // construction, and the dedup signal survives
    val capped = candidatePairs(Dedup.cappedShinglesOf(df, maxFreq = 50))
    assert(capped == 1L,
      s"cap must drop the hot shingle but keep the real near-dup pair: $capped")
  }
}
