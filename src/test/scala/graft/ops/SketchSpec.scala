package graft.ops

import graft.SparkSpec

/** Semantic invariants for the sketch-family operators added in round 2:
  * robust winnowing, KMV distinct estimation, multi-probe LSH.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("robust winnowing density is ~2/(w+1) and positions are valid") {
    val fps = TextOps.winnowRobust(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val nWindows = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "length(text) - 7 AS n")
      .filter("n >= 8").as[(Long, Long)].collect().toMap
    val byDoc = fps.groupBy(_._1)
    assert(byDoc.keySet == nWindows.keySet, "every eligible doc fingerprinted")
    byDoc.foreach { case (id, rows) =>
      val n = nWindows(id)
      // selection picks one position per w-window: density in [1/w, 1]
      assert(rows.length >= n / TextOps.WinnowW / 2, s"doc $id too sparse")
      assert(rows.forall(r => r._2 >= 1 && r._2 <= n), s"doc $id position range")
      assert(rows.map(_._2).distinct.length == rows.length, s"doc $id distinct")
    }
    val density = fps.length.toDouble / nWindows.values.sum
    val expected = 2.0 / (TextOps.WinnowW + 1)
    assert(math.abs(density - expected) < expected * 0.5,
      s"density $density vs expected ~$expected")
  }

  test("bloom decontamination flags a superset of the exact overlap") {
    val exact = TextOps.decontaminate(spark, sf0001)
      .select("doc_id", "n_contaminated_shingles").as[(Long, Long)].collect().toMap
    val bloom = TextOps.decontaminateBloom(spark, sf0001)
      .select("doc_id", "n_flagged_shingles").as[(Long, Long)].collect().toMap
    assert(exact.keySet.subsetOf(bloom.keySet),
      s"bloom must flag every exactly-contaminated doc: ${exact.keySet -- bloom.keySet}")
    exact.foreach { case (id, n) =>
      assert(bloom(id) >= n, s"doc $id: bloom count ${bloom(id)} below exact $n")
    }
  }

  test("bloom decontamination catches a planted benchmark shingle, skips clean docs") {
    // doc 0 is "benchmark" (id < BenchmarkMaxId); doc 10 embeds its
    // 5-gram mid-text, doc 11 shares no shingle
    val bench = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (0L, bench + " zeta eta theta"),
      (10L, "prefix words then " + bench + " trailing tail"),
      (11L, "completely disjoint vocabulary with no overlap at all here")).toDF("doc_id", "text")
    val flagged = TextOps.decontaminateBloomOf(Dedup.shinglesOf(docs))
      .select("doc_id", "n_flagged_shingles").as[(Long, Long)].collect().toMap
    assert(flagged.contains(10L) && flagged(10L) >= 1, s"planted overlap missed: $flagged")
    assert(!flagged.contains(11L), s"clean doc falsely flagged: $flagged")
  }

  test("bloom filter builds at a non-default production-formula size") {
    import graft.functions.BloomAggregator
    // the sizing formula is executable and word-aligned: m ≈ 1.44·k·n
    assert(BloomAggregator.sizeFor(1000) ==
      ((math.ceil(1.44 * BloomAggregator.K * 1000).toLong + 63) / 64 * 64).toInt)
    assert(BloomAggregator.sizeFor(0) == 64)
    assert(BloomAggregator.sizeFor(1000) % 64 == 0)
    // same planted-overlap scenario through a filter sized by the
    // formula for a few hundred keys (4096 bits — 1/16 the default):
    // a Bloom filter never false-negatives, so the planted hit MUST
    // survive any sizing; at kn/m ≈ 0.02 the clean doc stays unflagged
    val bench = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (0L, bench + " zeta eta theta"),
      (10L, "prefix words then " + bench + " trailing tail"),
      (11L, "completely disjoint vocabulary with no overlap at all here")).toDF("doc_id", "text")
    val mSmall = BloomAggregator.sizeFor(700)
    assert(mSmall != BloomAggregator.MBits && mSmall <= (1 << 12))
    val flagged = TextOps.decontaminateBloomOf(Dedup.shinglesOf(docs), mSmall)
      .select("doc_id", "n_flagged_shingles").as[(Long, Long)].collect().toMap
    assert(flagged.contains(10L) && flagged(10L) >= 1,
      s"planted overlap missed at m=$mSmall: $flagged")
    assert(!flagged.contains(11L), s"clean doc falsely flagged at m=$mSmall: $flagged")
  }

  test("count-min estimates never undercount and stay within the epsilon bound") {
    val rows = TextOps.heavyHittersCms(spark, sf0001)
      .select("token", "n_exact", "est_count")
      .as[(String, Long, Long)].collect()
    assert(rows.length == 20)
    // CMS structural guarantee: min over D counters that each include
    // the token's full count can never be below the exact count
    rows.foreach { case (t, exact, est) =>
      assert(est >= exact, s"'$t': CMS undercounted $est < $exact")
    }
    // error bound: overshoot <= e/W * N with prob 1 - e^-D per token;
    // assert the Markov-style bound with slack (3x) so the test pins
    // real sketch behavior without flaking on collision luck
    val n = graft.Tables.documents(spark, sf0001)
      .selectExpr("sum(size(split(text, ' ')))").head.getLong(0)
    val bound = 3.0 * math.E / TextOps.CmsW * n
    rows.foreach { case (t, exact, est) =>
      assert(est - exact <= bound,
        s"'$t': overshoot ${est - exact} above 3x epsilon bound $bound (N=$n)")
    }
  }

  test("winnowing guarantee: shared w+k-1 char run => shared fingerprint hash") {
    // two constructed docs share a run of exactly w+k-1 = 15 chars
    // embedded in different surroundings; SIGMOD'03 guarantees at least
    // one selected fingerprint falls inside any such shared run
    val shared = "abcdefghijklmno" // 15 chars
    val doc1 = "xxxx quick brown " + shared + " lazy dog jumps over"
    val doc2 = "totally different prefix text " + shared + " and another suffix"
    val docs = Seq((1L, doc1), (2L, doc2)).toDS()
    val fps = TextOps.winnowRobustOf(docs)
      .select("doc_id", "pos", "h")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val h1 = fps(1L).map(_._3).toSet
    val h2 = fps(2L).map(_._3).toSet
    assert((h1 & h2).nonEmpty,
      s"docs sharing a ${shared.length}-char run must share a fingerprint hash")
    // and identical docs get identical fingerprint sets
    val same = TextOps.winnowRobustOf(Seq((1L, doc1), (2L, doc1)).toDS())
      .select("doc_id", "pos", "h")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(same(1L).map(r => (r._2, r._3)).toSet == same(2L).map(r => (r._2, r._3)).toSet)
  }

  test("passage overlap pairs docs sharing a long run, not unrelated docs") {
    // a ~120-char passage pasted into two otherwise-unrelated docs: the
    // winnowing guarantee selects >= 2 fingerprints inside it (every
    // w+k-1 = 15-char sub-run contributes one), so the pair must
    // surface; doc 3 shares nothing and must pair with neither
    val passage = ("shared passage the quick brown fox jumps over the " +
      "lazy dog while seventeen green bottles hang quietly on the wall today").take(120)
    val docs = Seq(
      (1L, "first document preamble with its own words " + passage + " and a closing remark"),
      (2L, "completely different opening sentence here " + passage + " then another ending"),
      (3L, "this third document shares no passage with the others at all and talks about " +
        "entirely unrelated matters of accounting and horticulture instead")).toDS()
    val pairs = TextOps.passageOverlapOf(docs)
      .select("doc_a", "doc_b", "n_shared").as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected exactly the planted pair, got ${pairs.toSeq}")
    assert(pairs.head._3 >= 2, "the shared passage must contribute >= MinSharedFps fingerprints")
  }

  test("KMV estimate lands near the exact distinct count") {
    val Array((k, kth, est)) = Relational.kmvDistinct(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val exact = graft.Tables.lineitem(spark, sf0001)
      .selectExpr("l_orderkey").distinct().count()
    if (k < Relational.KmvK) {
      // fewer distinct keys than sketch size: estimator degenerates; the
      // sketch itself still saw every key
      assert(k == exact, s"k=$k exact=$exact")
    } else {
      // standard error is ~1/sqrt(K) ≈ 6%; allow 4 sigma
      assert(math.abs(est - exact).toDouble / exact < 0.25,
        s"est=$est exact=$exact")
    }
  }

  test("KMV aggregator matches the unbounded distinct+sort+limit baseline, in-plan") {
    import org.apache.spark.sql.functions._
    val df = Relational.kmvDistinct(spark, sf001)
    // the bounded sketch must actually be the execution path: a typed
    // Aggregator plans as an ObjectHashAggregate over ScalaAggregator
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
    assert(plan.toLowerCase.contains("kmvaggregator"), s"KmvAggregator missing from:\n$plan")
    val Array((k, kth, est)) = df.as[(Long, Long, Long)].collect()
    // unbounded reference: all distinct hashes, globally sorted, first K
    val baseline = graft.Tables.lineitem(spark, sf001)
      .selectExpr("CAST(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT) AS h")
      .distinct().orderBy(col("h").asc).limit(Relational.KmvK)
      .agg(count(lit(1)), max(col("h"))).as[(Long, Long)].head()
    assert((k, kth) == baseline, s"sketch ($k,$kth) != baseline $baseline")
  }

  test("KMV aggregator reduce/merge invariants (bounded, sorted, distinct)") {
    import graft.functions.KmvAggregator
    val rnd = new scala.util.Random(7)
    val values = Array.fill(5000)(rnd.nextLong().abs % 2000) // heavy duplication
    val (left, right) = values.splitAt(2500)
    def fold(vs: Array[Long]) = vs.foldLeft(KmvAggregator.zero)(KmvAggregator.reduce)
    val merged = KmvAggregator.merge(fold(left), fold(right))
    val expect = values.distinct.sorted.take(KmvAggregator.K)
    assert(merged.toSeq == expect.toSeq)
    val s = KmvAggregator.finish(merged)
    assert(s.k == expect.length && s.kth_min == expect.last)
  }

  test("SQ8 quantized ranking tracks exact cosine top-5 closely") {
    val exact = Similarity.knnPerQuery(spark, sf0001)
      .select("q_id", "vec_id", "cos_sim").as[(Long, Long, Double)].collect()
    val quant = Similarity.sq8Search(spark, sf0001)
      .select("q_id", "vec_id", "qcos").as[(Long, Long, Double)].collect()
    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quantSets = quant.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(quantSets.keySet == exactSets.keySet)
    val overlaps = exactSets.map { case (q, s) => (quantSets(q) & s).size }
    assert(overlaps.sum >= exactSets.size * 3,
      s"avg top-5 overlap too low: $overlaps")
    // reconstruction error: quantized score within 8-bit tolerance of exact
    val exactMap = exact.map(r => (r._1, r._2) -> r._3).toMap
    quant.foreach { case (q, v, qc) =>
      exactMap.get((q, v)).foreach { ec =>
        assert(math.abs(qc - ec) < 0.02, s"($q,$v): qcos=$qc exact=$ec")
      }
    }
  }

  test("multi-probe LSH recall >= single-bucket, both subsets of brute force scores") {
    val single = Similarity.annSearch(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val multi = Similarity.annMultiProbe(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.knnPerQuery(spark, sf0001)
      .filter("rnk <= 3").select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recallS = (single & brute).size.toDouble / brute.size
    val recallM = (multi & brute).size.toDouble / brute.size
    assert(recallM >= recallS, s"multi-probe recall $recallM < single $recallS")
    assert(multi.size >= single.size, "probing more buckets can't shrink results")
  }
}
