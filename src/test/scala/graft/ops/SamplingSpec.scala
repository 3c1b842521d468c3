package graft.ops

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash sample is deterministic and composable (5% subset of 10%)") {
    val s10a = Sampling.hashSample(spark, sf0001, 100).select("doc_id").as[Long].collect().toSet
    val s10b = Sampling.hashSample(spark, sf0001, 100).select("doc_id").as[Long].collect().toSet
    assert(s10a == s10b, "identical across runs")
    val s5 = Sampling.hashSample(spark, sf0001, 50).select("doc_id").as[Long].collect().toSet
    assert(s5.subsetOf(s10a), "smaller threshold nests inside larger")
    val n = graft.Tables.documents(spark, sf0001).count().toDouble
    assert(math.abs(s10a.size / n - 0.1) < 0.06, s"~10%, got ${s10a.size / n}")
  }

  test("shuffle shards: every doc placed once, shards balanced, positions dense") {
    val rows = Sampling.shuffleShardsFixed(spark, sf0001)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    val n = graft.Tables.documents(spark, sf0001).count()
    assert(rows.length == n)
    assert(rows.map(_._1).distinct.length == n, "each doc exactly once")
    val byShard = rows.groupBy(_._2)
    assert(byShard.keySet == (0L until Sampling.ShuffleShards).toSet,
      s"all ${Sampling.ShuffleShards} shards populated")
    val mean = n.toDouble / Sampling.ShuffleShards
    assert(byShard.values.forall(s => s.length > mean / 2 && s.length < mean * 2),
      s"hash split balanced, got ${byShard.view.mapValues(_.length).toMap}")
    byShard.values.foreach { s =>
      assert(s.map(_._3).sorted.toSeq == (1L to s.length),
        "positions dense from 1 within each shard")
    }
  }

  test("adaptive shard count scales with the corpus above the floor") {
    assert(Sampling.adaptiveShards(0) == 8L, "empty corpus keeps the floor")
    assert(Sampling.adaptiveShards(8000000L) == 8L, "floor holds to 8 x target")
    assert(Sampling.adaptiveShards(8000001L) == 9L, "one row past -> one more shard")
    assert(Sampling.adaptiveShards(1000000000L) == 1000L, "1B rows -> 1000 shards")
    assert(Sampling.adaptiveShards(100L, targetRowsPerShard = 10L) == 10L)
  }

  test("adaptive shuffle bounds every shard's window-task input") {
    // corpus sized to force >8 shards at a small target: the per-shard
    // row bound is the property the fixed-8 form lacked (one window
    // task sorting ~n/8 rows at any scale)
    val n = 20000L
    val target = 1000L
    val shards = Sampling.adaptiveShards(n, target)
    assert(shards == 20L)
    val docs = spark.range(n).toDF("doc_id")
    val perShard = Sampling.shuffleShardsOf(docs, shards)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(perShard.keySet == (0L until shards).toSet, "all shards populated")
    assert(perShard.values.sum == n)
    val bound = (target * 3) / 2
    perShard.foreach { case (s, c) =>
      assert(c <= bound, s"shard $s holds $c rows > ${bound} (task-input bound)")
    }
    // positions dense from 1 within each shard (the loader contract)
    val dense = Sampling.shuffleShardsOf(docs, shards)
      .select("shard", "pos").as[(Long, Long)].collect()
      .groupBy(_._1).forall { case (_, ps) =>
        ps.map(_._2).sorted.toSeq == (1L to ps.length) }
    assert(dense)
  }

  test("leak-free split keeps every near-dup pair on one side of the boundary") {
    val split = Sampling.leakFreeSplit(spark, sf0001)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val n = graft.Tables.documents(spark, sf0001).count()
    assert(split.size == n.toInt, "every doc gets exactly one split label")
    // the property a per-doc hash split violates: near-dup pairs never
    // straddle train/eval
    val pairs = Dedup.ngramJaccardPairs(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    for ((a, b) <- pairs)
      assert(split(a) == split(b), s"pair ($a,$b) straddles ${split(a)}/${split(b)}")
    val frac = split.values.groupBy(identity).view.mapValues(_.size.toDouble / n).toMap
    assert(frac("train") > 0.8 && frac.getOrElse("val", 0.0) < 0.12 &&
      frac.getOrElse("test", 0.0) < 0.12, s"fractions off: $frac")
  }

  test("stratified sample respects per-language fractions") {
    val base = graft.Tables.documents(spark, sf0001)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val got = Sampling.stratifiedByLang(spark, sf0001)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val fractions = Map("en" -> 0.2, "es" -> 0.5, "de" -> 0.5, "fr" -> 1.0, "zh" -> 1.0)
    fractions.foreach { case (lang, f) =>
      val expected = base(lang) * f
      val actual = got.getOrElse(lang, 0L).toDouble
      assert(math.abs(actual - expected) <= math.max(8.0, expected * 0.45),
        s"$lang: expected ≈$expected got $actual")
    }
    // full-fraction strata must be complete
    assert(got("fr") == base("fr") && got("zh") == base("zh"))
  }

  test("mixture resampling keeps the binding source whole and ramps the rest") {
    val base = graft.Tables.documents(spark, sf001)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val got = Sampling.mixtureSample(spark, sf001)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // uniform corpus + linear weights: the max-weight source binds the
    // budget (fraction exactly 1.0) and must survive in full
    assert(got("src19") == base("src19"),
      s"binding source must keep everything: ${got.get("src19")} of ${base("src19")}")
    // acceptance fraction is w/20 here; spot-check the ramp at loose
    // binomial tolerance (counts are small at test scale)
    Seq("src4" -> 0.25, "src9" -> 0.50, "src14" -> 0.75).foreach { case (s, f) =>
      val expected = base(s) * f
      val actual = got.getOrElse(s, 0L).toDouble
      assert(math.abs(actual - expected) <= math.max(8.0, expected * 0.5),
        s"$s: expected ≈$expected got $actual")
    }
    // no replication: every per-source take is bounded by availability
    got.foreach { case (s, n) => assert(n <= base(s)) }
    // deterministic across runs
    val again = Sampling.mixtureSample(spark, sf001)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again == got)
  }
}
