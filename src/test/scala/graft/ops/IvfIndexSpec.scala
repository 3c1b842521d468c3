package graft.ops

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  test("index build partitions the corpus into at most K non-empty cells") {
    val cells = IvfIndex.cellStats(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(cells.length <= IvfIndex.K && cells.nonEmpty)
    assert(cells.map(_._2).sum == graft.Tables.embeddings(spark, sf0001).count())
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
}
