package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** IVF-PQ contract beyond the SQL oracle's row-for-row check:
  * re-rank exactness, shortlist dominance, cell pruning, planted-dup
  * recall, committed-artifact reuse.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def register(): Unit = graft.functions.VectorFunctions.register(spark)

  test("a planted near-duplicate of a query comes back rank 1 at cosine 1.0") {
    register()
    val e = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding")
    // vec 99999 := an exact copy of query vector 2: same cell
    // assignment, same PQ codes, so it must survive probe -> ADC
    // shortlist -> exact re-rank and surface as the top neighbor
    val dup = e.filter($"vec_id" === 2)
      .select(lit(99999L).as("vec_id"), $"embedding")
    val res = IvfPq.searchOn(e.unionByName(dup), IvfIndex.NProbe)
      .select("q_id", "vec_id", "cos_sim", "rnk")
      .as[(Long, Long, Double, Long)].collect()
    val top1 = res.filter(r => r._1 == 2L && r._4 == 1L)
    assert(top1.length == 1)
    assert(top1.head._2 == 99999L,
      s"planted duplicate must be rank 1 for its query, got ${top1.head}")
    assert(top1.head._3 == 1.0)
  }

  test("final scores are the exact cosines (quantization never leaks into output)") {
    register()
    val res = IvfPq.searchFixed(spark, sf0001)
    val e = graft.Tables.embeddings(spark, sf0001)
    val exact = res.select($"q_id", $"vec_id", $"cos_sim")
      .join(e.select($"vec_id", $"embedding"), Seq("vec_id"))
      .join(e.select($"vec_id".as("q_id"), $"embedding".as("qv")), Seq("q_id"))
      .filter($"cos_sim" =!= round(expr("cosine_sim(embedding, qv)"), 4))
      .count()
    assert(exact == 0, "re-ranked cos_sim must equal the exact rounded cosine")
  }

  test("every true top-5 neighbor reaching the ADC shortlist surfaces in the final top-5") {
    register()
    val e = graft.Tables.embeddings(spark, sf0001)
    val truth = Similarity.knnPerQuery(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val short = IvfPq.fixedShortlist(e, IvfIndex.NProbe)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val fin = IvfPq.searchFixed(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val reachable = truth.intersect(short)
    assert(reachable.nonEmpty, "probing must reach at least one true neighbor")
    assert(reachable.subsetOf(fin),
      s"exact re-rank dropped true neighbors that ADC had found: ${reachable -- fin}")
  }

  test("probing prunes: candidates are a strict subset of the corpus per query") {
    register()
    val e = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding")
    val n = e.count()
    val centroids = e.filter($"vec_id" < IvfIndex.K)
      .select($"vec_id".as("centroid_id"), $"embedding".as("centroid"))
    val assigned = IvfIndex.assign(e, centroids)
      .select($"vec_id", $"centroid_id")
    val q = e.filter($"vec_id" < Similarity.QuerySetSize)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val cand = IvfPq.candidates(q, assigned, centroids, IvfIndex.NProbe).count()
    assert(cand > 0)
    assert(cand < Similarity.QuerySetSize * (n - 1),
      s"probing ${IvfIndex.NProbe} of ${IvfIndex.K} cells must scan less " +
        s"than brute force ($cand vs ${Similarity.QuerySetSize * (n - 1)})")
  }

  test("widening nprobe strictly grows the candidate set (the recall/cost knob)") {
    register()
    val e = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding")
    val centroids = e.filter($"vec_id" < IvfIndex.K)
      .select($"vec_id".as("centroid_id"), $"embedding".as("centroid"))
    val assigned = IvfIndex.assign(e, centroids)
      .select($"vec_id", $"centroid_id")
    val q = e.filter($"vec_id" < Similarity.QuerySetSize)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val narrow = IvfPq.candidates(q, assigned, centroids, IvfIndex.NProbe)
      .as[(Long, Long)].collect().toSet
    val wide = IvfPq.candidates(q, assigned, centroids, IvfIndex.NProbeWide)
      .as[(Long, Long)].collect().toSet
    assert(narrow.subsetOf(wide),
      s"nprobe=${IvfIndex.NProbeWide} candidates must contain the nprobe=${IvfIndex.NProbe} set")
    assert(wide.size > narrow.size,
      "wider probing must actually admit more candidates on a multi-cell corpus")
  }

  test("committed path reuses the trained artifacts and returns dense top-5 ranks") {
    register()
    IvfPq.searchTrained(spark, sf0001).count() // builds ivf + pq artifacts if absent
    val pqDir = IvfIndex.artifactDir(sf0001, "pq")
    val before = Seq(s"$pqDir/meta", s"$pqDir/codes")
      .map(p => Files.getLastModifiedTime(Paths.get(p)))
    val res = IvfPq.searchTrained(spark, sf0001)
      .select("q_id", "vec_id", "cos_sim", "rnk")
      .as[(Long, Long, Double, Long)].collect()
    val after = Seq(s"$pqDir/meta", s"$pqDir/codes")
      .map(p => Files.getLastModifiedTime(Paths.get(p)))
    assert(before == after, "second search must serve the committed artifacts")
    res.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length),
        s"ranks for query $qid must be dense from 1")
      assert(rows.length == 5, s"query $qid returned ${rows.length} rows")
      assert(rows.forall(_._2 != qid), "self-matches excluded")
    }
  }
}
