package graft.ops

import graft.SparkSpec

/** Stage-consistency checks for the composed curation pipeline: its
  * output must agree with each standalone (independently oracle-checked)
  * operator it composes — a doc ships iff it passes the filter, survives
  * exact dedup among kept docs, is not contaminated, and is not a
  * benchmark doc.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation pipeline output agrees with its standalone stages") {
    val out = TextOps.curationPipeline(spark, sf0001)
      .select("doc_id", "n_tokens", "shard")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val shipped = out.map(_._1).toSet

    val kept = TextOps.filterVerdict(spark, sf0001)
      .filter("keep").select("doc_id").as[Long].collect().toSet
    val contaminated = TextOps.decontaminate(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    assert(shipped.subsetOf(kept), "shipped a doc the filter rejects")
    assert((shipped & contaminated).isEmpty, "shipped a contaminated doc")
    assert(shipped.forall(_ >= TextOps.BenchmarkMaxId), "shipped a benchmark doc")

    // survivor rule: shipped docs are exactly the kept/clean/non-benchmark
    // docs that are the min doc_id of their content-digest group AMONG
    // KEPT docs (recomputed here independently)
    val texts = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "md5(text) AS h").as[(Long, String)].collect()
    val keptMin = texts.filter(t => kept(t._1)).groupBy(_._2)
      .map { case (_, g) => g.map(_._1).min }.toSet
    val expected = keptMin.filter(id =>
      id >= TextOps.BenchmarkMaxId && !contaminated(id))
    assert(shipped == expected,
      s"shipped set diverges: extra=${shipped -- expected} missing=${expected -- shipped}")

    // packing rule: within each source, shard indexes are non-decreasing
    // in doc_id order and start at 0
    val bySource = TextOps.curationPipeline(spark, sf0001)
      .select("source", "doc_id", "shard")
      .as[(String, Long, Long)].collect().groupBy(_._1)
    bySource.foreach { case (src, rows) =>
      val shards = rows.sortBy(_._2).map(_._3)
      assert(shards.head == 0, s"$src: first shard ${shards.head}")
      assert(shards.zip(shards.tail).forall { case (a, b) => b >= a },
        s"$src: shard index decreased")
    }
  }
}
