package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad main — registry-integrity + driver-contract smoke:
  * asserts no query name collides across the per-module registries (a
  * duplicate key would silently shadow one query in the merged map),
  * that every oracle has a query, and that `SparkEntry.entry` returns
  * rows on the smoke fixture.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val maps: Seq[(String, Set[String])] = Seq(
      "Relational" -> graft.ops.Relational.queries.keySet,
      "PipelineQueries" -> graft.ops.PipelineQueries.queries.keySet,
      "ScalarOps" -> graft.ops.ScalarOps.queries.keySet,
      "Analytics" -> graft.ops.Analytics.queries.keySet,
      "Sampling" -> graft.ops.Sampling.queries.keySet,
      "Dedup" -> graft.ops.Dedup.queries.keySet,
      "FuzzyJoin" -> graft.ops.FuzzyJoin.queries.keySet,
      "SimHash" -> graft.ops.SimHash.queries.keySet,
      "Similarity" -> graft.ops.Similarity.queries.keySet,
      "IvfIndex" -> graft.ops.IvfIndex.queries.keySet,
      "IvfPq" -> graft.ops.IvfPq.queries.keySet,
      "TextOps" -> graft.ops.TextOps.queries.keySet,
      "Privacy" -> graft.ops.Privacy.queries.keySet,
      "Multimodal" -> graft.ops.Multimodal.queries.keySet,
      "Skipping" -> graft.ops.Skipping.queries.keySet,
      "Scale" -> graft.ops.Scale.queries.keySet,
      "DataQuality" -> graft.ops.DataQuality.queries.keySet,
      "Retrieval" -> graft.ops.Retrieval.queries.keySet)
    val all = maps.flatMap { case (m, ks) => ks.toSeq.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    require(dups.isEmpty,
      s"query names registered in multiple modules: " +
        dups.map { case (k, ms) => s"$k(${ms.map(_._2).mkString("+")})" }
          .mkString(", "))
    require(all.size == graft.SparkEntry.queries.size,
      s"merged registry lost entries: ${all.size} vs ${graft.SparkEntry.queries.size}")
    val orphans = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    require(orphans.isEmpty, s"oracles without queries: $orphans")
    println(s"[smoke] ${all.size} queries across ${maps.size} modules, " +
      s"${graft.SparkEntry.oracleSql.size} oracles, no collisions")

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    require(n > 0, "SparkEntry.entry returned no rows")
    println(s"[smoke] entry rows=$n")
    spark.stop()
  }
}
