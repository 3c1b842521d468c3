package graft.tools

import graft.ops._
import org.apache.spark.sql.SparkSession

/** Dev profiler: time the stages of the heavy near-dup queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    time("shingles count")(Dedup.shingles(spark, sf).count())
    time("shingles count again")(Dedup.shingles(spark, sf).count())
    time("ngram_jaccard full")(Dedup.ngramJaccardPairs(spark, sf).count())
    time("minhash signatures")(Dedup.minhashSignatures(spark, sf).count())
    time("minhash full")(Dedup.minhashCandidates(spark, sf).count())
    time("simhash fingerprints")(SimHash.fingerprints(spark, sf).count())
    time("simhash neardup")(SimHash.nearDupPairs(spark, sf).count())
    time("embed neardup")(Similarity.embedNearDupPairs(spark, sf).count())
    time("watermark latest")(PipelineQueries.watermarkLatest(spark, sf).count())
    time("rollup")(Relational.rollupQuantities(spark, sf).count())
    time("brand volume")(Relational.brandVolume(spark, sf).count())
    spark.stop()
  }
}
