package graft.tools

import graft.Tables
import graft.ops._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: time the stages of the currently-heavy queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    time("warmup")(spark.range(1000000).selectExpr("sum(id)").collect())
    time("documents count")(Tables.documents(spark, sf).count())
    val tok = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    time("token tf rows")(tok.count())
    time("tok + md5")(tok.select(col("doc_id"), md5(col("w")).as("m"), col("c")).count())
    time("simhash fingerprints")(SimHash.fingerprints(spark, sf).count())
    time("simhash fingerprints x2")(SimHash.fingerprints(spark, sf).count())
    time("simhash neardup")(SimHash.nearDupPairs(spark, sf).count())
    // neardup internals
    val fp = SimHash.fingerprintsFull(spark, sf).cache()
    time("fp cache fill")(fp.count())
    val banded = fp.select(col("doc_id"), col("simhash"), col("w_hi"), col("w_lo"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          substring(col("simhash"), i * 16 + 1, 16).as("bs"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("w_hi"), col("w_lo"),
        col("b.band").as("band"), col("b.bs").as("bs"))
    time("banded count")(banded.count())
    val aa = banded.as("a"); val bb = banded.as("b")
    val joined = aa.join(bb,
      col("a.band") === col("b.band") && col("a.bs") === col("b.bs")
        && col("a.doc_id") < col("b.doc_id"))
    time("band join")(joined.count())
    time("band join+distinct")(joined
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.w_hi").bitwiseXOR(col("b.w_hi"))) +
          bit_count(col("a.w_lo").bitwiseXOR(col("b.w_lo")))).cast("long").as("hamming"))
      .distinct().count())
    spark.catalog.clearCache()
    time("minhash signatures")(Dedup.minhashSignatures(spark, sf).count())
    time("minhash lsh")(Dedup.minhashCandidates(spark, sf).count())
    spark.catalog.clearCache()
    time("ivf search")(IvfIndex.search(spark, sf).count())
    spark.stop()
  }
}
