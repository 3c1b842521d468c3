package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bit-identity of the two-level prefix-sum shard packing
  * ([[TextOps.packBySource]]) with the single-window reference form it
  * replaces. PackBlock=128 against sf0.001's 500 docs forces the
  * multi-block path (4 blocks), so the block-offset join is exercised,
  * not just the degenerate one-block case.
  */
class TextPackSpec extends SparkSpec {
  import spark.implicits._

  test("two-level prefix-sum packing matches the single-window form exactly") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "source",
        s"CAST(size(${TextOps.wsSplitSpark}) AS BIGINT) AS n_tokens")

    val got = TextOps.packBySource(docs)
      .select("doc_id", "source", "n_tokens", "shard")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)

    val ref = docs
      .withColumn("cum", sum(col("n_tokens")).over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .selectExpr("doc_id", "source", "n_tokens",
        s"CAST((cum - n_tokens) div ${TextOps.ShardBudget} AS BIGINT) AS shard")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)

    assert(got.length == ref.length && got.length > TextOps.PackBlock,
      s"want a multi-block corpus: n=${got.length}")
    assert(got.sameElements(ref), "two-level packing diverged from the window form")
    // non-degenerate: some source spans several blocks, so its later
    // blocks carry a nonzero offset from the block-level prefix sum
    val blocksPerSource = got.groupBy(_._2).values
      .map(_.map(_._1 / TextOps.PackBlock).distinct.length)
    assert(blocksPerSource.exists(_ > 1),
      "no source spans multiple blocks; block offsets untested")
  }
}
