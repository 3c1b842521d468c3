package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Pins the connected-components loop's exchange-reuse contract: the
  * symmetrized edge list is hash-partitioned (and sorted) on the join
  * key ONCE at `Dedup.ccEdges`, and each propagation round's
  * `edges.dst = labels.id` join must consume that partitioning as-is —
  * no per-round shuffle (or sort) of the O(corpus) edge side. At 100 TB
  * this is E-shuffled-once vs E-shuffled-log(n)-times.
  */
class ClusterPartitioningSpec extends SparkSpec {
  import spark.implicits._

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(collectAll)
  }

  /** Does this subtree contain the RAW edge list (leaf scan with `dst`)
    * with no join/aggregate in between? A shuffle or sort over such a
    * subtree is a re-exchange of E itself — the thing `ccEdges` exists
    * to pay exactly once. (The min-agg's own exchange above the join is
    * the algorithm's combine-reduced V-shuffle and is allowed.)
    */
  private def bareEdges(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
    case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
    case s if s.children.isEmpty => s.output.exists(_.name == "dst")
    case other => other.children.exists(bareEdges) || (other match {
      case a: AdaptiveSparkPlanExec => bareEdges(a.executedPlan)
      case q: QueryStageExec => bareEdges(q.plan)
      case _ => false
    })
  }

  test("per-round CC hop join reuses the edges partitioning, never re-shuffles E") {
    // force the at-scale join shape: on a real corpus the labels side is
    // V-sized and cannot broadcast, so the round joins sort-merge — the
    // regime where edges-side exchange/sort reuse is the whole game
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = (1L to 200L).map(i => (i, i + 1L))
        .toDF("doc_a", "doc_b").localCheckpoint()
      val edges = Dedup.ccEdges(pairs)
      val labels = edges.select($"src".as("id")).distinct()
        .withColumn("cluster", $"id").localCheckpoint()
      // one propagation round's neighbor-min aggregation, exactly as
      // clustersFromPairs builds it
      val round = edges.join(labels, edges("dst") === labels("id"))
        .groupBy($"src").agg(min($"cluster").as("nbr_min"))
      round.queryExecution.toRdd.count()
      val plan = round.queryExecution.executedPlan
      val shufflesOverEdges = collectAll(plan).collect {
        case e: ShuffleExchangeExec if bareEdges(e.child) => e
      }
      assert(shufflesOverEdges.isEmpty,
        s"a propagation round re-shuffles the edge list:\n$plan")
      // and the join must not re-sort the pre-sorted edge side either
      val sortsOverEdges = collectAll(plan).collect {
        case s: org.apache.spark.sql.execution.SortExec if bareEdges(s.child) => s
      }
      assert(sortsOverEdges.isEmpty,
        s"a propagation round re-sorts the pre-sorted edge list:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pre-partitioned path converges correctly on a >threshold chain graph") {
    // 600 chains of 101 nodes = 60k pairs = 120k directed edges, above
    // CcPrepartitionMinEdges — drives the layout-preserving branch of
    // clustersFromPairs end to end (high-diameter components, so the
    // pointer-jumping rounds and their repartition(id) all execute) and
    // checks the labels, not just the plan shape
    val chainLen = 101
    val pairs = spark.range(600).selectExpr(s"id * $chainLen AS base")
      .selectExpr(s"explode(sequence(base, base + ${chainLen - 2})) AS doc_a")
      .selectExpr("doc_a", "doc_a + 1 AS doc_b")
    assert(pairs.count() * 2 >= Dedup.CcPrepartitionMinEdges)
    val (labels, rounds) = Dedup.clustersFromPairs(pairs)
    val wrong = labels
      .selectExpr("id", "cluster", s"CAST(id DIV $chainLen AS BIGINT) * $chainLen AS expected")
      .filter("cluster <> expected")
    assert(wrong.isEmpty, s"mislabeled nodes: ${wrong.take(3).toSeq}")
    assert(rounds <= 12, s"chain of $chainLen should converge in O(log n) rounds, took $rounds")
  }
}
