package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck property for the pointer-jumping connected-components
  * loop: on ARBITRARY undirected pair lists (not just the planted chain
  * and the Jaccard graph the specs cover), every node's label must
  * equal the minimum node id of its component as computed by a
  * driver-side union-find reference. This pins the hop+jump interplay
  * — the jump shortcut must never cross components or skip past the
  * component minimum.
  */
object ClustersProps extends Properties("Clusters") {

  // each case runs a multi-round Spark loop (checkpoints + counts); 15
  // random graphs give shape diversity without a minutes-long suite
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Random graph: n nodes (ids 0..n-1 with gaps allowed via edge
    * endpoints), m edges biased to create both chains and dense blobs.
    * Self-loops are excluded (the pair relation is strictly a < b, as
    * `ngramJaccardPairs` emits).
    */
  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(2, 40)
    m <- Gen.chooseNum(1, 60)
    edges <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0L, n.toLong - 1)
      b <- Gen.chooseNum(0L, n.toLong - 1)
      if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges

  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(v => v -> find(v)).toMap
  }

  property("labels equal union-find min-id components on random graphs") =
    Prop.forAll(graphGen) { edges =>
      edges.isEmpty || {
        val pairs = edges.toDF("doc_a", "doc_b")
        val (labels, rounds) = Dedup.clustersFromPairs(pairs)
        val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val want = unionFind(edges)
        (got == want) :| s"rounds=$rounds got=$got want=$want"
      }
    }
}
