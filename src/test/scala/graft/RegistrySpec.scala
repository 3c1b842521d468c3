package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-consistency checks that need no SparkSession — the same
  * discipline [[Verify]] enforces at run time, surfaced in `sbt test`
  * so a rename breaks the build, not just the next driver run.
  */
class RegistrySpec extends AnyFunSuite {

  test("every oracle entry names a live query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracleSql entries with no query: ${orphans.toSeq.sorted.mkString(",")}")
  }

  test("every no-oracle query declares a live, oracle-checked twin") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undeclared = noOracle -- SparkEntry.twinOf.keySet
    assert(undeclared.isEmpty,
      s"no-oracle entries missing from twinOf: ${undeclared.toSeq.sorted.mkString(",")}")
    val stale = SparkEntry.twinOf.keySet -- noOracle
    assert(stale.isEmpty,
      s"twinOf keys that are not no-oracle entries: ${stale.toSeq.sorted.mkString(",")}")
    SparkEntry.twinOf.foreach { case (k, t) =>
      assert(SparkEntry.queries.contains(t), s"$k's twin $t: no query")
      assert(SparkEntry.oracleSql.contains(t), s"$k's twin $t: no oracle")
    }
  }

  test("scale-gate flags name live queries") {
    (SparkEntry.quadraticQueries ++ SparkEntry.nonSelectiveQueries)
      .foreach { q =>
        assert(SparkEntry.queries.contains(q), s"scale-gated '$q': no query")
      }
  }
}
