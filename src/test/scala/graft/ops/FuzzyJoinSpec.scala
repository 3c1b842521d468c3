package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Segment-filter contract for the blocked edit-distance join:
  * completeness vs brute force, selectivity, and a planted one-edit
  * pair surviving the full plan.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("blocked join reproduces brute force exactly (segment filter is complete)") {
    val base = graft.Tables.documents(spark, sf0001)
      .filter($"n_chars" >= FuzzyJoin.PrefLen)
      .select($"doc_id", expr(s"substring(text, 1, ${FuzzyJoin.PrefLen})").as("p"))
    val brute = base.as("a").join(base.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        levenshtein($"a.p", $"b.p").cast("long").as("dist"))
      .filter($"dist" <= FuzzyJoin.EdK)
      .as[(Long, Long, Long)].collect().toSet
    val blocked = FuzzyJoin.fuzzyPrefixPairs(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture must contain near-duplicate prefixes")
    assert(blocked == brute,
      s"missed: ${brute -- blocked}; spurious: ${blocked -- brute}")
  }

  test("segment blocking prunes the pair space") {
    val base = graft.Tables.documents(spark, sf0001)
      .filter($"n_chars" >= FuzzyJoin.PrefLen)
      .select($"doc_id", expr(s"substring(text, 1, ${FuzzyJoin.PrefLen})").as("p"))
    val n = base.count()
    val cand = FuzzyJoin.candidatePairs(base).count()
    assert(cand < n * (n - 1) / 4,
      s"candidates $cand should be well under the ${n * (n - 1) / 2} pair space")
  }

  test("a planted single-substitution pair is found at its exact distance") {
    val base = graft.Tables.documents(spark, sf0001)
      .filter($"n_chars" >= FuzzyJoin.PrefLen)
      .select($"doc_id", expr(s"substring(text, 1, ${FuzzyJoin.PrefLen})").as("p"))
    // plant: copy doc 0's prefix with character 12 substituted by '#'
    // (no fixture text contains '#', so the planted pair is unique)
    val planted = base.filter($"doc_id" === 0)
      .select(lit(990001L).as("doc_id"),
        expr("concat(substring(p, 1, 11), '#', substring(p, 13, 12))").as("p"))
    val res = FuzzyJoin.candidatePairs(base.unionByName(planted))
      .join(base.unionByName(planted)
        .select($"doc_id".as("id_a"), $"p".as("pa")), Seq("id_a"))
      .join(base.unionByName(planted)
        .select($"doc_id".as("id_b"), $"p".as("pb")), Seq("id_b"))
      .select($"id_a", $"id_b", levenshtein($"pa", $"pb").cast("long").as("dist"))
      .filter($"dist" <= FuzzyJoin.EdK)
      .filter($"id_b" === 990001L && $"id_a" === 0L)
      .as[(Long, Long, Long)].collect()
    assert(res.length == 1, s"planted pair not found: $res")
    assert(res.head._3 == 1L, s"planted distance must be 1, got ${res.head}")
  }
}
