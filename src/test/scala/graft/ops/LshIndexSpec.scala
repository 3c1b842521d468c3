package graft.ops

import graft.SparkSpec
import graft.etl.BucketTable
import java.nio.file.Files

/** The incremental MinHash-LSH index contract:
  *   1. incremental maintenance (init corpus, append batch) converges to
  *      exactly the from-scratch index over corpus ∪ batch, and
  *      re-appending a batch is a no-op (crash-safe idempotent ingest);
  *   2. the per-batch index lookup finds exactly the batch×corpus subset
  *      of the all-pairs LSH candidates at the same estimates.
  */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private def sigRows(dir: String): Set[(Long, Seq[Long])] =
    BucketTable.read(spark, s"$dir/sig")
      .as[(Long, Seq[Long])].collect().toSet

  private def bandRows(dir: String): Set[(Long, Int, String)] =
    BucketTable.read(spark, s"$dir/bands")
      .as[(Long, Int, String)].collect().toSet

  test("batch-incremental maintenance equals the from-scratch index; re-append is a no-op") {
    val d = graft.Tables.documents(spark, sf0001)
    val corpus = d.filter($"doc_id" % Dedup.IncomingMod =!= 0)
    val batch = d.filter($"doc_id" % Dedup.IncomingMod === 0)
    val incDir = Files.createTempDirectory("lsh-inc").toString
    val fullDir = Files.createTempDirectory("lsh-full").toString
    Dedup.initLshIndex(corpus, incDir)
    Dedup.appendToLshIndex(spark, batch, incDir)
    val afterAppend = (sigRows(incDir), bandRows(incDir))
    Dedup.appendToLshIndex(spark, batch, incDir) // idempotent re-ingest
    assert((sigRows(incDir), bandRows(incDir)) == afterAppend,
      "re-appending the same batch must not change the index")
    Dedup.initLshIndex(d, fullDir)
    assert(sigRows(incDir) == sigRows(fullDir),
      "incremental signature table diverged from from-scratch build")
    assert(bandRows(incDir) == bandRows(fullDir),
      "incremental band table diverged from from-scratch build")
  }

  test("takedown deletes a doc's fingerprints via touched buckets only") {
    val d = graft.Tables.documents(spark, sf0001)
    val dir = Files.createTempDirectory("lsh-del").toString
    Dedup.initLshIndex(d, dir)
    val gensBefore = graft.etl.BucketTable.manifest(s"$dir/sig")
    val victim = d.select($"doc_id").as[Long].head()
    Dedup.deleteFromLshIndex(spark, dir,
      Seq(victim).toDF("doc_id"))
    // every fingerprint of the victim is gone — signature and all bands
    assert(graft.etl.BucketTable.lookup(spark, s"$dir/sig", Seq(victim))
      .count() == 0)
    assert(graft.etl.BucketTable.read(spark, s"$dir/bands")
      .filter($"doc_id" === victim).count() == 0)
    // one doc's takedown rewrites at most a handful of buckets
    val gens = graft.etl.BucketTable.manifest(s"$dir/sig")
    assert(gens.count { case (b, g) => g != gensBefore(b) } <= 1,
      s"sig takedown rewrote more than the victim's bucket: $gens")
    // other docs' fingerprints are intact (count dropped by exactly one
    // signature row and at most NumBands band rows)
    assert(graft.etl.BucketTable.read(spark, s"$dir/sig").count() ==
      d.count() - 1)
    // absent ids are a no-op, not an error
    Dedup.deleteFromLshIndex(spark, dir, Seq(Long.MaxValue).toDF("doc_id"))
  }

  test("dedupIngestBatch replay is a no-op (crash-safe re-ingest)") {
    val d = graft.Tables.documents(spark, sf0001)
    val batch0 = d.filter($"doc_id" % 3 === 0)
    val batch1 = d.filter($"doc_id" % 3 === 1)
    val idx = Files.createTempDirectory("lsh-replay-idx").toString
    val acc = Files.createTempDirectory("lsh-replay-acc").toString + "/t"
    Dedup.dedupIngestBatch(spark, batch0, idx, acc)
    Dedup.dedupIngestBatch(spark, batch1, idx, acc)
    def acceptedIds = BucketTable.read(spark, acc)
      .select("doc_id").as[Long].collect().toSet
    val afterBoth = acceptedIds
    val idxAfterBoth = (sigRows(idx), bandRows(idx))
    Dedup.dedupIngestBatch(spark, batch1, idx, acc) // crash-replay batch 1
    assert(acceptedIds == afterBoth,
      "replaying an already-ingested batch must not change the accept table")
    assert((sigRows(idx), bandRows(idx)) == idxAfterBoth,
      "replaying an already-ingested batch must not change the index")
  }

  test("re-ingesting docs with EDITED text replaces their index rows (no stale bands)") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val base = graft.Tables.documents(spark, sf0001)
      .filter($"doc_id" % 7 === 0)
    val incDir = Files.createTempDirectory("lsh-edit-inc").toString
    val fullDir = Files.createTempDirectory("lsh-edit-full").toString
    Dedup.initLshIndex(base, incDir)
    val edited = base.withColumn("text",
      concat(col("text"), lit(" wholly new trailing tokens for the edit")))
    Dedup.appendToLshIndex(spark, edited, incDir)
    Dedup.initLshIndex(edited, fullDir)
    // upsert-by-key with incoming-wins ties must fully replace the old
    // content's rows — a precombine that kept "whichever hash sorts
    // higher" would leave stale band hashes here
    assert(sigRows(incDir) == sigRows(fullDir),
      "edited docs left stale signature rows")
    assert(bandRows(incDir) == bandRows(fullDir),
      "edited docs left stale band rows")
  }

  test("initLshIndex recovers from a crash-partial index (bands without sig marker)") {
    val docs = graft.Tables.documents(spark, sf0001).filter($"doc_id" % 11 === 0)
    val dir = Files.createTempDirectory("lsh-partial").toString
    val fullDir = Files.createTempDirectory("lsh-partial-full").toString
    // simulate a crash between the two creates: bands committed, sig
    // (the existence marker) absent — with STALE content, so a recovery
    // that merely created the missing sig table would be caught
    val staleSig = Dedup.minhashSignaturesOf(
      docs.limit(3)).localCheckpoint()
    BucketTable.create(
      Dedup.bandedOf(staleSig).select($"doc_id", $"band", $"bh"),
      s"$dir/bands", keys = Seq("doc_id", "band"), precombine = "doc_id")
    assert(!Dedup.lshIndexExists(dir))
    Dedup.initLshIndex(docs, dir) // must clear the partial state and rebuild
    Dedup.initLshIndex(docs, fullDir)
    assert(Dedup.lshIndexExists(dir))
    assert(sigRows(dir) == sigRows(fullDir))
    assert(bandRows(dir) == bandRows(fullDir),
      "recovery must rebuild the bands table, not keep the partial one")
  }

  test("index lookup equals the all-pairs LSH restricted to batch-vs-corpus") {
    val got = Dedup.incrementalLsh(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSet
    val expected = Dedup.minhashCandidates(spark, sf0001)
      .as[(Long, Long, Double)].collect()
      .flatMap { case (a, b, e) =>
        if (a % Dedup.IncomingMod == 0 && b % Dedup.IncomingMod != 0) Some((a, b, e))
        else if (b % Dedup.IncomingMod == 0 && a % Dedup.IncomingMod != 0) Some((b, a, e))
        else None
      }.toSet
    assert(got == expected,
      s"lookup found ${got.size} pairs, all-pairs restriction has ${expected.size}")
  }
}
