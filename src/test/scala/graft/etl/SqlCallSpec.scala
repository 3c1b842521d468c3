package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** The CALL procedure surface: each procedure parses through Spark's
  * parser, dispatches to the right table service, and returns a frame
  * describing what it did; wrong layouts and unknown procedures fail
  * loudly.
  */
class SqlCallSpec extends SparkSpec {
  import spark.implicits._

  private def mkTimeline(name: String): String = {
    val p = Files.createTempDirectory("sqlcall").toString + "/t"
    (1 to 4).foreach { i =>
      Timeline.upsertInto(spark, p,
        Seq((i.toLong, 1L, i * 10.0)).toDF("k", "pc", "v"),
        keys = Seq("k"), precombine = "pc", atMs = Some(i * 1000L))
    }
    Catalog.registerTimelineTable(spark, name, p,
      keys = Seq("k"), precombine = "pc")
    p
  }

  test("timeline service procedures run and report") {
    val p = mkTimeline("call_tl")
    assert(SqlCall.exec(spark, "CALL show_commits('call_tl')").count() == 4)
    // compact appends a replacecommit
    val v = SqlCall.exec(spark, "CALL compact('call_tl', 2)")
      .as[Long].head()
    assert(v == 4L)
    assert(Timeline.instants(p).last.action == "replacecommit")
    // rollback restores v1's one-key contents as a new version
    val rb = SqlCall.exec(spark, "CALL rollback_to_version('call_tl', 1)")
      .as[Long].head()
    assert(rb == 5L && Timeline.read(spark, p).count() == 2)
    // archive folds all but the newest 2 instants
    val archived = SqlCall.exec(spark, "CALL archive_commits('call_tl', 2)")
      .as[Long].collect().toSeq
    assert(archived == Seq(0L, 1L, 2L, 3L))
    assert(SqlCall.exec(spark, "CALL show_commits('call_tl')").count() == 6)
    // clean drops all but the newest 2 snapshot versions
    val cleaned = SqlCall.exec(spark, "CALL clean_commits('call_tl', 2)")
      .as[Long].collect().toSeq
    assert(cleaned == Seq(0L, 1L, 2L, 3L))
    assert(Timeline.versions(p) == Seq(4L, 5L))
  }

  test("file-level clean for the bucket layout; wrong shapes fail loudly") {
    val p = Files.createTempDirectory("sqlcallb").toString + "/t"
    BucketTable.create(
      (1 to 16).map(i => (i.toLong, 1L, i.toDouble)).toDF("k", "pc", "v"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    BucketTable.upsertInto(spark, p,
      Seq((1L, 2L, 100.0)).toDF("k", "pc", "v"))
    Catalog.registerLayoutTable(spark, "call_b", "bucket", p)
    // the superseded generation of bucket(1) is reclaimable
    assert(SqlCall.exec(spark, "CALL clean('call_b')").count() >= 1)
    val wrongLayout = intercept[IllegalArgumentException] {
      SqlCall.exec(spark, "CALL show_commits('call_b')")
    }
    assert(wrongLayout.getMessage.contains("timeline"))
    val unknown = intercept[IllegalArgumentException] {
      SqlCall.exec(spark, "CALL vacuum('call_b')")
    }
    assert(unknown.getMessage.contains("supported"))
    val nonLiteral = intercept[IllegalArgumentException] {
      SqlCall.exec(spark, "CALL clean_commits('call_b', 1 + 1)")
    }
    assert(nonLiteral.getMessage.contains("literal"))
  }
}
