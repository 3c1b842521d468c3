package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the action-fusion contract the commit paths now lean on: an
  * eager `localCheckpoint` delivers observed metrics (count /
  * collect_set) computed INSIDE the checkpoint job — including over
  * empty frames — and the checkpointed frame itself is intact.
  */
class FuseSpec extends SparkSpec {

  test("checkpointCounted returns the row count and the intact frame") {
    val (ck, n) = Fuse.checkpointCounted(
      spark.range(137).selectExpr("id", "id % 5 AS b"))
    assert(n == 137L)
    assert(ck.count() == 137L)
    assert(ck.columns.toSeq == Seq("id", "b")) // no observation residue
  }

  test("checkpointCounted on an empty frame returns zero") {
    val (ck, n) = Fuse.checkpointCounted(
      spark.range(10).filter("id < 0").selectExpr("id"))
    assert(n == 0L)
    assert(ck.isEmpty)
  }

  test("checkpointObserved collect_set matches a distinct collect") {
    val df = spark.range(1000).selectExpr("id", "CAST(id % 7 AS INT) AS b")
    val (ck, vs) = Fuse.checkpointObserved(df, collect_set(col("b")))
    val got = vs.head.asInstanceOf[scala.collection.Seq[Any]]
      .map(_.asInstanceOf[Number].intValue()).toSet
    assert(got == (0 until 7).toSet)
    assert(ck.count() == 1000L)
  }

  test("checkpointObserved multiple aggregates keep call order") {
    val df = spark.range(100).selectExpr("id", "id % 2 = 0 AS even")
    val (_, vs) = Fuse.checkpointObserved(df,
      count(when(col("even"), 1)), count(when(!col("even"), 1)))
    assert(vs.map(_.asInstanceOf[Number].longValue()) == Seq(50L, 50L))
  }

  test("collect_set of a struct yields rows usable for dir routing") {
    val df = spark.range(60).selectExpr(
      "CAST(id % 3 AS STRING) AS d", "CAST(id % 2 AS INT) AS g")
    val (_, vs) = Fuse.checkpointObserved(df,
      collect_set(struct(col("d"), col("g"))))
    val rows = vs.head.asInstanceOf[scala.collection.Seq[Any]]
      .map(_.asInstanceOf[org.apache.spark.sql.Row])
    val dirs = rows.map(r => s"d=${r.getString(0)}/g=${r.getInt(1)}").sorted
    assert(dirs == (for (d <- 0 to 2; g <- 0 to 1)
      yield s"d=$d/g=$g").sorted)
  }
}
