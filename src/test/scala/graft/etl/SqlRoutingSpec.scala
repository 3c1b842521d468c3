package graft.etl

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** SQL DML routed to the engine's own layouts (the round-10 verdict's
  * "SQL front door must not whole-table-rewrite" item): a catalog
  * table bound via `graft.table.layout`/`graft.table.path` dispatches
  * MERGE/UPDATE/DELETE to BucketTable/BloomTable targeted rewrites.
  * The load-bearing assertions are the FILE DIFFS: untouched buckets /
  * files keep their exact bytes across a routed statement.
  */
class SqlRoutingSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(prefix: String): String = {
    n += 1
    Files.createTempDirectory(prefix).toString + "/t"
  }

  /** Every data file under the table with mtime+size (identity proxy). */
  private def dataFiles(dir: String): Set[(String, Any, Long)] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .filterNot(_.toString.contains("_index"))
      .map(p => (p.toString, Files.getLastModifiedTime(p), Files.size(p)))
      .toSet

  private def rows(t: (Long, Long, Double)*) = t.toSeq.toDF("k", "pc", "v")

  private def bucketBacked(name: String): String = {
    val path = fresh("sqlrb")
    BucketTable.create(rows((1 to 64).map(i => (i.toLong, 1L, i.toDouble)): _*),
      path, keys = Seq("k"), precombine = "pc", tieBreak = Seq("pc"),
      numBuckets = 8)
    Catalog.registerLayoutTable(spark, name, "bucket", path)
    path
  }

  private def contents(path: String): Seq[(Long, Long, Double)] =
    BucketTable.read(spark, path).as[(Long, Long, Double)]
      .collect().toSeq.sortBy(_._1)

  test("MERGE on a bucket-backed table rewrites only touched buckets") {
    val path = bucketBacked("sql_rt_merge")
    val before = dataFiles(path)
    val beforeManifest = BucketTable.manifest(path)
    Seq((7L, 2L, 70.0), (65L, 1L, 65.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("rt_src")
    SqlMerge.exec(spark,
      """MERGE INTO sql_rt_merge t USING rt_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val expected = (1 to 64).map(i => i.toLong -> i.toDouble).toMap +
      (7L -> 70.0) + (65L -> 65.0)
    assert(contents(path).map(r => r._1 -> r._3).toMap == expected)
    // untouched buckets keep their exact files
    val touched = Set(7L, 65L).map(k =>
      BucketTable.bucketOf(spark, path, Seq(k)))
    val untouchedGens = BucketTable.manifest(path).filter {
      case (b, _) => !touched(b) }
    assert(untouchedGens == beforeManifest.filter { case (b, _) => !touched(b) },
      "untouched buckets must keep their generation")
    val after = dataFiles(path)
    val unchanged = before.intersect(after)
    assert(before.size - unchanged.size <= touched.size,
      s"more files changed (${before.size - unchanged.size}) than touched " +
        s"buckets (${touched.size})")
  }

  test("INSERT INTO a bucket-backed table routes to the keyed upsert") {
    val path = bucketBacked("sql_rt_ins")
    val before = dataFiles(path)
    Seq((7L, 2L, 70.0), (7L, 3L, 77.0), (65L, 1L, 65.0))
      .toDF("k", "pc", "v").createOrReplaceTempView("rt_ins_src")
    SqlMerge.exec(spark,
      "INSERT INTO sql_rt_ins SELECT k, pc, v FROM rt_ins_src")
    val got = contents(path).map(r => r._1 -> r._3).toMap
    // precombine dedup inside the batch: pc=3 wins for k=7
    assert(got(7L) == 77.0 && got(65L) == 65.0 && got(10L) == 10.0)
    assert(got.size == 65)
    val touched = Set(7L, 65L).map(k =>
      BucketTable.bucketOf(spark, path, Seq(k)))
    val after = dataFiles(path)
    assert(before.size - before.intersect(after).size <= touched.size,
      "INSERT INTO must rewrite only the touched buckets")
    // a column list null-fills non-identity columns; omitting the
    // precombine is a loud failure, not a silent zero-fill
    SqlMerge.exec(spark,
      "INSERT INTO sql_rt_ins (k, pc) SELECT 66, 1 ")
    assert(BucketTable.read(spark, path).filter("k = 66")
      .select("v").collect().head.isNullAt(0))
    val e = intercept[IllegalArgumentException] {
      SqlMerge.exec(spark, "INSERT INTO sql_rt_ins (k, v) SELECT 67, 1.0")
    }
    assert(e.getMessage.contains("precombine"))
    // INSERT OVERWRITE is Hudi's insert_overwrite_table here: the
    // batch REPLACES the table as one commit (precombine-deduped)
    SqlMerge.exec(spark,
      "INSERT OVERWRITE sql_rt_ins SELECT k, pc, v FROM rt_ins_src")
    val replaced = contents(path).map(r => r._1 -> r._3).toMap
    assert(replaced == Map(7L -> 77.0, 65L -> 65.0))
  }

  test("conditional MERGE routes through rewriteKeys, inserts included") {
    val path = bucketBacked("sql_rt_cond")
    Seq((3L, 2L, -1.0), (5L, 2L, 500.0), (200L, 2L, 200.0))
      .toDF("k", "pc", "v").createOrReplaceTempView("rt_cond_src")
    SqlMerge.exec(spark,
      """MERGE INTO sql_rt_cond t USING rt_cond_src s ON t.k = s.k
        |WHEN MATCHED AND s.v < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v, pc = s.pc
        |WHEN NOT MATCHED THEN INSERT (k, pc, v) VALUES (s.k, s.pc, s.v)""".stripMargin)
    val got = contents(path).map(r => r._1 -> r._3).toMap
    assert(!got.contains(3L))
    assert(got(5L) == 500.0 && got(200L) == 200.0 && got(10L) == 10.0)
    assert(got.size == 64 - 1 + 1)
  }

  test("DELETE/UPDATE on a bucket-backed table are targeted and exact") {
    val path = bucketBacked("sql_rt_dml")
    val before = dataFiles(path)
    SqlMerge.exec(spark, "DELETE FROM sql_rt_dml WHERE k % 16 = 3")
    val remaining = contents(path)
    assert(remaining.map(_._1) == (1 to 64).map(_.toLong)
      .filterNot(_ % 16 == 3))
    SqlMerge.exec(spark, "UPDATE sql_rt_dml u SET v = u.v * 2 WHERE u.k <= 2")
    val got = contents(path).map(r => r._1 -> r._3).toMap
    assert(got(1L) == 2.0 && got(2L) == 4.0 && got(10L) == 10.0)
    // key-column assignment rejected (would re-route rows)
    intercept[IllegalArgumentException] {
      SqlMerge.exec(spark, "UPDATE sql_rt_dml SET k = k + 1 WHERE k = 5")
    }
    // the two statements together rewrote only the buckets holding
    // matching rows; at least the untouched generation-0 buckets of
    // non-matching keys survive byte-identical
    val after = dataFiles(path)
    assert(before.intersect(after).nonEmpty,
      "some untouched bucket files must survive both statements")
  }

  test("equality DELETE on a secondary-indexed column resolves keys via the index") {
    val primary = fresh("sqlsi")
    val index = fresh("sqlsi_idx")
    val data = (1 to 60).map(i =>
      (i.toLong, 1L, if (i % 3 == 0) "click" else "view", i.toDouble))
      .toDF("k", "pc", "event_type", "v")
    BucketTable.create(data, primary, keys = Seq("k"), precombine = "pc",
      numBuckets = 8)
    SecondaryIndex.create(spark, primary, index, Seq("event_type"),
      numBuckets = 4)
    Catalog.registerLayoutTable(spark, "sql_rt_idx", "bucket", primary,
      secondaryIndex = Some((Seq("event_type"), index)))
    SqlMerge.exec(spark, "DELETE FROM sql_rt_idx WHERE event_type = 'click'")
    val left = BucketTable.read(spark, primary)
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(left.forall(_._3 == "view") && left.size == 40)
    // the index mappings for the deleted value are tombstoned: a
    // lookup serves zero rows without probing dead keys
    assert(SecondaryIndex.lookup(spark, primary, index, Seq("click")).isEmpty)
    assert(SecondaryIndex.lookup(spark, primary, index, Seq("view")).count() == 40)
  }

  test("bloom-backed table: MERGE, predicate DELETE and UPDATE are file-targeted") {
    val path = fresh("sqlbl")
    BloomTable.create(rows((1 to 64).map(i => (i.toLong, 1L, i.toDouble)): _*),
      path, keys = Seq("k"), precombine = "pc", numFiles = 8)
    Catalog.registerLayoutTable(spark, "sql_rt_bloom", "bloom", path)
    val before = dataFiles(path)
    Seq((7L, 2L, 70.0), (100L, 1L, 100.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("rt_bloom_src")
    SqlMerge.exec(spark,
      """MERGE INTO sql_rt_bloom t USING rt_bloom_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = BloomTable.read(spark, path).as[(Long, Long, Double)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(got(7L) == 70.0 && got(100L) == 100.0 && got.size == 65)
    assert(before.intersect(dataFiles(path)).nonEmpty,
      "files the merge keys cannot touch must survive byte-identical")
    SqlMerge.exec(spark, "DELETE FROM sql_rt_bloom WHERE v >= 60.0 AND v < 65.0")
    SqlMerge.exec(spark, "UPDATE sql_rt_bloom SET v = 0.0 WHERE k = 1")
    val after = BloomTable.read(spark, path).as[(Long, Long, Double)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(after(1L) == 0.0 && after.size == 60 &&
      !after.values.exists(v => v >= 60.0 && v < 65.0))
    // conditional merge over the bloom layout (insert + delete mix)
    Seq((2L, 3L, -1.0), (300L, 1L, 300.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("rt_bloom_cond")
    SqlMerge.exec(spark,
      """MERGE INTO sql_rt_bloom t USING rt_bloom_cond s ON t.k = s.k
        |WHEN MATCHED AND s.v < 0 THEN DELETE
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val fin = BloomTable.read(spark, path).as[(Long, Long, Double)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(!fin.contains(2L) && fin(300L) == 300.0)
  }

  test("partitioned-backed table: partition-only DELETE is metadata-only") {
    val path = fresh("sqlpt")
    val data = (1 to 60).map(i =>
      (s"d${i % 3}", i.toLong, 1L, i.toDouble)).toDF("day", "k", "pc", "v")
    PartitionedTable.create(data, path, keys = Seq("k"), precombine = "pc",
      partitionCols = Seq("day"))
    Catalog.registerLayoutTable(spark, "sql_rt_part", "partitioned", path)
    val before = dataFiles(path)
    SqlMerge.exec(spark, "DELETE FROM sql_rt_part WHERE day = 'd1'")
    // metadata-only: the EXACT same data files exist afterwards — only
    // the manifest shrank (Hudi's drop-partition fast path)
    assert(dataFiles(path) == before,
      "partition-only DELETE must not read or write any data file")
    val left = PartitionedTable.read(spark, path)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(left.forall(_._1 != "d1") && left.size == 40)
  }

  test("partitioned-backed table: MERGE, predicate DELETE/UPDATE, conditional MERGE") {
    val path = fresh("sqlpm")
    val data = (1 to 60).map(i =>
      (s"d${i % 3}", i.toLong, 1L, i.toDouble)).toDF("day", "k", "pc", "v")
    PartitionedTable.create(data, path, keys = Seq("k"), precombine = "pc",
      partitionCols = Seq("day"))
    Catalog.registerLayoutTable(spark, "sql_rt_part2", "partitioned", path)
    val before = dataFiles(path)
    // star-star MERGE routes to the partition-targeted upsert: only
    // the touched day's slice rewrites
    Seq(("d1", 7L, 2L, 70.0), ("d1", 100L, 1L, 100.0))
      .toDF("day", "k", "pc", "v").createOrReplaceTempView("rt_part_src")
    SqlMerge.exec(spark,
      """MERGE INTO sql_rt_part2 t USING rt_part_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = PartitionedTable.read(spark, path)
      .as[(String, Long, Long, Double)].collect().map(r => r._2 -> r._4).toMap
    assert(got(7L) == 70.0 && got(100L) == 100.0 && got.size == 61)
    val after = dataFiles(path)
    assert(before.intersect(after).size >= 2,
      "untouched day slices must survive the merge byte-identical")
    // mixed predicate DELETE → targeted slice rewrite (not a drop)
    SqlMerge.exec(spark, "DELETE FROM sql_rt_part2 WHERE v > 50.0 AND k < 60")
    val got2 = PartitionedTable.read(spark, path)
      .as[(String, Long, Long, Double)].collect().map(r => r._2 -> r._4).toMap
    assert(!got2.contains(7L) && got2.contains(100L) && got2.contains(60L))
    // UPDATE with a non-partition predicate
    SqlMerge.exec(spark, "UPDATE sql_rt_part2 SET v = v + 0.5 WHERE k <= 2")
    val got3 = PartitionedTable.read(spark, path)
      .as[(String, Long, Long, Double)].collect().map(r => r._2 -> r._4).toMap
    assert(got3(1L) == 1.5 && got3(2L) == 2.5 && got3(3L) == 3.0)
    // identity-column assignment rejected (would move rows across slices)
    intercept[IllegalArgumentException] {
      SqlMerge.exec(spark, "UPDATE sql_rt_part2 SET day = 'd9' WHERE k = 3")
    }
    // conditional MERGE on the full identity join
    Seq(("d0", 3L, 2L, -1.0), ("d2", 200L, 1L, 200.0))
      .toDF("day", "k", "pc", "v").createOrReplaceTempView("rt_part_cond")
    SqlMerge.exec(spark,
      """MERGE INTO sql_rt_part2 t USING rt_part_cond s
        |ON t.day = s.day AND t.k = s.k
        |WHEN MATCHED AND s.v < 0 THEN DELETE
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val fin = PartitionedTable.read(spark, path)
      .as[(String, Long, Long, Double)].collect().map(r => r._2 -> r._4).toMap
    assert(!fin.contains(3L) && fin(200L) == 200.0)
  }

  test("readTable dispatches by layout; stub location reads empty") {
    val path = bucketBacked("sql_rt_read")
    assert(Catalog.readTable(spark, "sql_rt_read").count() == 64)
    // the accidental direct read is EMPTY, never a superseded-gen union
    assert(spark.table("sql_rt_read").count() == 0)
  }
}
