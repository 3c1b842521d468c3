package graft.etl

import graft.SparkSpec
import java.nio.file.Files

class SqlMergeSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  /** Fresh catalog table (k BIGINT, pc BIGINT, v DOUBLE) keyed on k. */
  private def freshTable(rows: Seq[(Long, Long, Double)]): String = {
    n += 1
    val name = s"sql_merge_spec_$n"
    val loc = Files.createTempDirectory("sqlmerge").toString
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"""CREATE TABLE $name (k BIGINT, pc BIGINT, v DOUBLE)
         |USING PARQUET LOCATION '$loc/t'
         |TBLPROPERTIES (
         |  'graft.table.primaryKey' = 'k',
         |  'graft.table.preCombineField' = 'pc')""".stripMargin)
    rows.toDF("k", "pc", "v").write.mode("overwrite").insertInto(name)
    name
  }

  private def contents(t: String): Seq[(Long, Long, Double)] =
    spark.table(t).as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)

  test("table-declared validators gate SQL INSERT; a clean batch passes") {
    import org.apache.spark.sql.functions.col
    val p = Files.createTempDirectory("sqlmergeval").toString + "/t"
    BucketTable.create(Seq((1L, 1L, 10.0)).toDF("k", "pc", "v"), p,
      keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "sql_merge_val", "bucket", p,
      validators = Seq("negative_v" -> "v < 0", "null_key" -> "k IS NULL"))
    Seq((2L, 1L, -5.0), (3L, 1L, 3.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("sql_merge_val_bad")
    val e = intercept[PreCommit.ValidationException] {
      SqlMerge.exec(spark,
        "INSERT INTO sql_merge_val SELECT * FROM sql_merge_val_bad")
    }
    assert(e.counts == Map("negative_v" -> 1L))
    assert(BucketTable.read(spark, p).count() == 1)
    Seq((3L, 1L, 3.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("sql_merge_val_ok")
    SqlMerge.exec(spark,
      "INSERT INTO sql_merge_val SELECT * FROM sql_merge_val_ok")
    assert(BucketTable.read(spark, p).count() == 2)
    assert(BucketTable.read(spark, p).filter(col("v") < 0).count() == 0)
  }

  test("validators gate MERGE and UPDATE post-images, not just INSERT") {
    import org.apache.spark.sql.functions.col
    val p = Files.createTempDirectory("sqlmergevmu").toString + "/t"
    BucketTable.create(Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("k", "pc", "v"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "sql_merge_vmu", "bucket", p,
      validators = Seq("negative_v" -> "v < 0"))
    Seq((1L, 2L, -3.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("sql_merge_vmu_src")
    // star-star MERGE carrying a bad row aborts; table untouched
    intercept[PreCommit.ValidationException] {
      SqlMerge.exec(spark,
        """MERGE INTO sql_merge_vmu t USING sql_merge_vmu_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    // UPDATE whose post-image violates aborts before any rewrite
    intercept[PreCommit.ValidationException] {
      SqlMerge.exec(spark, "UPDATE sql_merge_vmu SET v = v - 100 WHERE k = 1")
    }
    // conditional MERGE is gated on the region's post-image too
    intercept[PreCommit.ValidationException] {
      SqlMerge.exec(spark,
        """MERGE INTO sql_merge_vmu t USING sql_merge_vmu_src s ON t.k = s.k
          |WHEN MATCHED AND s.pc > t.pc THEN UPDATE SET v = s.v""".stripMargin)
    }
    val got = BucketTable.read(spark, p).as[(Long, Long, Double)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> 10.0, 2L -> 20.0))
    // a clean UPDATE under the same rules proceeds
    SqlMerge.exec(spark, "UPDATE sql_merge_vmu SET v = v + 1 WHERE k = 1")
    assert(BucketTable.read(spark, p).filter(col("v") === 11.0).count() == 1)
  }

  test("WHEN NOT MATCHED BY SOURCE: update, delete, target-only resolution") {
    import org.apache.spark.sql.functions.col
    val p = Files.createTempDirectory("sqlmergebs").toString + "/t"
    BucketTable.create(
      (1 to 8).map(i => (i.toLong, 1L, i.toDouble)).toDF("k", "pc", "v"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "sql_merge_bs", "bucket", p)
    Seq((1L, 2L, 100.0), (9L, 1L, 9.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("sql_merge_bs_src")
    SqlMerge.exec(spark,
      """MERGE INTO sql_merge_bs t USING sql_merge_bs_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.v >= 7 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE AND t.k % 2 = 0 THEN UPDATE SET v = 0
        |""".stripMargin)
    val got = BucketTable.read(spark, p).as[(Long, Long, Double)]
      .collect().map(r => r._1 -> r._3).toMap
    // 1 updated via source; 9 inserted; 7,8 deleted (>=7, not in src);
    // 2,4,6 zeroed (even, not in src); 3,5 untouched
    assert(got == Map(1L -> 100.0, 2L -> 0.0, 3L -> 3.0, 4L -> 0.0,
      5L -> 5.0, 6L -> 0.0, 9L -> 9.0))
    // a source reference inside a by-source action is a loud failure
    val ex = intercept[IllegalArgumentException] {
      SqlMerge.exec(spark,
        """MERGE INTO sql_merge_bs t USING sql_merge_bs_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = s.v""".stripMargin)
    }
    assert(ex.getMessage.contains("cannot reference the source"))
    assert(BucketTable.read(spark, p).filter(col("k") === 3L)
      .as[(Long, Long, Double)].head()._3 == 3.0)
  }

  test("conditional BY SOURCE actions keep the rewrite targeted") {
    import java.nio.file.Paths
    import scala.jdk.CollectionConverters._
    val p = Files.createTempDirectory("sqlmergebst").toString + "/t"
    BucketTable.create(
      (1 to 64).map(i => (i.toLong, 1L, i.toDouble)).toDF("k", "pc", "v"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 8)
    Catalog.registerLayoutTable(spark, "sql_merge_bst", "bucket", p)
    def files(): Set[(String, Any)] =
      Files.walk(Paths.get(p)).iterator().asScala
        .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
        .map(f => (f.toString, Files.getLastModifiedTime(f))).toSet
    val before = files()
    Seq((7L, 2L, 70.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("sql_merge_bst_src")
    SqlMerge.exec(spark,
      """MERGE INTO sql_merge_bst t USING sql_merge_bst_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED BY SOURCE AND t.v = 33 THEN DELETE""".stripMargin)
    val got = BucketTable.read(spark, p).as[(Long, Long, Double)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(got(7L) == 70.0 && !got.contains(33L) && got.size == 63)
    // only the buckets of k=7 and k=33 were rewritten: every other
    // bucket's files carry their exact previous bytes
    val touched = Set(7L, 33L).map(k =>
      BucketTable.bucketOf(spark, p, Seq(k)))
    val untouchedBefore = before.filterNot { case (f, _) =>
      touched.exists(b => f.contains(s"b=$b/")) }
    assert(untouchedBefore.subsetOf(files()))
    assert(untouchedBefore.nonEmpty)
  }

  test("validators added via native ALTER TABLE SET TBLPROPERTIES take effect") {
    val p = Files.createTempDirectory("sqlmergealter").toString + "/t"
    BucketTable.create(Seq((1L, 1L, 10.0)).toDF("k", "pc", "v"), p,
      keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "sql_merge_alter", "bucket", p)
    Seq((2L, 1L, -7.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("sql_merge_alter_src")
    // no validators yet → the bad row sails through
    SqlMerge.exec(spark,
      "INSERT INTO sql_merge_alter SELECT * FROM sql_merge_alter_src")
    assert(BucketTable.read(spark, p).count() == 2)
    // declare the rule with PLAIN Spark SQL — no engine API needed
    spark.sql("ALTER TABLE sql_merge_alter SET TBLPROPERTIES " +
      "('graft.table.validator.negative_v' = 'v < 0')")
    val e = intercept[PreCommit.ValidationException] {
      SqlMerge.exec(spark,
        "INSERT INTO sql_merge_alter SELECT * FROM sql_merge_alter_src")
    }
    assert(e.counts == Map("negative_v" -> 1L))
    // and UNSET lifts the gate again
    spark.sql("ALTER TABLE sql_merge_alter UNSET TBLPROPERTIES " +
      "('graft.table.validator.negative_v')")
    SqlMerge.exec(spark,
      "INSERT INTO sql_merge_alter SELECT * FROM sql_merge_alter_src")
  }

  test("UPDATE SET * + INSERT * is the keyed precombine upsert") {
    val t = freshTable(Seq((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 10L, 3.0)))
    Seq((2L, 20L, 22.0), (3L, 5L, 33.0), (4L, 10L, 4.0))
      .toDF("k", "pc", "v").createOrReplaceTempView("merge_src")
    SqlMerge.merge(spark,
      s"""MERGE INTO $t t USING merge_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // k=2 updated (newer pc); k=3's incoming row LOSES the precombine
    // race (pc 5 < 10) so the existing row survives — Hudi MERGE
    // semantics with a precombine field, not ANSI last-writer-wins
    assert(contents(t) == Seq((1L, 10L, 1.0), (2L, 20L, 22.0),
      (3L, 10L, 3.0), (4L, 10L, 4.0)))
  }

  test("bare DELETE removes matched keys only") {
    val t = freshTable(Seq((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 10L, 3.0)))
    Seq((2L, 0L, 0.0), (9L, 0L, 0.0))
      .toDF("k", "pc", "v").createOrReplaceTempView("merge_del")
    SqlMerge.merge(spark,
      s"MERGE INTO $t t USING merge_del s ON t.k = s.k WHEN MATCHED THEN DELETE")
    assert(contents(t) == Seq((1L, 10L, 1.0), (3L, 10L, 3.0)))
  }

  test("a subquery source parses and merges") {
    val t = freshTable(Seq((1L, 10L, 1.0)))
    Seq((1L, 20L, 11.0), (1L, 30L, 111.0))
      .toDF("k", "pc", "v").createOrReplaceTempView("merge_sub")
    SqlMerge.merge(spark,
      s"""MERGE INTO $t t
         |USING (SELECT k, pc, v FROM merge_sub WHERE pc <= 20) s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(contents(t) == Seq((1L, 20L, 11.0)))
  }

  test("non-key ON conditions and theta joins fail loudly") {
    val t = freshTable(Seq((1L, 10L, 1.0)))
    Seq((1L, 20L, 11.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("merge_bad")
    val e1 = intercept[IllegalArgumentException] {
      SqlMerge.merge(spark,
        s"""MERGE INTO $t t USING merge_bad s ON t.v = s.v
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e1.getMessage.contains("primary key"))
    val e2 = intercept[IllegalArgumentException] {
      SqlMerge.merge(spark,
        s"""MERGE INTO $t t USING merge_bad s ON t.k > s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e2.getMessage.contains("equality"))
  }

  test("DELETE FROM removes predicate-selected rows, keeps NULL-predicate rows") {
    val t = freshTable(Seq((1L, 10L, 1.0), (2L, 10L, 4.0), (3L, 10L, 9.0)))
    SqlMerge.exec(spark, s"DELETE FROM $t WHERE v > 3.0")
    assert(contents(t) == Seq((1L, 10L, 1.0)))
    // no WHERE deletes everything
    SqlMerge.exec(spark, s"DELETE FROM $t")
    assert(contents(t).isEmpty)
  }

  test("UPDATE SET rewrites assigned columns under the predicate only") {
    val t = freshTable(Seq((1L, 10L, 1.0), (2L, 10L, 4.0), (3L, 10L, 9.0)))
    SqlMerge.exec(spark,
      s"UPDATE $t SET v = v * 10, pc = 99 WHERE k >= 2")
    assert(contents(t) == Seq((1L, 10L, 1.0), (2L, 99L, 40.0), (3L, 99L, 90.0)))
    // table-qualified references resolve against the self-alias
    SqlMerge.exec(spark,
      s"UPDATE $t SET v = 0.0 WHERE ${t.split('.').last}.k = 1")
    assert(contents(t).head == ((1L, 10L, 0.0)))
  }

  test("DELETE and UPDATE honor a user-written target alias") {
    val t = freshTable(Seq((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 10L, 3.0)))
    SqlMerge.exec(spark, s"DELETE FROM $t x WHERE x.v > 2.5")
    assert(contents(t) == Seq((1L, 10L, 1.0), (2L, 10L, 2.0)))
    SqlMerge.exec(spark, s"UPDATE $t AS u SET v = u.v + 1 WHERE u.k = 1")
    assert(contents(t) == Seq((1L, 10L, 2.0), (2L, 10L, 2.0)))
  }

  test("UPDATE resolves SET targets case-insensitively, rejects unknowns") {
    val t = freshTable(Seq((1L, 10L, 1.0)))
    SqlMerge.exec(spark, s"UPDATE $t SET V = 5.0 WHERE K = 1")
    assert(contents(t) == Seq((1L, 10L, 5.0)))
    val e = intercept[IllegalArgumentException] {
      SqlMerge.exec(spark, s"UPDATE $t SET valu = 0 WHERE k = 1")
    }
    assert(e.getMessage.contains("valu"))
    assert(contents(t) == Seq((1L, 10L, 5.0)), "failed UPDATE must not write")
  }

  test("unsupported clause shapes fail loudly, table untouched") {
    val t = freshTable(Seq((1L, 10L, 1.0)))
    Seq((1L, 20L, 11.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("merge_shape")
    val before = contents(t)
    intercept[IllegalArgumentException] {
      SqlMerge.merge(spark,
        s"""MERGE INTO $t t USING merge_shape s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET k = s.k + 1""".stripMargin)
    }
    assert(contents(t) == before)
    // star-star + unconditional BY SOURCE DELETE now runs: matched
    // rows upsert, target-only rows go — "mirror the source"
    SqlMerge.merge(spark,
      s"""MERGE INTO $t t USING merge_shape s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(contents(t) == Seq((1L, 20L, 11.0)))
  }

  test("conditional MERGE: first matching action wins, unmatched rows keep/drop") {
    val t = freshTable(Seq((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 10L, 3.0),
      (4L, 10L, 4.0)))
    // source: k=1 (older pc — still updates: conditions are ANSI, not
    // precombine), k=2 (delete: v negative), k=3 (no condition holds →
    // target row kept), k=5 (insert, passes filter), k=6 (insert
    // filtered out → dropped)
    Seq((1L, 5L, 10.0), (2L, 20L, -2.0), (3L, 20L, 3.0), (5L, 20L, 50.0),
      (6L, 20L, -6.0))
      .toDF("k", "pc", "v").createOrReplaceTempView("merge_cond")
    SqlMerge.merge(spark,
      s"""MERGE INTO $t t USING merge_cond s ON t.k = s.k
         |WHEN MATCHED AND s.v < 0 THEN DELETE
         |WHEN MATCHED AND s.v > t.v THEN UPDATE SET v = s.v, pc = s.pc
         |WHEN NOT MATCHED AND s.v > 0 THEN INSERT (k, pc, v) VALUES (s.k, s.pc, s.v)""".stripMargin)
    assert(contents(t) == Seq((1L, 5L, 10.0), (3L, 10L, 3.0),
      (4L, 10L, 4.0), (5L, 20L, 50.0)))
  }

  test("conditional MERGE: explicit INSERT leaves unassigned columns null") {
    val t = freshTable(Seq((1L, 10L, 1.0)))
    Seq((7L, 70L, 7.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("merge_ins")
    SqlMerge.merge(spark,
      s"""MERGE INTO $t t USING merge_ins s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT (k, pc) VALUES (s.k, s.pc)""".stripMargin)
    val rows = spark.table(t).as[(Long, Long, Option[Double])]
      .collect().toSeq.sortBy(_._1)
    assert(rows == Seq((1L, 10L, Some(1.0)), (7L, 70L, None)))
  }

  test("conditional MERGE rejects key-column updates and keyless inserts") {
    val t = freshTable(Seq((1L, 10L, 1.0)))
    Seq((1L, 20L, 2.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("merge_bad")
    intercept[IllegalArgumentException] {
      SqlMerge.merge(spark,
        s"""MERGE INTO $t t USING merge_bad s ON t.k = s.k
           |WHEN MATCHED AND s.v > 0 THEN UPDATE SET k = s.k + 100""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      SqlMerge.merge(spark,
        s"""MERGE INTO $t t USING merge_bad s ON t.k = s.k
           |WHEN NOT MATCHED THEN INSERT (pc, v) VALUES (s.pc, s.v)""".stripMargin)
    }
    assert(contents(t) == Seq((1L, 10L, 1.0)))
  }

  test("INSERT OVERWRITE replaces bucket/mor/timeline tables as one commit") {
    import scala.jdk.CollectionConverters._
    // bucket: batch replaces the table; untouched old generation's
    // files survive on disk (readers/clean contract) but leave the view
    val bp = Files.createTempDirectory("ovwb").toString + "/t"
    BucketTable.create(
      (1 to 8).map(i => (i.toLong, 1L, i.toDouble)).toDF("k", "pc", "v"),
      bp, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "ovw_bucket", "bucket", bp)
    val before = Files.walk(java.nio.file.Paths.get(bp)).iterator().asScala
      .count(f => f.toString.endsWith(".parquet"))
    SqlMerge.exec(spark,
      "INSERT OVERWRITE ovw_bucket VALUES (100L, 2L, 1.0D), (101L, 2L, 2.0D)")
    assert(Catalog.readTable(spark, "ovw_bucket")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
      .map(r => (r._1, r._3)) == Seq(100L -> 1.0, 101L -> 2.0))
    val after = Files.walk(java.nio.file.Paths.get(bp)).iterator().asScala
      .count(f => f.toString.endsWith(".parquet"))
    assert(after > before) // old generation untouched, not deleted
    // empty overwrite is a loud failure, not a bricked manifest
    spark.emptyDataset[(Long, Long, Double)].toDF("k", "pc", "v")
      .createOrReplaceTempView("ovw_empty")
    val e = intercept[IllegalArgumentException] {
      SqlMerge.exec(spark,
        "INSERT OVERWRITE ovw_bucket SELECT * FROM ovw_empty")
    }
    assert(e.getMessage.contains("empty batch"))
    // mor: the overwrite is a fresh base with zero logs
    val mp = Files.createTempDirectory("ovwm").toString + "/t"
    MorTable.create(Seq((1L, 1L, 10.0)).toDF("k", "pc", "v"), mp,
      keys = Seq("k"), precombine = "pc")
    MorTable.upsertInto(mp, Seq((2L, 2L, 20.0)).toDF("k", "pc", "v"))
    Catalog.registerLayoutTable(spark, "ovw_mor", "mor", mp)
    SqlMerge.exec(spark, "INSERT OVERWRITE ovw_mor VALUES (7L, 3L, 70.0D)")
    assert(MorTable.state(mp).exists(_._2 == 0L)) // zero delta logs
    assert(Catalog.readTable(spark, "ovw_mor")
      .as[(Long, Long, Double)].collect().toSeq == Seq((7L, 3L, 70.0)))
    // timeline: overwrite is one more VERSION; the old state time-travels
    val tp = Files.createTempDirectory("ovwt").toString + "/t"
    Timeline.upsertInto(spark, tp,
      Seq((1L, 1L, 10.0)).toDF("k", "pc", "v"), Seq("k"), "pc")
    Catalog.registerTimelineTable(spark, "ovw_tl", tp, Seq("k"), "pc")
    SqlMerge.exec(spark, "INSERT OVERWRITE ovw_tl VALUES (9L, 2L, 90.0D)")
    assert(SqlRead.select(spark, "SELECT k, v FROM ovw_tl")
      .as[(Long, Double)].collect().toSeq == Seq(9L -> 90.0))
    assert(SqlRead.select(spark, "SELECT k, v FROM ovw_tl VERSION AS OF 0")
      .as[(Long, Double)].collect().toSeq == Seq(1L -> 10.0))
  }

  test("DELETE with conflicting equalities on an indexed column deletes nothing") {
    val bp = Files.createTempDirectory("delconf").toString + "/t"
    val ip = Files.createTempDirectory("delconf").toString + "/idx"
    BucketTable.create(
      Seq((1L, 1L, 10.0, "red"), (2L, 1L, 20.0, "blue"))
        .toDF("k", "pc", "v", "color"),
      bp, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    SecondaryIndex.create(spark, bp, ip, Seq("color"))
    Catalog.registerLayoutTable(spark, "del_conflict", "bucket", bp,
      secondaryIndex = Some((Seq("color"), ip)))
    // color='red' AND color='blue' is always false: the index route must
    // NOT collapse it to a point lookup on the last literal and delete
    // the blue row the statement never selected
    SqlMerge.exec(spark,
      "DELETE FROM del_conflict WHERE color = 'red' AND color = 'blue'")
    assert(Catalog.readTable(spark, "del_conflict").count() == 2)
    // a repeated SAME literal is still a valid point lookup
    SqlMerge.exec(spark,
      "DELETE FROM del_conflict WHERE color = 'red' AND color = 'red'")
    assert(Catalog.readTable(spark, "del_conflict").select($"color")
      .as[String].collect().toSeq == Seq("blue"))
  }

  test("conditional MERGE dedups a source exposing the precombine in another case") {
    val t = freshTable(Seq((1L, 10L, 1.0)))
    // source column is `PC`: resolution must stay case-insensitive, so
    // the per-key precombine dedup still runs — without it both source
    // rows fan through the full-outer join and write duplicate k=1 rows
    Seq((1L, 20L, 2.0), (1L, 30L, 3.0)).toDF("k", "PC", "v")
      .createOrReplaceTempView("merge_cased_pc")
    SqlMerge.merge(spark,
      s"""MERGE INTO $t t USING merge_cased_pc s ON t.k = s.k
         |WHEN MATCHED AND s.v > 0 THEN UPDATE SET v = s.v, pc = s.PC""".stripMargin)
    assert(contents(t) == Seq((1L, 30L, 3.0)))
  }

  test("INSERT OVERWRITE rebuilds a bound secondary index from the new state") {
    val bp = Files.createTempDirectory("ovwsi").toString + "/t"
    val ip = Files.createTempDirectory("ovwsi").toString + "/idx"
    BucketTable.create(
      Seq((1L, 1L, 10.0, "red"), (2L, 1L, 20.0, "blue"))
        .toDF("k", "pc", "v", "color"),
      bp, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    SecondaryIndex.create(spark, bp, ip, Seq("color"))
    Catalog.registerLayoutTable(spark, "ovw_sec", "bucket", bp,
      secondaryIndex = Some((Seq("color"), ip)))
    SqlMerge.exec(spark,
      "INSERT OVERWRITE ovw_sec VALUES (5L, 2L, 50.0D, 'green'), " +
        "(6L, 2L, 60.0D, 'red')")
    // index-served DELETE must resolve against the POST-overwrite rows:
    // a stale index would delete nothing (old keys are gone) or wrong
    SqlMerge.exec(spark, "DELETE FROM ovw_sec WHERE color = 'red'")
    assert(Catalog.readTable(spark, "ovw_sec").select($"k", $"color")
      .as[(Long, String)].collect().toMap == Map(5L -> "green"))
  }

  test("declared 'occ' write concurrency routes SQL ingest through the optimistic front door") {
    val path = Files.createTempDirectory("sqlocc").toString + "/t"
    BucketTable.create(
      Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("k", "pc", "v"),
      path, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "sql_occ_t", "bucket", path)
    spark.sql("ALTER TABLE sql_occ_t SET TBLPROPERTIES " +
      "('graft.table.writeConcurrency' = 'occ')")
    Seq((1L, 2L, -1.0), (3L, 1L, 30.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("sql_occ_src")
    SqlMerge.exec(spark,
      """MERGE INTO sql_occ_t t USING sql_occ_src s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    def state(): Map[Long, Double] = Catalog.readTable(spark, "sql_occ_t")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(state() == Map(1L -> -1.0, 2L -> 20.0, 3L -> 30.0))
    // the commit went through the OCC path: optimistic generations are
    // nanotime-unique (never the sequential max+1 the single-writer
    // path allocates)
    assert(BucketTable.manifest(path).values.max > 1000000L,
      s"expected a nanotime OCC generation, got ${BucketTable.manifest(path)}")
    // INSERT INTO routes through the same front door
    SqlMerge.exec(spark, "INSERT INTO sql_occ_t VALUES (4, 1, 40.0)")
    assert(state() == Map(1L -> -1.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0))
    // validators still gate the OCC route before any write
    Catalog.registerLayoutTable(spark, "sql_occ_v", "bucket", path,
      validators = Seq(("no_neg", "v < 0")))
    spark.sql("ALTER TABLE sql_occ_v SET TBLPROPERTIES " +
      "('graft.table.writeConcurrency' = 'occ')")
    val m0 = BucketTable.manifest(path)
    Seq((9L, 1L, -9.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("sql_occ_bad")
    intercept[PreCommit.ValidationException] {
      SqlMerge.exec(spark,
        """MERGE INTO sql_occ_v t USING sql_occ_bad s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(BucketTable.manifest(path) == m0) // byte-identical table
  }
}
