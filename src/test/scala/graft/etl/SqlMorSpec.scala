package graft.etl

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions.col

/** MOR tables through the SQL front door: DML lands as O(batch) delta
  * LOG APPENDS (never a base rewrite — the load-bearing assertions are
  * that base files keep their exact bytes across every statement), a
  * conditional MERGE with a DELETE action commits as ONE mixed log,
  * the `_ro` companion entry is read-only and stale until
  * `CALL run_compaction`, and validators gate the MOR write routes.
  */
class SqlMorSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def rows(t: (Long, Long, Double)*) = t.toSeq.toDF("k", "pc", "v")

  /** Every data file under base= dirs with mtime+size (identity proxy). */
  private def baseFiles(dir: String): Set[(String, Any, Long)] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .filter(_.toString.contains("base="))
      .map(p => (p.toString, Files.getLastModifiedTime(p), Files.size(p)))
      .toSet

  private def morBacked(name: String, n: Int = 16): String = {
    val path = fresh("sqlmor")
    MorTable.create(rows((1 to n).map(i => (i.toLong, 1L, i.toDouble)): _*),
      path, keys = Seq("k"), precombine = "pc")
    Catalog.registerLayoutTable(spark, name, "mor", path)
    path
  }

  private def contents(path: String): Map[Long, Double] =
    MorTable.readSnapshot(spark, path).as[(Long, Long, Double)]
      .collect().map(r => r._1 -> r._3).toMap

  test("MERGE star-star appends one delta log; base bytes untouched") {
    val path = morBacked("sql_mor_merge")
    val before = baseFiles(path)
    Seq((3L, 2L, 30.0), (17L, 1L, 17.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("mor_m_src")
    SqlMerge.exec(spark,
      """MERGE INTO sql_mor_merge t USING mor_m_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(MorTable.state(path).contains((0L, 1L))) // one delta, base 0
    assert(baseFiles(path) == before)
    val expected = (1 to 16).map(i => i.toLong -> i.toDouble).toMap +
      (3L -> 30.0) + (17L -> 17.0)
    assert(contents(path) == expected)
  }

  test("UPDATE appends post-images of only the touched rows") {
    val path = morBacked("sql_mor_upd")
    val before = baseFiles(path)
    SqlMerge.exec(spark,
      "UPDATE sql_mor_upd SET v = v * 10 WHERE k <= 3")
    assert(baseFiles(path) == before)
    // the appended log carries exactly the 3 matched rows
    val (base, deltas) = MorTable.state(path).get
    assert((base, deltas) == (0L, 1L))
    assert(spark.read.parquet(s"$path/log=0.1").count() == 3)
    val expected = (1 to 16).map(i =>
      i.toLong -> (if (i <= 3) i * 10.0 else i.toDouble)).toMap
    assert(contents(path) == expected)
  }

  test("UPDATE that lowers the precombine fails loudly, writes nothing") {
    val path = morBacked("sql_mor_pcguard")
    MorTable.upsertInto(path, rows((1L, 5L, 100.0))) // k=1 at pc=5
    val ex = intercept[IllegalArgumentException] {
      SqlMerge.exec(spark,
        "UPDATE sql_mor_pcguard SET pc = 2, v = 0 WHERE k = 1")
    }
    assert(ex.getMessage.contains("precombine"))
    assert(MorTable.state(path).contains((0L, 1L))) // no new log
    assert(contents(path)(1L) == 100.0)
    // equal precombine is allowed: the later commit wins the merge
    SqlMerge.exec(spark,
      "UPDATE sql_mor_pcguard SET pc = 5, v = 7 WHERE k = 1")
    assert(contents(path)(1L) == 7.0)
  }

  test("UPDATE/MERGE that NULLs the precombine fail loudly, write nothing") {
    val path = morBacked("sql_mor_pcnull")
    // SET pc = NULL makes the `<` demotion comparison NULL — it must be
    // flagged as a violation, not slip past the guard and append a
    // post-image whose merge outcome is undefined
    val ex = intercept[IllegalArgumentException] {
      SqlMerge.exec(spark,
        "UPDATE sql_mor_pcnull SET pc = NULL, v = 0 WHERE k = 1")
    }
    assert(ex.getMessage.contains("precombine"))
    assert(MorTable.state(path).contains((0L, 0L))) // no new log
    assert(contents(path)(1L) == 1.0)
    // the conditional-MERGE twin has the same hole closed
    Seq((1L, 2L, 50.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("mor_pcnull_src")
    val ex2 = intercept[IllegalArgumentException] {
      SqlMerge.exec(spark,
        """MERGE INTO sql_mor_pcnull t USING mor_pcnull_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET pc = NULL, v = s.v""".stripMargin)
    }
    assert(ex2.getMessage.contains("precombine"))
    assert(MorTable.state(path).contains((0L, 0L)))
    assert(contents(path)(1L) == 1.0)
  }

  test("DELETE appends tombstones; base bytes untouched") {
    val path = morBacked("sql_mor_del")
    val before = baseFiles(path)
    SqlMerge.exec(spark, "DELETE FROM sql_mor_del WHERE k % 4 = 0")
    assert(baseFiles(path) == before)
    assert(MorTable.state(path).contains((0L, 1L)))
    val got = contents(path)
    assert(got.keySet == (1 to 16).filter(_ % 4 != 0).map(_.toLong).toSet)
  }

  test("conditional MERGE with a DELETE action is ONE atomic commit") {
    val path = morBacked("sql_mor_cond")
    Seq((1L, 2L, -1.0), (2L, 2L, 25.0), (99L, 1L, 99.0))
      .toDF("k", "pc", "v").createOrReplaceTempView("mor_c_src")
    SqlMerge.exec(spark,
      """MERGE INTO sql_mor_cond t USING mor_c_src s ON t.k = s.k
        |WHEN MATCHED AND s.v < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v, pc = s.pc
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // exactly one delta log carries the update, the insert, AND the
    // tombstone — a reader sees all of the statement or none of it
    assert(MorTable.state(path).contains((0L, 1L)))
    val got = contents(path)
    assert(!got.contains(1L))        // deleted
    assert(got(2L) == 25.0)          // updated
    assert(got(99L) == 99.0)         // inserted
    assert(got(16L) == 16.0)         // untouched
  }

  test("INSERT INTO appends a delta log") {
    val path = morBacked("sql_mor_ins")
    val before = baseFiles(path)
    SqlMerge.exec(spark,
      "INSERT INTO sql_mor_ins VALUES (100, 1, 1.5), (1, 9, -3.5)")
    assert(baseFiles(path) == before)
    assert(MorTable.state(path).contains((0L, 1L)))
    assert(contents(path)(100L) == 1.5)
    assert(contents(path)(1L) == -3.5) // pc 9 beats base pc 1
  }

  test("_ro companion is stale until run_compaction, and read-only") {
    val path = morBacked("sql_mor_main")
    Catalog.registerLayoutTable(spark, "sql_mor_main_ro", "mor_ro", path)
    SqlMerge.exec(spark, "UPDATE sql_mor_main SET v = 0 WHERE k = 1")
    // snapshot view sees the update; _ro still serves the old base
    val snap = SqlRead.select(spark,
      "SELECT v FROM sql_mor_main WHERE k = 1").as[Double].collect()
    assert(snap.toSeq == Seq(0.0))
    val ro = SqlRead.select(spark,
      "SELECT v FROM sql_mor_main_ro WHERE k = 1").as[Double].collect()
    assert(ro.toSeq == Seq(1.0))
    // DML against the _ro entry is rejected
    val ex = intercept[IllegalArgumentException] {
      SqlMerge.exec(spark, "UPDATE sql_mor_main_ro SET v = 9 WHERE k = 1")
    }
    assert(ex.getMessage.contains("read-only"))
    // compaction folds the logs; _ro catches up; clean retires old gens
    val v = SqlCall.exec(spark, "CALL run_compaction('sql_mor_main')")
      .as[Long].collect()
    assert(v.toSeq == Seq(1L))
    val ro2 = SqlRead.select(spark,
      "SELECT v FROM sql_mor_main_ro WHERE k = 1").as[Double].collect()
    assert(ro2.toSeq == Seq(0.0))
    val removed = SqlCall.exec(spark, "CALL clean('sql_mor_main')")
      .as[String].collect()
    assert(removed.toSet == Set("base=0", "log=0.1"))
    assert(contents(path).size == 16)
  }

  test("validators gate the MOR DML routes") {
    val path = fresh("sqlmorval")
    MorTable.create(rows((1L, 1L, 10.0)), path,
      keys = Seq("k"), precombine = "pc")
    Catalog.registerLayoutTable(spark, "sql_mor_val", "mor", path,
      validators = Seq("negative_v" -> "v < 0"))
    intercept[PreCommit.ValidationException] {
      SqlMerge.exec(spark, "INSERT INTO sql_mor_val VALUES (2, 1, -5.0)")
    }
    intercept[PreCommit.ValidationException] {
      SqlMerge.exec(spark, "UPDATE sql_mor_val SET v = v - 100 WHERE k = 1")
    }
    Seq((1L, 2L, -1.0)).toDF("k", "pc", "v")
      .createOrReplaceTempView("mor_v_src")
    intercept[PreCommit.ValidationException] {
      SqlMerge.exec(spark,
        """MERGE INTO sql_mor_val t USING mor_v_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    // nothing landed: no delta logs, contents intact
    assert(MorTable.state(path).contains((0L, 0L)))
    assert(contents(path) == Map(1L -> 10.0))
  }

  test("BY SOURCE actions land in the same single mixed delta log") {
    val path = morBacked("sql_mor_bs")
    Seq((1L, 2L, 10.5)).toDF("k", "pc", "v")
      .createOrReplaceTempView("mor_bs_src")
    SqlMerge.exec(spark,
      """MERGE INTO sql_mor_bs t USING mor_bs_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v, pc = s.pc
        |WHEN NOT MATCHED BY SOURCE AND t.v >= 15 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE AND t.v >= 13 THEN UPDATE SET v = 0
        |""".stripMargin)
    assert(MorTable.state(path).contains((0L, 1L))) // one atomic commit
    val got = contents(path)
    assert(got(1L) == 10.5)                       // matched update
    assert((15 to 16).forall(i => !got.contains(i.toLong))) // deleted
    assert(got(13L) == 0.0 && got(14L) == 0.0)    // by-source update
    assert(got(12L) == 12.0)                      // untouched
  }

  test("purge-style keyed MERGE DELETE tombstones via snapshot semi-join") {
    val path = morBacked("sql_mor_mdel")
    Seq(Tuple1(2L), Tuple1(4L), Tuple1(888L)).toDF("k")
      .createOrReplaceTempView("mor_d_src")
    SqlMerge.exec(spark,
      """MERGE INTO sql_mor_mdel t USING mor_d_src s ON t.k = s.k
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(MorTable.state(path).contains((0L, 1L)))
    // only live victims tombstoned; the unmatched source key is a no-op
    assert(spark.read.parquet(s"$path/log=0.1").count() == 2)
    assert(contents(path).keySet ==
      (1 to 16).map(_.toLong).toSet -- Set(2L, 4L))
  }
}
