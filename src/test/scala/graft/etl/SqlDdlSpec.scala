package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** CTAS routed to layout creation: each layout kind stands up from
  * pure SQL, is immediately DML-able/readable through the front
  * doors, misconfiguration fails loudly, and a CTAS without graft
  * properties falls through to Spark untouched.
  */
class SqlDdlSpec extends SparkSpec {
  import spark.implicits._

  private def src(view: String): Unit = {
    Seq((1L, 1L, 10.0, "a"), (2L, 1L, 20.0, "b"), (2L, 2L, 22.0, "b"))
      .toDF("k", "pc", "v", "part").createOrReplaceTempView(view)
    ()
  }

  test("CTAS bucket layout: created, registered, DML-able") {
    val path = Files.createTempDirectory("ctasb").toString + "/t"
    src("ctas_src_b")
    SqlDdl.exec(spark,
      s"""CREATE TABLE ctas_bucket TBLPROPERTIES (
         |  'graft.table.layout' = 'bucket',
         |  'graft.table.path' = '$path',
         |  'graft.table.primaryKey' = 'k',
         |  'graft.table.preCombineField' = 'pc',
         |  'graft.table.numBuckets' = '4')
         |AS SELECT k, pc, v FROM ctas_src_b""".stripMargin)
    // precombine applied at create: k=2 keeps pc=2
    val got = Catalog.readTable(spark, "ctas_bucket")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> 10.0, 2L -> 22.0))
    SqlMerge.exec(spark, "UPDATE ctas_bucket SET v = v + 1 WHERE k = 1")
    assert(Catalog.readTable(spark, "ctas_bucket").filter("k = 1")
      .select("v").as[Double].head() == 11.0)
  }

  test("CTAS partitioned layout takes PARTITIONED BY; timeline CTAS time-travels") {
    val p1 = Files.createTempDirectory("ctasp").toString + "/t"
    src("ctas_src_p")
    SqlDdl.exec(spark,
      s"""CREATE TABLE ctas_part PARTITIONED BY (part) TBLPROPERTIES (
         |  'graft.table.layout' = 'partitioned',
         |  'graft.table.path' = '$p1',
         |  'graft.table.primaryKey' = 'k',
         |  'graft.table.preCombineField' = 'pc')
         |AS SELECT k, pc, v, part FROM ctas_src_p""".stripMargin)
    assert(PartitionedTable.props(p1).partitionCols == Seq("part"))
    assert(Catalog.readTable(spark, "ctas_part").count() == 2)

    val p2 = Files.createTempDirectory("ctast").toString + "/t"
    SqlDdl.exec(spark,
      s"""CREATE TABLE ctas_tl TBLPROPERTIES (
         |  'graft.table.layout' = 'timeline',
         |  'graft.table.path' = '$p2',
         |  'graft.table.primaryKey' = 'k',
         |  'graft.table.preCombineField' = 'pc')
         |AS SELECT k, pc, v FROM ctas_src_p""".stripMargin)
    assert(SqlRead.select(spark,
      "SELECT * FROM ctas_tl VERSION AS OF 0").count() == 2)
  }

  test("CTAS mor layout: batch becomes base v0, DML appends delta logs") {
    val path = Files.createTempDirectory("ctasm").toString + "/t"
    src("ctas_src_m")
    SqlDdl.exec(spark,
      s"""CREATE TABLE ctas_mor TBLPROPERTIES (
         |  'graft.table.layout' = 'mor',
         |  'graft.table.path' = '$path',
         |  'graft.table.primaryKey' = 'k',
         |  'graft.table.preCombineField' = 'pc')
         |AS SELECT k, pc, v FROM ctas_src_m""".stripMargin)
    // precombine applied at create: k=2 keeps pc=2
    val got = Catalog.readTable(spark, "ctas_mor")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> 10.0, 2L -> 22.0))
    assert(MorTable.state(path).contains((0L, 0L)))
    // DML through the front door appends a log, never rewrites the base
    SqlMerge.exec(spark, "UPDATE ctas_mor SET v = 0.0 WHERE k = 1")
    assert(MorTable.state(path).contains((0L, 1L)))
    assert(Catalog.readTable(spark, "ctas_mor").filter($"k" === 1L)
      .select($"v").as[Double].head() == 0.0)
  }

  test("missing config fails loudly; plain CTAS falls through to Spark") {
    src("ctas_src_e")
    val e = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark,
        """CREATE TABLE ctas_bad TBLPROPERTIES (
          |  'graft.table.layout' = 'bucket',
          |  'graft.table.path' = '/tmp/x')
          |AS SELECT k, pc, v FROM ctas_src_e""".stripMargin)
    }
    assert(e.getMessage.contains("primaryKey"))
    val loc = Files.createTempDirectory("ctaspl").toString + "/plain"
    SqlDdl.exec(spark,
      s"""CREATE TABLE ctas_plain USING parquet LOCATION '$loc'
         |AS SELECT k, v FROM ctas_src_e""".stripMargin)
    assert(spark.table("ctas_plain").count() == 3)
  }

  test("ALTER TABLE ADD COLUMNS is metadata-only; reads widen with typed NULLs") {
    import java.nio.file.Paths
    import scala.jdk.CollectionConverters._
    val p = Files.createTempDirectory("alterb").toString + "/t"
    BucketTable.create(
      (1 to 16).map(i => (i.toLong, 1L, i.toDouble)).toDF("k", "pc", "v"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "alter_bucket", "bucket", p)
    def files(): Set[(String, Any)] =
      Files.walk(Paths.get(p)).iterator().asScala
        .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
        .map(f => (f.toString, Files.getLastModifiedTime(f))).toSet
    val before = files()
    SqlDdl.exec(spark,
      "ALTER TABLE alter_bucket ADD COLUMNS (score DOUBLE, tag STRING)")
    // zero file writes — the statement is one catalog mutation
    assert(files() == before)
    val widened = Catalog.readTable(spark, "alter_bucket")
    assert(widened.schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(widened.schema("tag").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(widened.filter("score IS NOT NULL OR tag IS NOT NULL").count() == 0)
    assert(widened.count() == 16)
  }

  test("added column flows through every DML route on the targeted region") {
    import java.nio.file.Paths
    import scala.jdk.CollectionConverters._
    val p = Files.createTempDirectory("alterdml").toString + "/t"
    BucketTable.create(
      (1 to 32).map(i => (i.toLong, 1L, i.toDouble)).toDF("k", "pc", "v"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 8)
    Catalog.registerLayoutTable(spark, "alter_dml", "bucket", p)
    SqlDdl.exec(spark, "ALTER TABLE alter_dml ADD COLUMNS (score DOUBLE)")
    def files(): Set[(String, Any)] =
      Files.walk(Paths.get(p)).iterator().asScala
        .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
        .map(f => (f.toString, Files.getLastModifiedTime(f))).toSet
    val before = files()
    // UPDATE assigns the declared-only column: k=5's bucket rewrites,
    // the rest keep their exact previous bytes
    SqlMerge.exec(spark, "UPDATE alter_dml SET score = v * 10 WHERE k = 5")
    val b5 = BucketTable.bucketOf(spark, p, Seq(5L))
    val untouched = before.filterNot(_._1.contains(s"b=$b5/"))
    assert(untouched.subsetOf(files()) && untouched.nonEmpty)
    // INSERT without the column null-fills it; MERGE assigns it
    SqlMerge.exec(spark,
      "INSERT INTO alter_dml (k, pc, v) VALUES (100, 1, 1.0)")
    Seq((6L, 2L, 60.0)).toDF("k", "pc", "s")
      .createOrReplaceTempView("alter_dml_src")
    SqlMerge.exec(spark,
      """MERGE INTO alter_dml t USING alter_dml_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET score = s.s""".stripMargin)
    val got = Catalog.readTable(spark, "alter_dml")
      .select($"k", $"score").as[(Long, Option[Double])].collect().toMap
    assert(got(5L).contains(50.0) && got(6L).contains(60.0) &&
      got(100L).isEmpty && got(1L).isEmpty && got.size == 33)
  }

  test("ALTER on a MOR table widens the snapshot; DEFAULT/position rejected") {
    val p = Files.createTempDirectory("altermor").toString + "/t"
    MorTable.create(Seq((1L, 1L, 10.0)).toDF("k", "pc", "v"), p,
      keys = Seq("k"), precombine = "pc")
    Catalog.registerLayoutTable(spark, "alter_mor", "mor", p)
    SqlDdl.exec(spark, "ALTER TABLE alter_mor ADD COLUMNS (score DOUBLE)")
    // the UPDATE's post-image delta log carries the column; the base
    // file never rewrites and the snapshot merge still resolves
    SqlMerge.exec(spark, "UPDATE alter_mor SET score = 99.0 WHERE k = 1")
    val got = Catalog.readTable(spark, "alter_mor")
      .select($"k", $"score").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(99.0)))
    // a constant DEFAULT is metadata-only on MOR too: absent in the
    // base and logs, served by the snapshot's declared-schema reconcile
    SqlDdl.exec(spark, "ALTER TABLE alter_mor ADD COLUMNS (n INT DEFAULT 7)")
    assert(Catalog.readTable(spark, "alter_mor").select($"n")
      .as[Int].head() == 7)
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark,
        "ALTER TABLE alter_mor ADD COLUMNS (bad INT FIRST)")
    }
    assert(e2.getMessage.contains("FIRST/AFTER"))
  }

  test("RENAME COLUMN is metadata-only; files keep the physical name forever") {
    import java.nio.file.Paths
    import scala.jdk.CollectionConverters._
    val p = Files.createTempDirectory("renameb").toString + "/t"
    BucketTable.create(
      (1 to 16).map(i => (i.toLong, 1L, i.toDouble)).toDF("k", "pc", "v"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "ren_bucket", "bucket", p)
    def files(): Set[(String, Any)] =
      Files.walk(Paths.get(p)).iterator().asScala
        .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
        .map(f => (f.toString, Files.getLastModifiedTime(f))).toSet
    val before = files()
    SqlDdl.exec(spark, "ALTER TABLE ren_bucket RENAME COLUMN v TO amount")
    assert(files() == before) // one catalog write, zero file writes
    val widened = Catalog.readTable(spark, "ren_bucket")
    assert(widened.columns.toSeq == Seq("k", "pc", "amount"))
    assert(widened.filter("amount = 7.0").count() == 1)
    // DML speaks the logical name; the touched bucket's NEW file still
    // carries the PHYSICAL name (snapshots never mix spellings)
    SqlMerge.exec(spark,
      "UPDATE ren_bucket SET amount = amount * 10 WHERE k = 5")
    SqlMerge.exec(spark,
      "INSERT INTO ren_bucket (k, pc, amount) VALUES (100, 1, 1.5)")
    val got = Catalog.readTable(spark, "ren_bucket")
      .select($"k", $"amount").as[(Long, Double)].collect().toMap
    assert(got(5L) == 50.0 && got(100L) == 1.5 && got(7L) == 7.0 &&
      got.size == 17)
    val physical = spark.read.parquet(
      files().map(_._1).toSeq: _*)
    assert(physical.columns.contains("v") &&
      !physical.columns.contains("amount"))
    // DELETE through the renamed predicate (k=5 carries 50.0);
    // rename back collapses the map
    SqlMerge.exec(spark, "DELETE FROM ren_bucket WHERE amount > 40")
    assert(Catalog.readTable(spark, "ren_bucket").count() == 16)
    SqlDdl.exec(spark, "ALTER TABLE ren_bucket RENAME COLUMN amount TO v")
    assert(Catalog.renamesOf(spark, "ren_bucket").isEmpty)
    assert(Catalog.readTable(spark, "ren_bucket").columns.contains("v"))
  }

  test("DROP COLUMNS is metadata-only; dropped data never resurrects") {
    import java.nio.file.Paths
    import scala.jdk.CollectionConverters._
    val p = Files.createTempDirectory("dropb").toString + "/t"
    BucketTable.create(
      (1 to 16).map(i => (i.toLong, 1L, i.toDouble, s"t$i"))
        .toDF("k", "pc", "v", "tag"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "drop_bucket", "bucket", p)
    def files(): Set[(String, Any)] =
      Files.walk(Paths.get(p)).iterator().asScala
        .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
        .map(f => (f.toString, Files.getLastModifiedTime(f))).toSet
    val before = files()
    SqlDdl.exec(spark, "ALTER TABLE drop_bucket DROP COLUMNS (tag)")
    assert(files() == before)
    assert(Catalog.readTable(spark, "drop_bucket").columns.toSeq ==
      Seq("k", "pc", "v"))
    // DML keeps working; the rewrite drops the column from touched files
    SqlMerge.exec(spark, "DELETE FROM drop_bucket WHERE v > 15")
    assert(Catalog.readTable(spark, "drop_bucket").count() == 15)
    // IF EXISTS tolerates a missing column; plain DROP fails loudly
    SqlDdl.exec(spark,
      "ALTER TABLE drop_bucket DROP COLUMNS IF EXISTS (ghost)")
    val e = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE drop_bucket DROP COLUMNS (ghost)")
    }
    assert(e.getMessage.contains("no such column"))
    // re-ADD of the retired physical name would resurrect old values
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE drop_bucket ADD COLUMNS (tag STRING)")
    }
    assert(e2.getMessage.contains("retired"))
  }

  test("structural columns refuse metadata-only DROP/RENAME") {
    val p = Files.createTempDirectory("guardb").toString + "/t"
    BucketTable.create(
      Seq((1L, 1L, 10.0)).toDF("k", "pc", "v"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 2)
    Catalog.registerLayoutTable(spark, "guard_bucket", "bucket", p,
      validators = Seq("v_pos" -> "v < 0"))
    val eKey = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE guard_bucket RENAME COLUMN k TO id")
    }
    assert(eKey.getMessage.contains("primary-key"))
    val ePc = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE guard_bucket DROP COLUMNS (pc)")
    }
    assert(ePc.getMessage.contains("precombine"))
    val eVal = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE guard_bucket RENAME COLUMN v TO w")
    }
    assert(eVal.getMessage.contains("validator"))
    // plain (non-layout) tables have no schema-on-read layer
    spark.sql("CREATE TABLE IF NOT EXISTS guard_plain (a INT) USING PARQUET " +
      s"LOCATION '${Files.createTempDirectory("guardp")}/p'")
    val ePlain = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE guard_plain RENAME COLUMN a TO b")
    }
    assert(ePlain.getMessage.contains("layout-bound"))
  }

  test("ALTER TABLE RENAME TO carries the layout binding and schema state") {
    val p = Files.createTempDirectory("rentab").toString + "/t"
    BucketTable.create(
      Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("k", "pc", "v"), p,
      keys = Seq("k"), precombine = "pc", numBuckets = 2)
    Catalog.registerLayoutTable(spark, "rt_before", "bucket", p)
    SqlDdl.exec(spark, "ALTER TABLE rt_before RENAME COLUMN v TO amount")
    SqlDdl.exec(spark, "ALTER TABLE rt_before RENAME TO rt_after")
    // binding, key config, AND the rename map all moved with the entry
    assert(Catalog.layoutOf(spark, "rt_after").contains(("bucket", p)))
    assert(Catalog.renamesOf(spark, "rt_after") == Map("amount" -> "v"))
    SqlMerge.exec(spark, "UPDATE rt_after SET amount = 99.0 WHERE k = 2")
    val got = Catalog.readTable(spark, "rt_after")
      .select($"k", $"amount").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 10.0, 2L -> 99.0))
  }

  test("stats-index columns, physical shadows, and prop escapes survive ALTER") {
    val p = Files.createTempDirectory("guard2").toString + "/t"
    BucketTable.create(
      (1 to 8).map(i => (i.toLong, 1L, i.toDouble, i * 100L))
        .toDF("k", "pc", "v", "ts"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 2)
    val statsPath = Files.createTempDirectory("guard2s").toString + "/stats"
    StatsIndex.buildFromFiles(spark,
      BucketTable.read(spark, p).inputFiles.toSeq,
      Seq("v", "day:=ts div 100"), statsPath)
    Catalog.registerLayoutTable(spark, "guard2_t", "bucket", p,
      statsIndex = Some(statsPath))
    // a column-stats index protects its plain columns AND the columns
    // its functional entries reference — a remap would brick every
    // stats-routed SELECT at the next sync
    val e1 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE guard2_t RENAME COLUMN v TO w")
    }
    assert(e1.getMessage.contains("column-stats"))
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE guard2_t DROP COLUMNS (ts)")
    }
    assert(e2.getMessage.contains("column-stats"))
    // an UNDECLARED physical column (API upsert widened the files)
    // cannot be shadowed by a rename — it would serve the wrong data
    BucketTable.upsertInto(spark, p,
      Seq((9L, 2L, 9.0, 900L, "x")).toDF("k", "pc", "v", "ts", "extra"))
    SqlDdl.exec(spark, "ALTER TABLE guard2_t ADD COLUMNS (score DOUBLE)")
    val e3 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE guard2_t RENAME COLUMN score TO extra")
    }
    assert(e3.getMessage.contains("shadow"))
    // backslash-carrying prop values round-trip the catalog-entry
    // rewrite VERBATIM (an escape level must not be lost per ALTER),
    // and user-set properties survive alongside the graft.* bindings
    spark.sql(
      """ALTER TABLE guard2_t SET TBLPROPERTIES ('user.note' = 'v RLIKE \\d+')""")
    SqlDdl.exec(spark, "ALTER TABLE guard2_t RENAME COLUMN score TO points")
    val note = spark.sql("SHOW TBLPROPERTIES guard2_t ('user.note')")
      .collect()(0).getString(1)
    assert(note == "v RLIKE \\d+")
    assert(Catalog.readTable(spark, "guard2_t").columns.contains("points"))
  }

  test("rename on timeline and partitioned layouts; time travel re-reads history under the new name") {
    // timeline: the rename applies to EVERY version on read (schema-on-
    // read reconciles historic snapshots to the current declared schema)
    val tp = Files.createTempDirectory("rentl").toString + "/t"
    Timeline.upsertInto(spark, tp,
      Seq((1L, 1L, 10.0)).toDF("k", "pc", "v"), Seq("k"), "pc")
    Catalog.registerTimelineTable(spark, "ren_tl", tp, Seq("k"), "pc")
    SqlDdl.exec(spark, "ALTER TABLE ren_tl RENAME COLUMN v TO score")
    SqlMerge.exec(spark,
      "INSERT INTO ren_tl (k, pc, score) VALUES (2, 2, 20.0)")
    assert(SqlRead.select(spark,
      "SELECT k, score FROM ren_tl ORDER BY k").as[(Long, Double)]
      .collect().toSeq == Seq(1L -> 10.0, 2L -> 20.0))
    // version 0 predates the rename; it reads under the CURRENT name
    assert(SqlRead.select(spark,
      "SELECT k, score FROM ren_tl VERSION AS OF 0")
      .as[(Long, Double)].collect().toSeq == Seq(1L -> 10.0))
    // partitioned: partition columns are protected, value columns remap
    val pp = Files.createTempDirectory("renpart").toString + "/t"
    PartitionedTable.create(
      Seq((1L, 1L, 10.0, "a"), (2L, 1L, 20.0, "b")).toDF("k", "pc", "v", "part"),
      pp, keys = Seq("k"), precombine = "pc", tieBreak = Nil,
      partitionCols = Seq("part"))
    Catalog.registerLayoutTable(spark, "ren_part", "partitioned", pp)
    val ePart = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE ren_part RENAME COLUMN part TO p2")
    }
    assert(ePart.getMessage.contains("partition"))
    SqlDdl.exec(spark, "ALTER TABLE ren_part RENAME COLUMN v TO score")
    SqlMerge.exec(spark,
      "UPDATE ren_part SET score = 99.0 WHERE part = 'b'")
    assert(Catalog.readTable(spark, "ren_part").select($"k", $"score")
      .as[(Long, Double)].collect().toMap == Map(1L -> 10.0, 2L -> 99.0))
  }

  test("renamed column through conditional MERGE and MOR routes") {
    val p = Files.createTempDirectory("renmor").toString + "/t"
    MorTable.create(
      Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("k", "pc", "v"), p,
      keys = Seq("k"), precombine = "pc")
    Catalog.registerLayoutTable(spark, "ren_mor", "mor", p)
    SqlDdl.exec(spark, "ALTER TABLE ren_mor RENAME COLUMN v TO score")
    Seq((1L, 2L, 100.0), (3L, 2L, 30.0)).toDF("k", "pc", "score")
      .createOrReplaceTempView("ren_mor_src")
    SqlMerge.exec(spark,
      """MERGE INTO ren_mor t USING ren_mor_src s ON t.k = s.k
        |WHEN MATCHED AND s.score > t.score THEN UPDATE SET score = s.score
        |WHEN NOT MATCHED THEN INSERT (k, pc, score) VALUES (s.k, s.pc, s.score)
        |""".stripMargin)
    val got = Catalog.readTable(spark, "ren_mor")
      .select($"k", $"score").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 100.0, 2L -> 20.0, 3L -> 30.0))
    // the delta logs carry the physical name: SELECT through the SQL
    // front door still resolves the logical one
    val sel = SqlRead.select(spark,
      "SELECT k, score FROM ren_mor WHERE score >= 30 ORDER BY k")
      .as[(Long, Double)].collect().toSeq
    assert(sel == Seq(1L -> 100.0, 3L -> 30.0))
  }

  test("ADD COLUMNS with DEFAULT is metadata-only; rename moves it, drop retires it") {
    val p = Files.createTempDirectory("adddef").toString + "/t"
    BucketTable.create(
      Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("k", "pc", "v"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "add_def", "bucket", p)
    SqlDdl.exec(spark,
      "ALTER TABLE add_def ADD COLUMNS (tier STRING DEFAULT 'bronze')")
    // no file rewrite; every pre-ADD row reads the default
    assert(!Catalog.readPhysical(spark, "add_def").columns.contains("tier"))
    assert(Catalog.readTable(spark, "add_def").select($"k", $"tier")
      .as[(Long, String)].collect().toMap ==
      Map(1L -> "bronze", 2L -> "bronze"))
    // a DML write materializes real values on its touched region only;
    // a predicate ON the defaulted column selects logically (the
    // physical cells are NULL/absent) — scan-all selection fallback
    SqlMerge.exec(spark,
      "UPDATE add_def SET tier = 'gold' WHERE k = 1")
    SqlMerge.exec(spark,
      "UPDATE add_def SET v = v + 1 WHERE tier = 'bronze'")
    assert(Catalog.readTable(spark, "add_def").select($"k", $"tier", $"v")
      .as[(Long, String, Double)].collect().toSet ==
      Set((1L, "gold", 10.0), (2L, "bronze", 21.0)))
    // DELETE through the default: only the bronze row goes
    SqlMerge.exec(spark, "DELETE FROM add_def WHERE tier = 'bronze'")
    assert(Catalog.readTable(spark, "add_def").select($"k")
      .as[Long].collect().toSeq == Seq(1L))
    // RENAME carries the default to the new logical name
    SqlDdl.exec(spark, "ALTER TABLE add_def RENAME COLUMN tier TO level")
    assert(Catalog.defaultsOf(spark, "add_def") == Map("level" -> "'bronze'"))
    // INSERT omitting nothing — but a NULL write reads back as the
    // default: the column has NOT NULL DEFAULT semantics
    SqlMerge.exec(spark, "INSERT INTO add_def VALUES (9L, 1L, 90.0D, NULL)")
    assert(Catalog.readTable(spark, "add_def").filter($"k" === 9L)
      .select($"level").as[String].head() == "bronze")
    // DROP retires the default with the column
    SqlDdl.exec(spark, "ALTER TABLE add_def DROP COLUMNS (level)")
    assert(Catalog.defaultsOf(spark, "add_def").isEmpty)
    // non-constant defaults are rejected — by Spark's own parser
    // (rand()) or by our foldability guard (current_timestamp());
    // either way the statement dies loudly
    val e1 = intercept[Exception] {
      SqlDdl.exec(spark,
        "ALTER TABLE add_def ADD COLUMNS (bad TIMESTAMP DEFAULT current_timestamp())")
    }
    assert(e1.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException]
      || e1.getMessage.contains("constant"))
    SqlDdl.exec(spark,
      "ALTER TABLE add_def ADD COLUMNS (grade STRING DEFAULT 'c')")
    val e2 = intercept[IllegalArgumentException] {
      SqlIndex.exec(spark,
        "CREATE INDEX g_idx ON add_def USING SECONDARY (grade)")
    }
    assert(e2.getMessage.contains("DEFAULT"))
  }

  test("ALTER COLUMN TYPE widens metadata-only; mixed-width files serve the declared type") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val p = Files.createTempDirectory("widen").toString + "/t"
    BucketTable.create(
      Seq((1L, 1L, 10, "a"), (2L, 1L, 20, "b"), (3L, 1L, 30, "c"))
        .toDF("k", "pc", "n", "tag"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "widen_t", "bucket", p)
    assert(spark.table("widen_t").schema("n").dataType == IntegerType)
    SqlDdl.exec(spark, "ALTER TABLE widen_t ALTER COLUMN n TYPE BIGINT")
    // metadata-only: files still carry INT, reads serve BIGINT
    assert(Catalog.readPhysical(spark, "widen_t")
      .schema("n").dataType == IntegerType)
    val aligned = Catalog.readTable(spark, "widen_t")
    assert(aligned.schema("n").dataType == LongType)
    assert(aligned.select($"k", $"n").as[(Long, Long)].collect().toMap ==
      Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
    // a value only BIGINT can carry flows through DML: the touched
    // bucket's new generation is written WIDE, untouched buckets stay
    // at their narrow files — both widths now coexist in one table
    SqlMerge.exec(spark, "UPDATE widen_t SET n = 3000000000 WHERE k = 1")
    SqlMerge.exec(spark,
      "INSERT INTO widen_t VALUES (9L, 2L, 4000000000, 'd')")
    val got = Catalog.readTable(spark, "widen_t").select($"k", $"n")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3000000000L, 2L -> 20L, 3L -> 30L,
      9L -> 4000000000L))
    // SQL reads resolve predicates over the widened column
    assert(SqlRead.select(spark,
      "SELECT k FROM widen_t WHERE n > 2500000000 ORDER BY k")
      .as[Long].collect().toSeq == Seq(1L, 9L))
  }

  test("widened bloom table: point lookup and stats scans span mixed-width files") {
    import org.apache.spark.sql.types.LongType
    val p = Files.createTempDirectory("widenb").toString + "/t"
    val stats = Files.createTempDirectory("widenb").toString + "/s"
    BloomTable.create(
      (1L to 100L).map(k => (k, 1L, (k * 3).toInt)).toDF("k", "pc", "n"),
      p, keys = Seq("k"), precombine = "pc", numFiles = 4)
    Catalog.registerLayoutTable(spark, "widen_bloom", "bloom", p)
    SqlDdl.exec(spark, "ALTER TABLE widen_bloom ALTER COLUMN n TYPE BIGINT")
    // the upsert writes a WIDE commit; key 1's candidates now span the
    // narrow create commit AND the wide one — the lookup's file read
    // must group per commit, not infer one footer's width
    SqlMerge.exec(spark,
      "INSERT INTO widen_bloom VALUES (1L, 2L, 3000000000)")
    val got = BloomTable.lookup(spark, p, Seq(1L))
    assert(got.schema("n").dataType == LongType)
    assert(got.select($"n").as[Long].head() == 3000000000L)
    assert(Catalog.readTable(spark, "widen_bloom")
      .filter($"k" === 2L).select($"n").as[Long].head() == 6L)
    // a stats index over the mixed-width live files builds and scans
    StatsIndex.buildFromFiles(spark, BloomTable.liveFiles(p), Seq("n"), stats)
    val wide = StatsIndex.scanFiles(spark, BloomTable.liveFiles(p), stats,
      Seq(StatsIndex.ColRange("n", Some(1000000000L), None)))
    assert(wide.select($"k").as[Long].collect().toSeq == Seq(1L))
    val narrow = StatsIndex.scanFiles(spark, BloomTable.liveFiles(p), stats,
      Seq(StatsIndex.ColRange("n", Some(6L), Some(6L))))
    assert(narrow.select($"k").as[Long].collect().toSeq == Seq(2L))
  }

  test("ADD COLUMNS guards: duplicate names and unservable defaults leave the entry intact") {
    val p = Files.createTempDirectory("adddup").toString + "/t"
    BucketTable.create(Seq((1L, 1L, 10.0)).toDF("k", "pc", "v"), p,
      keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "add_dup", "bucket", p)
    // one statement declaring a column twice must die BEFORE the
    // drop+create entry replacement, never after
    val e1 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark,
        "ALTER TABLE add_dup ADD COLUMNS (a INT DEFAULT 1, a INT DEFAULT 2)")
    }
    assert(e1.getMessage.contains("duplicate"))
    // a default that cannot be served AT THE COLUMN'S TYPE dies now,
    // not on every later read
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark,
        "ALTER TABLE add_dup ADD COLUMNS (n INT DEFAULT 'abc')")
    }
    assert(e2.getMessage.contains("does not cast"))
    // the entry survived both rejections with its binding intact
    assert(Catalog.layoutOf(spark, "add_dup").exists(_._1 == "bucket"))
    assert(Catalog.readTable(spark, "add_dup").count() == 1)
    // DROP DEFAULT is the metadata-only escape hatch: values revert to
    // NULL reads where no file carries the column
    SqlDdl.exec(spark,
      "ALTER TABLE add_dup ADD COLUMNS (tier STRING DEFAULT 'base')")
    assert(Catalog.readTable(spark, "add_dup").select($"tier")
      .as[String].head() == "base")
    SqlDdl.exec(spark, "ALTER TABLE add_dup ALTER COLUMN tier DROP DEFAULT")
    assert(Catalog.defaultsOf(spark, "add_dup").isEmpty)
    assert(Catalog.readTable(spark, "add_dup").select($"tier")
      .as[Option[String]].head().isEmpty)
    // an explicit DEFAULT NULL is the nullable column's natural read —
    // accepted, but NO default entry is stored (it is not a cast error)
    SqlDdl.exec(spark,
      "ALTER TABLE add_dup ADD COLUMNS (note STRING DEFAULT NULL)")
    assert(!Catalog.defaultsOf(spark, "add_dup").contains("note"))
    assert(Catalog.readTable(spark, "add_dup").select($"note")
      .as[Option[String]].head().isEmpty)
    // NOT NULL without a backing default is unsatisfiable over
    // immutable pre-ADD files: rejected loudly, not silently nullable
    val e3 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE add_dup ADD COLUMNS (m INT NOT NULL)")
    }
    assert(e3.getMessage.contains("NOT NULL"))
    val e4 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark,
        "ALTER TABLE add_dup ADD COLUMNS (m INT NOT NULL DEFAULT NULL)")
    }
    assert(e4.getMessage.contains("NOT NULL"))
    // NOT NULL WITH a non-null default is honored semantically: the
    // coalesce-to-default read never serves NULL (the catalog field
    // itself stays nullable — Spark's v1 catalog normalizes it)
    SqlDdl.exec(spark,
      "ALTER TABLE add_dup ADD COLUMNS (lvl INT NOT NULL DEFAULT 3)")
    assert(Catalog.readTable(spark, "add_dup").select($"lvl")
      .as[Int].head() == 3)
    assert(Catalog.readTable(spark, "add_dup")
      .filter($"lvl".isNull).count() == 0)
  }

  test("nested struct evolution: ADD / RENAME / WIDEN / DROP inside a struct, metadata-only") {
    import org.apache.spark.sql.functions.{col, struct, lit}
    val p = Files.createTempDirectory("nested").toString + "/t"
    val base = Seq((1L, 1L, 10, "x"), (2L, 1L, 20, "y"))
      .toDF("k", "pc", "a", "b")
      .select(col("k"), col("pc"), struct(col("a"), col("b")).as("meta"))
    BucketTable.create(base, p, keys = Seq("k"), precombine = "pc",
      numBuckets = 4)
    Catalog.registerLayoutTable(spark, "nested_ev", "bucket", p)
    val files0 = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      .iterator()
    val count0 = { var n = 0; while (files0.hasNext) { files0.next(); n += 1 }; n }

    // ADD a subfield: declared only, reads serve typed NULL
    SqlDdl.exec(spark, "ALTER TABLE nested_ev ADD COLUMNS (meta.score DOUBLE)")
    val afterAdd = Catalog.readTable(spark, "nested_ev")
      .select($"k", $"meta.a", $"meta.score")
      .as[(Long, Int, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(afterAdd == Seq((1L, 10, None), (2L, 20, None)))

    // RENAME a subfield: reads serve the logical name; the physical
    // files still carry 'a' and a DML write keeps using it
    SqlDdl.exec(spark, "ALTER TABLE nested_ev RENAME COLUMN meta.a TO alpha")
    assert(Catalog.readTable(spark, "nested_ev")
      .select($"meta.alpha").as[Int].collect().toSet == Set(10, 20))
    // WIDEN the renamed subfield: INT -> BIGINT, lossless gate
    SqlDdl.exec(spark,
      "ALTER TABLE nested_ev ALTER COLUMN meta.alpha TYPE BIGINT")
    assert(spark.table("nested_ev").schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("alpha")
      .dataType == org.apache.spark.sql.types.LongType)
    // a write THROUGH the SQL front door lands at the physical
    // sub-name; mixed-shape files then merge on read
    SqlMerge.exec(spark,
      "INSERT INTO nested_ev VALUES (3, 1, named_struct(" +
        "'alpha', CAST(30 AS BIGINT), 'b', 'z', 'score', CAST(3.5 AS DOUBLE)))")
    val merged = Catalog.readTable(spark, "nested_ev")
      .select($"k", $"meta.alpha", $"meta.b", $"meta.score")
      .as[(Long, Long, String, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(merged == Seq((1L, 10L, "x", None), (2L, 20L, "y", None),
      (3L, 30L, "z", Some(3.5))))
    // the new file physically carries 'a' (the stable physical name),
    // never 'alpha' — one spelling across every file
    val physical = BucketTable.read(spark, p).schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    assert(physical.contains("a") && !physical.exists(_.equalsIgnoreCase("alpha")),
      s"physical subfields: $physical")

    // DROP a subfield: tombstoned, projected away, old files untouched
    SqlDdl.exec(spark, "ALTER TABLE nested_ev DROP COLUMNS (meta.b)")
    assert(!spark.table("nested_ev").schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.exists(_.equalsIgnoreCase("b")))
    assert(Catalog.readTable(spark, "nested_ev")
      .select($"k", $"meta.alpha", $"meta.score")
      .as[(Long, Long, Option[Double])].collect().toSeq.sortBy(_._1) ==
      Seq((1L, 10L, None), (2L, 20L, None), (3L, 30L, Some(3.5))))

    // UPDATE on a nested field — through the rename, under a predicate,
    // on genuinely mixed-shape files; other subfields untouched
    SqlMerge.exec(spark,
      "UPDATE nested_ev SET meta.score = meta.alpha * 2.0 WHERE k <= 2")
    assert(Catalog.readTable(spark, "nested_ev")
      .select($"k", $"meta.alpha", $"meta.score")
      .as[(Long, Long, Option[Double])].collect().toSeq.sortBy(_._1) ==
      Seq((1L, 10L, Some(20.0)), (2L, 20L, Some(40.0)), (3L, 30L, Some(3.5))))
    // MERGE with nested assignment targets: matched rows patch the
    // subfield from the SOURCE, unmatched insert whole rows
    Seq((2L, 2L, 99.0), (4L, 1L, 44.0)).toDF("k", "pc", "nv")
      .createOrReplaceTempView("nested_ev_src")
    SqlMerge.exec(spark,
      """MERGE INTO nested_ev t USING nested_ev_src s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.pc = s.pc, meta.score = s.nv
        |WHEN NOT MATCHED THEN INSERT (k, pc, meta) VALUES (s.k, s.pc,
        |  named_struct('alpha', CAST(s.k * 10 AS BIGINT),
        |               'score', CAST(s.nv AS DOUBLE)))""".stripMargin)
    assert(Catalog.readTable(spark, "nested_ev")
      .select($"k", $"meta.alpha", $"meta.score")
      .as[(Long, Long, Option[Double])].collect().toSeq.sortBy(_._1) ==
      Seq((1L, 10L, Some(20.0)), (2L, 20L, Some(99.0)),
        (3L, 30L, Some(3.5)), (4L, 40L, Some(44.0))))
    // nested INSERT targets BUILD the struct by named assignment:
    // assigned subfields take their values, the rest land typed NULL
    // (the struct twin of an INSERT column list's null-fill)
    Seq((5L, 1L, 55.0)).toDF("k", "pc", "nv")
      .createOrReplaceTempView("nested_ev_src2")
    SqlMerge.exec(spark,
      """MERGE INTO nested_ev t USING nested_ev_src2 s
        |ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, pc, meta.score)
        |  VALUES (s.k, s.pc, s.nv)""".stripMargin)
    assert(Catalog.readTable(spark, "nested_ev").filter($"k" === 5L)
      .select($"meta.alpha", $"meta.score")
      .as[(Option[Long], Option[Double])].head() == ((None, Some(55.0))))

    // assigning a parent AND its subfield in one statement is ambiguous
    val eu = intercept[IllegalArgumentException] {
      SqlMerge.exec(spark,
        "UPDATE nested_ev SET meta = named_struct('alpha', CAST(1 AS BIGINT)," +
          " 'score', CAST(1.0 AS DOUBLE)), meta.score = 2.0 WHERE k = 1")
    }
    assert(eu.getMessage.contains("subfields"))
    val eu2 = intercept[IllegalArgumentException] {
      SqlMerge.exec(spark, "UPDATE nested_ev SET meta.nope = 1.0 WHERE k = 1")
    }
    assert(eu2.getMessage.contains("no such field"))

    // loud rejections: a path through a nonexistent intermediate,
    // non-struct parents, parent rename with nested state,
    // empty-struct drop (two-level paths themselves are now supported
    // — SqlDdlSpec's depth-2 test and p_sql_nested2_evolution cover
    // the positive side)
    val e1 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE nested_ev ADD COLUMNS (meta.x.y INT)")
    }
    assert(e1.getMessage.contains("no such field 'x'"))
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE nested_ev ADD COLUMNS (k.sub INT)")
    }
    assert(e2.getMessage.contains("STRUCT"))
    val e3 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE nested_ev RENAME COLUMN meta TO info")
    }
    assert(e3.getMessage.contains("nested schema-on-read state"))
    val e4 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark,
        "ALTER TABLE nested_ev DROP COLUMNS (meta.alpha, meta.score)")
    }
    assert(e4.getMessage.contains("empty struct"))
    // re-adding the dropped subfield's physical name would resurrect
    // old file data — rejected like the top-level rule
    val e5 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE nested_ev ADD COLUMNS (meta.b INT)")
    }
    assert(e5.getMessage.contains("retired"))
  }

  test("ALTER COLUMN TYPE: DECIMAL precision growth keeps every old value") {
    import org.apache.spark.sql.types.DecimalType
    val p = Files.createTempDirectory("widend").toString + "/t"
    BucketTable.create(
      spark.sql("SELECT 1L AS k, 1L AS pc, CAST(12345678.99 AS DECIMAL(10,2)) AS amt"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 2)
    Catalog.registerLayoutTable(spark, "widen_dec", "bucket", p)
    // precision growth with the integral part preserved: allowed
    SqlDdl.exec(spark,
      "ALTER TABLE widen_dec ALTER COLUMN amt TYPE DECIMAL(14, 4)")
    val got = Catalog.readTable(spark, "widen_dec")
    assert(got.schema("amt").dataType == DecimalType(14, 4))
    assert(got.select($"amt").as[java.math.BigDecimal].head()
      .compareTo(new java.math.BigDecimal("12345678.99")) == 0)
    // a wide value only the new precision can carry round-trips
    SqlMerge.exec(spark,
      "INSERT INTO widen_dec VALUES (2L, 1L, CAST(999999999.1234 AS DECIMAL(14,4)))")
    assert(Catalog.readTable(spark, "widen_dec").filter($"k" === 2L)
      .select($"amt").as[java.math.BigDecimal].head()
      .compareTo(new java.math.BigDecimal("999999999.1234")) == 0)
    // shrinking the INTEGRAL capacity is lossy even when precision
    // grows: DECIMAL(14,4) holds 10 integral digits, DECIMAL(15,6)
    // only 9
    val e = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark,
        "ALTER TABLE widen_dec ALTER COLUMN amt TYPE DECIMAL(15, 6)")
    }
    assert(e.getMessage.contains("lossless widening"))
  }

  test("ALTER COLUMN TYPE on MOR: narrow base + wide delta logs merge") {
    import org.apache.spark.sql.types.LongType
    val p = Files.createTempDirectory("widenm").toString + "/t"
    MorTable.create(
      Seq((1L, 1L, 10), (2L, 1L, 20)).toDF("k", "pc", "n"), p,
      keys = Seq("k"), precombine = "pc")
    Catalog.registerLayoutTable(spark, "widen_mor", "mor", p)
    SqlDdl.exec(spark, "ALTER TABLE widen_mor ALTER COLUMN n TYPE BIGINT")
    // the UPDATE's post-image delta log lands WIDE while the base file
    // keeps INT; the snapshot merge unions across the widths and the
    // declared read serves BIGINT everywhere
    SqlMerge.exec(spark,
      "UPDATE widen_mor SET n = 3000000000 WHERE k = 1")
    val got = Catalog.readTable(spark, "widen_mor")
    assert(got.schema("n").dataType == LongType)
    assert(got.select($"k", $"n").as[(Long, Long)].collect().toMap ==
      Map(1L -> 3000000000L, 2L -> 20L))
    // base bytes untouched: still one base generation, one delta log
    assert(MorTable.state(p).contains((0L, 1L)))
  }

  test("ALTER COLUMN TYPE composes with RENAME; rejects narrowing/lossy/structural") {
    val p = Files.createTempDirectory("widenr").toString + "/t"
    BucketTable.create(
      Seq((1, 1L, 1.5f, 7L), (2, 1L, 2.5f, 8L))
        .toDF("k", "pc", "ratio", "cnt"),
      p, keys = Seq("k"), precombine = "pc", numBuckets = 4)
    Catalog.registerLayoutTable(spark, "widen_r", "bucket", p)
    // rename then widen under the LOGICAL name: the file keeps the
    // physical name AND the narrow type; reads reconcile both
    SqlDdl.exec(spark, "ALTER TABLE widen_r RENAME COLUMN ratio TO rate")
    SqlDdl.exec(spark, "ALTER TABLE widen_r ALTER COLUMN rate TYPE DOUBLE")
    SqlMerge.exec(spark, "UPDATE widen_r SET rate = 9.25D WHERE k = 2")
    assert(Catalog.readTable(spark, "widen_r").select($"k", $"rate")
      .as[(Int, Double)].collect().toMap == Map(1 -> 1.5, 2 -> 9.25))
    // narrowing: old files hold values the new type cannot carry
    val e1 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE widen_r ALTER COLUMN rate TYPE FLOAT")
    }
    assert(e1.getMessage.contains("lossless widening"))
    // lossy "up"-cast (BIGINT -> DOUBLE loses past 2^53): rejected
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE widen_r ALTER COLUMN cnt TYPE DOUBLE")
    }
    assert(e2.getMessage.contains("lossless widening"))
    // structural: the key routes rows by its WRITTEN values
    val e3 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE widen_r ALTER COLUMN k TYPE BIGINT")
    }
    assert(e3.getMessage.contains("primary-key"))
    // non-type ALTER COLUMN shapes are not metadata-only
    val e4 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark,
        "ALTER TABLE widen_r ALTER COLUMN rate COMMENT 'nope'")
    }
    assert(e4.getMessage.contains("only TYPE widening"))
  }

  test("depth-2 and array<struct> evolution: ADD/RENAME/WIDEN/DROP through paths") {
    import org.apache.spark.sql.functions.{array, col, lit, struct}
    val p = Files.createTempDirectory("nested2").toString + "/t"
    val base = Seq((1L, 1L)).toDF("k", "pc")
      .withColumn("doc", struct(
        struct(lit(10).as("cnt"), lit("en").as("lang")).as("stats"),
        lit("t1").as("title")))
      .withColumn("tags", array(
        struct(lit("a").as("nm"), lit(1).as("wt")),
        struct(lit("b").as("nm"), lit(2).as("wt"))))
    BucketTable.create(base, p, keys = Seq("k"), precombine = "pc",
      numBuckets = 2)
    Catalog.registerLayoutTable(spark, "nested2_ev", "bucket", p)

    // depth-2 ADD + array-element ADD: declared only, reads serve NULLs
    SqlDdl.exec(spark,
      "ALTER TABLE nested2_ev ADD COLUMNS (doc.stats.score DOUBLE)")
    SqlDdl.exec(spark,
      "ALTER TABLE nested2_ev ADD COLUMNS (tags.element.src STRING)")
    val afterAdd = Catalog.readTable(spark, "nested2_ev")
      .selectExpr("doc.stats.score", "tags[0].src", "tags[0].nm")
      .as[(Option[Double], Option[String], String)].head()
    assert(afterAdd == ((None, None, "a")))

    // depth-2 RENAME + array-element RENAME: logical names serve,
    // physical files keep cnt/nm
    SqlDdl.exec(spark,
      "ALTER TABLE nested2_ev RENAME COLUMN doc.stats.cnt TO hits")
    SqlDdl.exec(spark,
      "ALTER TABLE nested2_ev RENAME COLUMN tags.element.nm TO name")
    // depth-2 WIDEN + array-element WIDEN: lossless gate at the leaf
    SqlDdl.exec(spark,
      "ALTER TABLE nested2_ev ALTER COLUMN doc.stats.hits TYPE BIGINT")
    SqlDdl.exec(spark,
      "ALTER TABLE nested2_ev ALTER COLUMN tags.element.wt TYPE BIGINT")
    assert(Catalog.readTable(spark, "nested2_ev")
      .selectExpr("doc.stats.hits", "tags[1].name", "tags[1].wt")
      .as[(Long, String, Long)].head() == ((10L, "b", 2L)))

    // a write through the SQL front door uses the LOGICAL shape and
    // lands at the PHYSICAL names at every depth (one spelling per
    // file family) — mixed-shape files then merge on read
    SqlMerge.exec(spark,
      """INSERT INTO nested2_ev VALUES (2, 1,
        |  named_struct('stats', named_struct('hits', CAST(20 AS BIGINT),
        |    'lang', 'fr', 'score', CAST(2.5 AS DOUBLE)), 'title', 't2'),
        |  array(named_struct('name', 'c', 'wt', CAST(3 AS BIGINT),
        |    'src', 's2')))""".stripMargin)
    val stats = BucketTable.read(spark, p).schema("doc").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("stats").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    assert(stats.contains("cnt") && !stats.exists(_.equalsIgnoreCase("hits")),
      s"physical depth-2 fields: $stats")
    val elem = BucketTable.read(spark, p).schema("tags").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    assert(elem.contains("nm") && !elem.exists(_.equalsIgnoreCase("name")),
      s"physical element fields: $elem")
    val merged = Catalog.readTable(spark, "nested2_ev")
      .selectExpr("k", "doc.stats.hits", "doc.stats.score",
        "tags[0].name", "tags[0].src")
      .as[(Long, Long, Option[Double], String, Option[String])]
      .collect().toSeq.sortBy(_._1)
    assert(merged == Seq((1L, 10L, None, "a", None),
      (2L, 20L, Some(2.5), "c", Some("s2"))))

    // depth-2 DROP + array-element DROP: tombstoned, projected away
    SqlDdl.exec(spark, "ALTER TABLE nested2_ev DROP COLUMNS (doc.stats.lang)")
    SqlDdl.exec(spark, "ALTER TABLE nested2_ev DROP COLUMNS (tags.element.src)")
    val statsNow = spark.table("nested2_ev").schema("doc").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("stats").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(!statsNow.exists(_.equalsIgnoreCase("lang")))
    assert(Catalog.readTable(spark, "nested2_ev")
      .selectExpr("k", "doc.stats.hits", "tags[0].name")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1) ==
      Seq((1L, 10L, "a"), (2L, 20L, "c")))

    // loud: renaming an ANCESTOR carrying state beneath it; maps and
    // bare-array descent stay rejected
    val e1 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark,
        "ALTER TABLE nested2_ev RENAME COLUMN doc.stats TO s2")
    }
    assert(e1.getMessage.contains("state"))
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.exec(spark, "ALTER TABLE nested2_ev ADD COLUMNS (tags.x INT)")
    }
    assert(e2.getMessage.contains("element"))
  }
}
