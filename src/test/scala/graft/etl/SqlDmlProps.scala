package graft.etl

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck parity between the SQL front doors and the layout API:
  * an arbitrary sequence of batches applied as SQL `INSERT INTO` /
  * star-star `MERGE INTO` / `INSERT OVERWRITE` statements against a
  * bucket-backed catalog table must leave EXACTLY the state the direct
  * `BucketTable.upsertInto`/`overwriteTable` calls leave on a twin
  * table. This pins
  * the whole statement path — parsing, column shaping, layout routing,
  * precombine dedup inside each batch — not just the happy shapes the
  * example-based specs pick.
  */
object SqlDmlProps extends Properties("SqlDml") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val row: Gen[(Long, Long, Double)] = for {
    k <- Gen.chooseNum(0L, 25L)
    pc <- Gen.chooseNum(0L, 40L)
    v <- Gen.chooseNum(0, 1000).map(_ / 10.0)
  } yield (k, pc, v)

  private val batch: Gen[List[(Long, Long, Double)]] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, row))
  private val scenario: Gen[(List[(Long, Long, Double)],
      List[(List[(Long, Long, Double)], Int)])] = for {
    first <- batch
    n <- Gen.choose(1, 3)
    // verb per step: 0 = INSERT INTO, 1 = star-star MERGE,
    // 2 = INSERT OVERWRITE (insert_overwrite_table)
    rest <- Gen.listOfN(n, Gen.zip(batch, Gen.frequency(
      3 -> Gen.const(0), 3 -> Gen.const(1), 1 -> Gen.const(2))))
  } yield (first, rest)

  private var n = 0

  property("SQL INSERT/MERGE sequence == direct upsertInto sequence") =
    Prop.forAllNoShrink(scenario) { case (first, rest) =>
      n += 1
      val name = s"sqldml_prop_$n"
      val base = java.nio.file.Files.createTempDirectory("sqldml").toString
      // API twin
      BucketTable.create(first.toDF("k", "pc", "v"), s"$base/api",
        keys = Seq("k"), precombine = "pc", tieBreak = Seq("v"),
        numBuckets = 4)
      rest.foreach {
        case (b, 2) =>
          BucketTable.overwriteTable(spark, s"$base/api",
            b.toDF("k", "pc", "v"))
          ()
        case (b, _) =>
          BucketTable.upsertInto(spark, s"$base/api", b.toDF("k", "pc", "v"))
          ()
      }
      // SQL path: same first batch, then alternate INSERT INTO / MERGE
      BucketTable.create(first.toDF("k", "pc", "v"), s"$base/sql",
        keys = Seq("k"), precombine = "pc", tieBreak = Seq("v"),
        numBuckets = 4)
      Catalog.registerLayoutTable(spark, name, "bucket", s"$base/sql")
      rest.foreach { case (b, verb) =>
        b.toDF("k", "pc", "v").createOrReplaceTempView(s"${name}_src")
        verb match {
          case 1 =>
            SqlMerge.exec(spark,
              s"""MERGE INTO $name t USING ${name}_src s ON t.k = s.k
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          case 2 =>
            SqlMerge.exec(spark,
              s"INSERT OVERWRITE $name SELECT k, pc, v FROM ${name}_src")
          case _ =>
            SqlMerge.exec(spark,
              s"INSERT INTO $name SELECT k, pc, v FROM ${name}_src")
        }
      }
      val api = BucketTable.read(spark, s"$base/api")
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2, r._3))
      val sql = BucketTable.read(spark, s"$base/sql")
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2, r._3))
      val ok = api.sameElements(sql)
      if (!ok) println(s"api=${api.toList}\nsql=${sql.toList}")
      ok
    }
}
