package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** Stress reproduction harness for the historically flaky
  * "concurrent delta appends serialize" (MorTableSpec): the same
  * 4-writer race run repeatedly in one JVM. At 100 iterations this
  * reliably reproduced the FsLock staleness-probe bug (an unreadable
  * lock content mapped to age=MaxValue → a live holder's lock was
  * stolen, two writers allocated one seq, and the second's
  * debris-rollback deleted the first's in-flight `_temporary` dir —
  * the FileNotFoundException the flake surfaced). Default run does a
  * light pass; set SPARK_GRAFT_STRESS=1 for the full hunt.
  */
class MorConcurrencyStress extends SparkSpec {
  import spark.implicits._

  private def rows(t: (String, Long, Double)*) = t.toSeq.toDF("k", "pc", "v")

  private val iterations: Int =
    sys.env.get("SPARK_GRAFT_STRESS").map(_ => 100).getOrElse(5)

  test("concurrent delta appends serialize under stress") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    (1 to iterations).foreach { it =>
      val dir = Files.createTempDirectory("morstress").toString + "/t"
      MorTable.create(rows(("a", 1L, 1.0), ("b", 1L, 2.0), ("c", 1L, 3.0)),
        dir, keys = Seq("k"), precombine = "pc")
      val writers = (1 to 4).map { i =>
        Future(MorTable.upsertInto(dir, rows((s"w$i", 2L, i.toDouble))))
      }
      val seqs = Await.result(Future.sequence(writers), 5.minutes)
      assert(seqs.sorted == Seq(1L, 2L, 3L, 4L), s"iteration $it: seqs=$seqs")
      assert(MorTable.state(dir).contains((0L, 4L)),
        s"iteration $it: state=${MorTable.state(dir)}")
      val keys = MorTable.readSnapshot(spark, dir)
        .select($"k").as[String].collect().toSeq.sorted
      assert(keys == Seq("a", "b", "c", "w1", "w2", "w3", "w4"),
        s"iteration $it: keys=$keys")
      FsUtil.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }
}
