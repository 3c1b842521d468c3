package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: does an eager `localCheckpoint()` deliver `observe()`
  * metrics? If yes, every post-checkpoint `distinct().collect()` /
  * `isEmpty` gate in the commit paths can ride the checkpoint job
  * (guide §2.4 — remove duplicated passes outright).
  */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val obs = Observation("probe")
    val df = spark.range(1000).selectExpr("id", "id % 7 AS b")
      .observe(obs, count(lit(1)).as("n"), collect_set(col("b")).as("bs"))
      .localCheckpoint()
    // did the checkpoint action deliver the metrics, without any
    // further job? (obs.get blocks — bound it with a future)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    try {
      val got = Await.result(Future(obs.get), 10.seconds)
      println(s"metrics after localCheckpoint alone: $got")
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        println("TIMEOUT: localCheckpoint did NOT deliver observe metrics")
        df.count()
        println(s"after count(): ${Await.result(Future(obs.get), 10.seconds)}")
    }
    // leak check: 300 fused checkpoints must not slow down (a listener
    // that never unregisters would drag the bus further every round)
    val t0 = System.nanoTime()
    var firstTen = 0L
    for (i <- 1 to 300) {
      val (ck, n) = graft.etl.Fuse.checkpointCounted(
        spark.range(100).selectExpr("id", "id % 3 AS b"))
      assert(n == 100, s"count=$n")
      ck.unpersist(blocking = false)
      if (i == 10) firstTen = System.nanoTime() - t0
    }
    val total = System.nanoTime() - t0
    println(f"fused x300: first10=${firstTen / 1e9}%.2fs total=${total / 1e9}%.2fs " +
      f"per=${total / 300 / 1e6}%.1fms (flat per-iter time = no listener leak)")
    spark.stop()
  }
}
