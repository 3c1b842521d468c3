package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Observation}

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._

/** Fuse driver-side batch reads (emptiness gates, routing collects)
  * into the batch's own `localCheckpoint` job via observed metrics
  * (guide §2.4 — remove duplicated passes): the checkpoint
  * materializes every row anyway, so a `count` / `collect_set` that
  * previously cost its own Spark action rides along for free.
  * `Observation` delivers on the checkpoint action itself with zero
  * further jobs (verified by `tools.ObsProbe`; `FuseSpec` pins it).
  */
object Fuse {

  /** Bounded wait for the observation listener bus. The metrics are
    * computed synchronously inside the checkpoint job; only their
    * delivery to the `Observation` promise rides the (async) listener
    * bus, so this bound is never hit in practice — it exists so a
    * dropped bus event degrades to one extra (correct) aggregation job
    * instead of a hang.
    */
  private val MetricWaitSec = 120

  private implicit val ec: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.global

  /** `df.localCheckpoint()` plus the values of `aggs` over `df`,
    * computed INSIDE the checkpoint job. Returns the checkpointed
    * frame and the aggregate values in call order.
    */
  def checkpointObserved(df: DataFrame, aggs: Column*): (DataFrame, IndexedSeq[Any]) = {
    val obs = Observation()
    val named = aggs.zipWithIndex.map { case (c, i) => c.as(s"__fuse$i") }
    val ck = df.observe(obs, named.head, named.tail: _*).localCheckpoint()
    val got =
      try Await.result(Future(obs.get), MetricWaitSec.seconds)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          // listener event lost — recompute from the checkpointed
          // blocks (one extra job, same values)
          val r = ck.agg(named.head, named.tail: _*).head()
          return (ck, aggs.indices.map(r.get))
      }
    (ck, aggs.indices.map(i => got(s"__fuse$i")))
  }

  /** [[checkpointObserved]] with the one metric every commit gate
    * needs: the row count (an `isEmpty` that costs no extra job).
    */
  def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
    val (ck, vs) = checkpointObserved(df,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
    (ck, vs.head.asInstanceOf[Number].longValue())
  }
}
